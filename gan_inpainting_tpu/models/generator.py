"""Generators (reference R4/R5/R6/R7).

Two architectures, config-selectable (SURVEY.md N7):

* :class:`DilatedGenerator` — single-stage encoder-decoder with a dilated
  bottleneck (rates 2/4/8/16): the Iizuka'17-style generator the reference's
  128² default config uses (BASELINE.json:7). Conv kind selectable
  (plain/gated/partial).
* :class:`CoarseToFineGenerator` — DeepFill-style two stages: a coarse
  network, then a refinement stage with parallel conv + contextual-attention
  branches (BASELINE.json:9). Conv kind defaults to gated.

Inputs follow the reference API shape: the generator consumes the masked
image and the hole mask (concatenated as channels internally) and emits the
full image in [-1, 1] (SURVEY.md §3.2). Upsampling is nearest + conv — no
transposed convs (checkerboard-free, and XLA lowers nearest-resize to a cheap
broadcast).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax.numpy as jnp

from gan_inpainting_tpu.ops.contextual_attention import contextual_attention
from gan_inpainting_tpu.models.layers import InpaintConv

Dtype = Any


class GeneratorOutput(NamedTuple):
    coarse: jnp.ndarray | None  # stage-1 output, None for single-stage
    fine: jnp.ndarray           # final output in [-1, 1]


def _upsample2x(x):
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class _Stack(nn.Module):
    """A sequence of InpaintConvs threading the validity mask."""

    specs: Sequence[dict]
    conv_kind: str
    backend: str
    compute_dtype: Dtype
    param_dtype: Dtype
    tp_shard: bool = False
    fuse_upsample: bool = False
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, valid=None):
        for i, spec in enumerate(self.specs):
            spec = dict(spec)
            kind = spec.pop("conv_kind", self.conv_kind)
            if (self.s2d_stem and kind in ("plain", "gated")
                    and spec.get("kernel_size") == 5
                    and spec.get("stride", 1) == 1
                    and spec.get("dilation", 1) == 1
                    and not spec.get("upsample", False)):
                spec["s2d"] = True
            if spec.pop("upsample", False):
                if valid is not None:
                    valid = jnp.repeat(jnp.repeat(valid, 2, 1), 2, 2)
                # 3x3 plain/gated decoder blocks fuse the upsample into a
                # low-res parity conv (ops/upsample_conv.py) — exact math,
                # 4/9ths the MACs; others upsample explicitly
                fuse = (self.fuse_upsample
                        and kind in ("plain", "gated")
                        and spec.get("kernel_size", 3) == 3
                        and spec.get("stride", 1) == 1
                        and spec.get("dilation", 1) == 1)
                if not fuse:
                    x = _upsample2x(x)
                spec["pre_upsample"] = fuse
            x, valid = InpaintConv(
                conv_kind=kind,
                backend=self.backend,
                compute_dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                name=f"conv{i}",
                **spec)(x, valid)
            if self.tp_shard and x.shape[-1] % 8 == 0:
                # tensor parallelism: activation channels sharded over the
                # mesh's model axis (SURVEY.md §2b). Requires an ambient
                # mesh (`jax.set_mesh(mesh)`), which the train loop, dryrun, and
                # sharded serving all establish. No-op on a model=1 mesh.
                from gan_inpainting_tpu.parallel.sharding import (
                    shard_channels,
                )
                x = shard_channels(x)
        return x, valid


def _encoder_specs(f: int) -> list[dict]:
    return [
        dict(features=f, kernel_size=5),
        dict(features=2 * f, stride=2),
        dict(features=2 * f),
        dict(features=4 * f, stride=2),
        dict(features=4 * f),
        dict(features=4 * f),
    ]


def _dilation_specs(f: int) -> list[dict]:
    return [dict(features=4 * f, dilation=d) for d in (2, 4, 8, 16)]


def _decoder_specs(f: int) -> list[dict]:
    return [
        dict(features=4 * f),
        dict(features=4 * f),
        dict(features=2 * f, upsample=True),
        dict(features=2 * f),
        dict(features=f, upsample=True),
        dict(features=f // 2),
        # output head: plain conv, no gate, no activation
        dict(features=3, conv_kind="plain", activation="none"),
    ]


class DilatedGenerator(nn.Module):
    """Single-stage dilated encoder-decoder (reference default config)."""

    base_features: int = 48
    conv_kind: str = "plain"
    backend: str = "auto"
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    tp_shard: bool = False
    fuse_upsample: bool = False
    s2d_stem: bool = False
    bf16_head: bool = False
    remat_stages: bool = False

    @nn.compact
    def __call__(self, masked, mask) -> GeneratorOutput:
        f = self.base_features
        x = jnp.concatenate([masked, mask.astype(masked.dtype)], axis=-1)
        valid = 1.0 - mask
        specs = _encoder_specs(f) + _dilation_specs(f) + _decoder_specs(f)
        cls = nn.remat(_Stack) if self.remat_stages else _Stack
        x, _ = cls(specs, self.conv_kind, self.backend,
                   self.compute_dtype, self.param_dtype,
                   tp_shard=self.tp_shard,
                   fuse_upsample=self.fuse_upsample,
                   s2d_stem=self.s2d_stem, name="body")(x, valid)
        out = jnp.tanh(x if self.bf16_head else x.astype(jnp.float32))
        return GeneratorOutput(coarse=None, fine=out)


class CoarseToFineGenerator(nn.Module):
    """Two-stage DeepFill-style generator with contextual attention."""

    base_features: int = 48
    conv_kind: str = "gated"
    use_attention: bool = True
    attention_rate: int = 2
    attention_ksize: int = 3
    softmax_scale: float = 10.0
    backend: str = "auto"
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    tp_shard: bool = False
    fuse_upsample: bool = False
    s2d_stem: bool = False
    # serving-only: evaluate the tanh output heads in compute dtype
    # instead of f32 (saves full-resolution f32 traffic; outputs are
    # uint8-quantized at the API boundary anyway)
    bf16_head: bool = False
    remat_stages: bool = False

    def _stack(self, specs, name):
        # remat: recompute each stack's activations in the backward pass
        # (jax.checkpoint via nn.remat) instead of keeping them live across
        # the whole G+D step — trades ~1 extra forward of FLOPs for the
        # full-resolution activation memory, which is what bounds batch
        # size at 512² (13.7 GB temp at b8 unrematted). Inference cost: none
        # (checkpointing only affects differentiation).
        cls = nn.remat(_Stack) if self.remat_stages else _Stack
        return cls(specs, self.conv_kind, self.backend,
                   self.compute_dtype, self.param_dtype,
                   tp_shard=self.tp_shard,
                   fuse_upsample=self.fuse_upsample,
                   s2d_stem=self.s2d_stem, name=name)

    @nn.compact
    def __call__(self, masked, mask) -> GeneratorOutput:
        f = self.base_features
        mask = mask.astype(masked.dtype)
        valid = 1.0 - mask

        # ---- stage 1: coarse -------------------------------------------
        x1 = jnp.concatenate([masked, mask], axis=-1)
        specs1 = _encoder_specs(f) + _dilation_specs(f) + _decoder_specs(f)
        x1, _ = self._stack(specs1, "coarse")(x1, valid)
        coarse = jnp.tanh(x1 if self.bf16_head else x1.astype(jnp.float32))

        # ---- stage 2: refinement on the pasted coarse result -----------
        pasted = coarse.astype(masked.dtype) * mask + masked * valid
        x2 = jnp.concatenate([pasted, mask], axis=-1)

        conv_branch, _ = self._stack(
            _encoder_specs(f) + _dilation_specs(f), "refine_conv")(x2, valid)

        if self.use_attention:
            attn_specs = [
                dict(features=f, kernel_size=5),
                dict(features=2 * f, stride=2),
                dict(features=2 * f),
                dict(features=4 * f, stride=2),
                dict(features=4 * f, activation="relu"),
            ]
            xa, _ = self._stack(attn_specs, "refine_attn_enc")(x2, valid)
            # hole mask at the attention branch's 1/4 resolution —
            # conservative max-pool so thin strokes can't vanish
            from gan_inpainting_tpu.ops.contextual_attention import (
                downscale_mask_max,
            )
            mask_q = downscale_mask_max(mask, 4)
            xa = contextual_attention(
                xa, xa, mask_q,
                ksize=self.attention_ksize,
                rate=self.attention_rate,
                softmax_scale=self.softmax_scale,
                backend=self.backend)
            xa, _ = self._stack(
                [dict(features=4 * f), dict(features=4 * f)],
                "refine_attn_post")(xa, valid[:, ::4, ::4, :])
            x2 = jnp.concatenate([conv_branch, xa], axis=-1)
        else:
            x2 = conv_branch

        x2, _ = self._stack(_decoder_specs(f), "refine_dec")(
            x2, valid[:, ::4, ::4, :])
        fine = jnp.tanh(x2 if self.bf16_head else x2.astype(jnp.float32))
        return GeneratorOutput(coarse=coarse, fine=fine)


def build_generator(model_cfg, backend: str | None = None) -> nn.Module:
    """Construct the generator described by a ModelConfig."""
    from gan_inpainting_tpu.utils.dtypes import DTypePolicy

    policy = (DTypePolicy.full_f32() if model_cfg.dtype_policy == "f32"
              else DTypePolicy.bf16_compute())
    backend = backend or model_cfg.kernel_backend
    common = dict(
        base_features=model_cfg.base_features,
        conv_kind=model_cfg.conv_kind,
        backend=backend,
        compute_dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
        tp_shard=model_cfg.tp_shard,
        fuse_upsample=model_cfg.fuse_upsample,
        s2d_stem=model_cfg.s2d_stem,
        bf16_head=model_cfg.bf16_head,
        remat_stages=model_cfg.remat_stages,
    )
    if model_cfg.generator == "dilated":
        return DilatedGenerator(**common)
    if model_cfg.generator == "coarse_to_fine":
        return CoarseToFineGenerator(
            use_attention=model_cfg.use_attention,
            attention_rate=model_cfg.attention_rate,
            **common)
    raise ValueError(f"unknown generator {model_cfg.generator!r}")
