"""PatchGAN / SN-PatchGAN discriminator (reference R8/R9).

A strided-conv stack emitting a patch-level logit map (B, h', w', 1) — each
logit judges one receptive-field patch, per Isola et al. (pix2pix). With
``spectral_norm=True`` every conv is spectrally normalized and the model is
the SN-PatchGAN of DeepFill v2 (BASELINE.json:10).

The discriminator is conditioned on the mask: input is
``concat(image, mask)`` so D can focus on hole regions (DeepFill-v2 practice).
Logits are returned in float32 — hinge/BCE losses stay out of bf16
(SURVEY.md §7 "keep D logits and loss accumulation in f32").
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from gan_inpainting_tpu.models.layers import SNConv

Dtype = Any


class PatchDiscriminator(nn.Module):
    base_features: int = 64
    num_layers: int = 4
    spectral_norm: bool = False
    compute_dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image, mask, update_stats: bool = False,
                 return_features: bool = False):
        """Patch logit map; with ``return_features`` also the per-layer
        activations (for the pix2pixHD-style feature-matching loss,
        ``loss.feature_match_weight``)."""
        x = jnp.concatenate([image, mask], axis=-1).astype(self.compute_dtype)
        f = self.base_features
        widths = [min(f * (2 ** i), 4 * f) for i in range(self.num_layers)]
        feats = []
        for i, width in enumerate(widths):
            x = SNConv(features=width, kernel_size=5, stride=2,
                       use_sn=self.spectral_norm,
                       compute_dtype=self.compute_dtype,
                       param_dtype=self.param_dtype,
                       name=f"conv{i}")(x, update_stats=update_stats)
            feats.append(x)
        logits = SNConv(features=1, kernel_size=5, stride=1,
                        use_sn=self.spectral_norm, activation="none",
                        compute_dtype=self.compute_dtype,
                        param_dtype=self.param_dtype,
                        name="head")(x, update_stats=update_stats)
        logits = logits.astype(jnp.float32)
        if return_features:
            return logits, tuple(feats)
        return logits


def build_discriminator(model_cfg) -> PatchDiscriminator:
    from gan_inpainting_tpu.utils.dtypes import DTypePolicy

    policy = (DTypePolicy.full_f32() if model_cfg.dtype_policy == "f32"
              else DTypePolicy.bf16_compute())
    return PatchDiscriminator(
        base_features=model_cfg.disc_features,
        num_layers=model_cfg.disc_layers,
        spectral_norm=model_cfg.spectral_norm,
        compute_dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
    )
