"""VGG perceptual + style losses (reference R12; Liu et al. ECCV'18 usage).

A Flax VGG16 feature extractor (convs through pool3 by default — the layers
the partial-conv paper's losses use). Weights are *injected*: this
environment has no network, so pretrained weights cannot be downloaded
(SURVEY.md §7 "VGG weights with no network"). The loss is therefore:

* weight-0-able from config (LossConfig.perceptual_weight/style_weight),
* loadable from an .npz produced by ``tools/convert_vgg_weights.py`` run on
  any machine with torchvision available,
* deterministic under random init (fixed seed) so tests exercise the full
  code path without pretrained weights.

Perceptual = Σ_l mean|φ_l(out) − φ_l(gt)|; style = Σ_l mean|G(φ_l(out)) −
G(φ_l(gt))| with G the channel Gram matrix normalized by C·H·W.
"""

from __future__ import annotations

import pathlib
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 conv layout: (block, convs-in-block)
_VGG16_LAYOUT: Sequence[tuple[int, int]] = ((1, 2), (2, 2), (3, 3))
_WIDTHS = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """VGG16 trunk returning the feature map after each block's pool."""

    num_blocks: int = 3
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [-1, 1]. Returns list of block features."""
        x = (x.astype(jnp.float32) + 1.0) * 0.5
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        x = x.astype(self.compute_dtype)
        feats = []
        for block, n_convs in _VGG16_LAYOUT[:self.num_blocks]:
            for i in range(n_convs):
                x = nn.Conv(_WIDTHS[block], (3, 3), padding="SAME",
                            dtype=self.compute_dtype,
                            name=f"conv{block}_{i + 1}")(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            feats.append(x)
        return feats


def init_vgg(weights_path: str = "", num_blocks: int = 3,
             compute_dtype=jnp.bfloat16):
    """Build (module, params). Loads converted weights if a path is given."""
    model = VGG16Features(num_blocks=num_blocks, compute_dtype=compute_dtype)
    params = model.init(jax.random.key(7),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
    if weights_path:
        params = _load_converted(weights_path, params)
    return model, params


def _load_converted(path: str, params):
    data = np.load(pathlib.Path(path))
    loaded = jax.tree.map(lambda x: x, params)  # shallow copy
    for name in list(loaded.keys()):
        k, b = f"{name}/kernel", f"{name}/bias"
        if k not in data:
            raise KeyError(f"{path} missing {k}; run tools/convert_vgg_weights.py")
        kernel = jnp.asarray(data[k])
        if kernel.shape != loaded[name]["kernel"].shape:
            raise ValueError(f"{k}: shape {kernel.shape} != "
                             f"{loaded[name]['kernel'].shape}")
        loaded[name] = {"kernel": kernel, "bias": jnp.asarray(data[b])}
    return loaded


def gram_matrix(feat):
    """Channel Gram matrix, normalized by C*H*W. feat: (B, H, W, C)."""
    b, h, w, c = feat.shape
    x = feat.astype(jnp.float32).reshape(b, h * w, c)
    g = jnp.einsum("bnc,bnd->bcd", x, x, preferred_element_type=jnp.float32)
    return g / (h * w * c)


def perceptual_and_style_loss(vgg_apply, vgg_params, output, target):
    """Returns (perceptual, style) scalars in float32.

    vgg_apply: bound apply fn ``(params, images) -> [features]``.
    """
    f_out = vgg_apply(vgg_params, output)
    f_tgt = vgg_apply(vgg_params, jax.lax.stop_gradient(target))
    perc = jnp.asarray(0.0, jnp.float32)
    style = jnp.asarray(0.0, jnp.float32)
    for fo, ft in zip(f_out, f_tgt):
        perc += jnp.mean(jnp.abs(fo.astype(jnp.float32)
                                 - ft.astype(jnp.float32)))
        style += jnp.mean(jnp.abs(gram_matrix(fo) - gram_matrix(ft)))
    return perc, style
