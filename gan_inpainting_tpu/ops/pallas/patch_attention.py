"""Blockwise patch attention Pallas kernel (placeholder — delegates to XLA).

The real flash-style kernel (running-softmax over background-patch tiles,
SURVEY.md §5) lands behind this signature.
"""

from __future__ import annotations


def patch_attention_pallas(q, k, key_valid, v, *, softmax_scale):
    from gan_inpainting_tpu.ops.contextual_attention import (
        _patch_attention_xla,
    )

    return _patch_attention_xla(q, k, key_valid, v, softmax_scale)
