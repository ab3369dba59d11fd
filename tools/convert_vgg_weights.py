"""Convert torchvision VGG16 weights to the .npz this framework loads.

Run on any machine with torchvision + downloaded weights (this CI box has no
network, so the perceptual loss ships weight-injectable — SURVEY.md §7):

    python tools/convert_vgg_weights.py --out vgg16_features.npz

Then point LossConfig.vgg_weights_path at the file. Keys are
``conv{block}_{i}/kernel`` (HWIO) and ``conv{block}_{i}/bias``, matching
gan_inpainting_tpu/losses/perceptual.py.
"""

from __future__ import annotations

import argparse

import numpy as np

# VGG16 'features' module indices of the conv layers, in order
_TORCH_CONV_LAYOUT = [
    ("conv1_1", 0), ("conv1_2", 2),
    ("conv2_1", 5), ("conv2_2", 7),
    ("conv3_1", 10), ("conv3_2", 12), ("conv3_3", 14),
    ("conv4_1", 17), ("conv4_2", 19), ("conv4_3", 21),
    ("conv5_1", 24), ("conv5_2", 26), ("conv5_3", 28),
]


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="vgg16_features.npz")
    parser.add_argument("--blocks", type=int, default=3,
                        help="how many VGG blocks to export (loss uses 3)")
    args = parser.parse_args()

    import torchvision  # requires a torchvision install with weights access

    vgg = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1)
    features = vgg.features

    arrays = {}
    for name, idx in _TORCH_CONV_LAYOUT:
        block = int(name[4])
        if block > args.blocks:
            break
        conv = features[idx]
        # torch OIHW → jax HWIO
        kernel = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        arrays[f"{name}/kernel"] = kernel.astype(np.float32)
        arrays[f"{name}/bias"] = conv.bias.detach().numpy().astype(np.float32)

    np.savez(args.out, **arrays)
    print(f"wrote {len(arrays)} arrays to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
