"""Converter↔loader contract for injected VGG weights (VERDICT r1 next #8).

tools/convert_vgg_weights.py writes ``conv{block}_{i}/kernel`` (HWIO) and
``conv{block}_{i}/bias`` keys; losses/perceptual.py's ``_load_converted``
consumes them. The converter needs torchvision (absent here), so the test
builds an .npz with exactly the converter's documented key/format contract
and round-trips it through ``init_vgg``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gan_inpainting_tpu.losses.perceptual import (
    VGG16Features,
    _VGG16_LAYOUT,
    _WIDTHS,
    init_vgg,
)


def _converter_style_npz(path, blocks=3, salt=0.0):
    """Emulate tools/convert_vgg_weights.py's output format exactly."""
    arrays = {}
    cin = 3
    for block, n_convs in _VGG16_LAYOUT[:blocks]:
        cout = _WIDTHS[block]
        for i in range(1, n_convs + 1):
            rng = np.random.default_rng(block * 10 + i)
            arrays[f"conv{block}_{i}/kernel"] = (
                rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
                + salt)
            arrays[f"conv{block}_{i}/bias"] = np.full(cout, salt, np.float32)
            cin = cout
    np.savez(path, **arrays)
    return arrays


def test_converted_weights_round_trip(tmp_path):
    path = tmp_path / "vgg16_features.npz"
    arrays = _converter_style_npz(path, salt=0.25)
    model, params = init_vgg(str(path))
    for name, sub in params.items():
        np.testing.assert_array_equal(
            np.asarray(sub["kernel"]), arrays[f"{name}/kernel"])
        np.testing.assert_array_equal(
            np.asarray(sub["bias"]), arrays[f"{name}/bias"])
    # loaded params actually run
    import jax

    feats = model.apply({"params": params},
                        jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert len(feats) == 3
    assert all(bool(jnp.all(jnp.isfinite(f))) for f in feats)


def test_missing_key_raises(tmp_path):
    path = tmp_path / "incomplete.npz"
    arrays = _converter_style_npz(path)
    data = dict(np.load(path))
    del data["conv2_1/kernel"]
    np.savez(path, **data)
    with pytest.raises(KeyError, match="conv2_1/kernel"):
        init_vgg(str(path))


def test_shape_mismatch_raises(tmp_path):
    path = tmp_path / "badshape.npz"
    _converter_style_npz(path)
    data = dict(np.load(path))
    data["conv1_1/kernel"] = data["conv1_1/kernel"][..., :32]
    np.savez(path, **data)
    with pytest.raises(ValueError, match="conv1_1"):
        init_vgg(str(path))
