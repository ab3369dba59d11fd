"""Batched serving tier: micro-batcher + HTTP front (infer/service.py)."""

import base64
import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.infer.inpaint import Inpainter
from gan_inpainting_tpu.infer.service import InpaintService, make_http_server
from gan_inpainting_tpu.train.state import create_state


@pytest.fixture()
def inpainter(tiny_config):
    cfg = apply_overrides(tiny_config, ["infer.batch_buckets=1,4,8",
                                        "infer.size_buckets=32,64"])
    state = create_state(cfg, jax.random.key(0))
    return Inpainter(cfg, state.g_params)


def _image(seed, size=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, (size, size, 3), dtype=np.uint8)


def _mask(size=32):
    m = np.zeros((size, size), np.float32)
    q = size // 4
    m[q:-q, q:-q] = 1.0
    return m


def test_concurrent_requests_coalesce_and_match_direct(inpainter):
    service = InpaintService(inpainter, max_wait_ms=200.0)
    try:
        n = 6
        imgs = [_image(i) for i in range(n)]
        mask = _mask()
        futures = [service.submit(img, mask) for img in imgs]
        outs = [f.result(timeout=120) for f in futures]

        direct = inpainter.inpaint_batch(np.stack(imgs),
                                         np.stack([mask] * n))
        for out, want, img in zip(outs, direct, imgs):
            np.testing.assert_array_equal(out, want)
            np.testing.assert_array_equal(out[mask == 0], img[mask == 0])
        # the batcher actually batched: fewer forwards than requests
        assert service.stats["dispatches"] < n
        assert service.stats["requests"] == n
    finally:
        service.close()


def test_mixed_sizes_dispatch_per_bucket(inpainter):
    service = InpaintService(inpainter, max_wait_ms=200.0)
    try:
        img_s, img_l = _image(0, 32), _image(1, 64)
        f_s = service.submit(img_s, _mask(32))
        f_l = service.submit(img_l, _mask(64))
        out_s = f_s.result(timeout=120)
        out_l = f_l.result(timeout=120)
        assert out_s.shape == (32, 32, 3)
        assert out_l.shape == (64, 64, 3)
        np.testing.assert_array_equal(out_s[_mask(32) == 0],
                                      img_s[_mask(32) == 0])
        np.testing.assert_array_equal(out_l[_mask(64) == 0],
                                      img_l[_mask(64) == 0])
        assert service.stats["dispatches"] == 2
    finally:
        service.close()


def test_submit_validates_shapes(inpainter):
    service = InpaintService(inpainter)
    try:
        with pytest.raises(ValueError, match="mask shape"):
            service.submit(_image(0, 32), _mask(64))
        with pytest.raises(ValueError, match="image must be"):
            service.submit(np.zeros((32, 32), np.uint8), _mask(32))
    finally:
        service.close()


def _png_b64(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def test_http_front_roundtrip(inpainter):
    service = InpaintService(inpainter, max_wait_ms=20.0)
    server = make_http_server(service, port=0)     # ephemeral port
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        img = _image(5)
        mask_u8 = (_mask() * 255).astype(np.uint8)
        body = json.dumps({"image": _png_b64(img),
                           "mask": _png_b64(mask_u8)}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = json.loads(resp.read())
        from PIL import Image

        out = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(payload["output"]))))
        assert out.shape == img.shape
        np.testing.assert_array_equal(out[_mask() == 0], img[_mask() == 0])

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["ok"] and health["requests"] == 1

        # malformed request → clean 400, service stays up
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint", data=b"not json",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(bad, timeout=30)
        assert err.value.code == 400
    finally:
        server.shutdown()
        service.close()
