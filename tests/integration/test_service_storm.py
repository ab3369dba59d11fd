"""Serving tier under load (VERDICT r3 #4): mixed-size concurrency storms,
dispatch-group capping, oversize-burst handling, and admission backpressure.

The failure mode being guarded: the dispatcher's head-bucket coalesce used
to take ALL matching pending requests with no cap, so a burst larger than
the largest batch bucket reached ``_bucket`` and failed every request in
the group. Dispatch groups are now capped at ``max_batch`` and admission is
bounded (``ServiceOverloadedError`` → HTTP 429).
"""

import base64
import io
import json
import threading
import time
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from gan_inpainting_tpu.configs.base import apply_overrides
from gan_inpainting_tpu.infer.inpaint import Inpainter
from gan_inpainting_tpu.infer.service import (
    InpaintService,
    ServiceOverloadedError,
    make_http_server,
)
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


class _SlowInpainter:
    """Wraps an Inpainter; stalls each batch so bursts pile up in pending."""

    def __init__(self, inner, delay_s=0.05):
        self._inner = inner
        self._delay = delay_s
        self.cfg = inner.cfg
        self.batch_sizes = []

    def inpaint_batch(self, images, masks):
        self.batch_sizes.append(images.shape[0])
        time.sleep(self._delay)
        return self._inner.inpaint_batch(images, masks)


def test_burst_larger_than_largest_bucket(inpainter):
    # 30 same-size requests pile up while the first dispatch stalls — the
    # deferred group exceeds the largest batch bucket (8). Pre-fix this
    # raised inside _bucket and failed the whole group.
    slow = _SlowInpainter(inpainter, delay_s=0.2)
    service = InpaintService(slow, max_wait_ms=1.0)
    try:
        imgs = [_image(i) for i in range(30)]
        mask = _mask()
        futures = [service.submit(img, mask) for img in imgs]
        outs = [f.result(timeout=300) for f in futures]
        direct = inpainter.inpaint_batch(np.stack(imgs[:8]),
                                         np.stack([mask] * 8))
        for out, want in zip(outs[:8], direct):
            np.testing.assert_array_equal(out, want)
        assert all(n <= 8 for n in slow.batch_sizes), slow.batch_sizes
        assert sum(slow.batch_sizes) == 30
    finally:
        service.close()


def test_mixed_size_storm(inpainter):
    # concurrent submitters across two size buckets; every request must
    # resolve with its own shape and bit-exact known pixels
    service = InpaintService(inpainter, max_wait_ms=5.0)
    results = {}
    errors = []

    def worker(i):
        size = 32 if i % 3 else 64
        img, mask = _image(i, size), _mask(size)
        try:
            out = service.submit(img, mask).result(timeout=300)
            results[i] = (out.shape == (size, size, 3)
                          and np.array_equal(out[mask == 0], img[mask == 0]))
        except Exception as e:  # noqa: BLE001 — collected for the assert
            errors.append((i, e))

    try:
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert len(results) == 24 and all(results.values())
        st = service.stats
        assert st["requests"] == 24
        assert "latency_p50_ms" in st and "latency_p99_ms" in st
        assert st["latency_p99_ms"] >= st["latency_p50_ms"]
    finally:
        service.close()


def test_backpressure_sheds_load(inpainter):
    slow = _SlowInpainter(inpainter, delay_s=0.2)
    service = InpaintService(slow, max_wait_ms=1.0, max_queue=4)
    try:
        mask = _mask()
        futures = []
        with pytest.raises(ServiceOverloadedError):
            for i in range(50):
                futures.append(service.submit(_image(i), mask))
        assert len(futures) >= 4          # admitted up to the bound
        for f in futures:                  # admitted requests all complete
            assert f.result(timeout=300).shape == (32, 32, 3)
        assert service.stats["rejected"] >= 1
        assert service.stats["inflight"] == 0
        # after the backlog drains, admission reopens
        out = service.submit(_image(99), mask).result(timeout=300)
        assert out.shape == (32, 32, 3)
    finally:
        service.close()


def _png_b64(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def test_http_429_when_overloaded(inpainter):
    slow = _SlowInpainter(inpainter, delay_s=0.5)
    service = InpaintService(slow, max_wait_ms=1.0, max_queue=2)
    server = make_http_server(service, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        mask = _mask()
        # fill the admission window directly, then hit the HTTP front
        futures = [service.submit(_image(i), mask) for i in range(2)]
        body = json.dumps({"image": _png_b64(_image(9)),
                           "mask": _png_b64((mask * 255).astype(np.uint8))
                           }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint", data=body,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=60)
        assert exc_info.value.code == 429
        assert exc_info.value.headers["Retry-After"] == "1"
        for f in futures:
            f.result(timeout=300)
    finally:
        server.shutdown()
        service.close()
