"""Bench harness smoke tests (CPU, tiny shapes) — the driver runs these
entry points on real TPU, so their structure must never break."""

from gan_inpainting_tpu.bench import bench_infer, bench_train
from gan_inpainting_tpu.configs.base import apply_overrides


def test_bench_infer_structure(tiny_config):
    tiny_config = apply_overrides(tiny_config, ["train.mesh.data=1"])
    r = bench_infer(tiny_config, batch=4, iters=2, warmup=1)
    assert r["unit"] == "images/sec/chip"
    assert r["value"] > 0
    assert r["metric"].startswith("32x32")
    assert r["chips"] >= 1


def test_bench_train_structure(tiny_config):
    tiny_config = apply_overrides(tiny_config, ["train.mesh.data=1"])
    r = bench_train(tiny_config, iters=2)
    assert r["unit"] == "steps/sec"
    assert r["value"] > 0
    assert r["images_per_sec"] > 0
