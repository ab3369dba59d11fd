"""Driver benchmark: prints cumulative JSON lines; the LAST line is complete.

Headline metric: 256² masked-image inpainting throughput per chip on the
flagship (DeepFill-v2-style gated + contextual attention) generator —
BASELINE.json:2's first tracked metric. ``vs_baseline`` is relative to the
north-star target of 5,000 images/sec on a v4-8, i.e. 625 images/sec/chip
(BASELINE.json:5; the reference itself has no published numbers —
BASELINE.md).

BASELINE.json:2's second tracked metric — G+D train steps/sec — rides the
same JSON line under ``train_*`` keys (the reference default config:
128² center-mask, the shape BASELINE.json:7 describes). ``train512_*`` and
``serve512_*`` track the 512² marquee configs.

Timeout-proofing (VERDICT r4 #1) — round 4's driver run was killed by its
wall budget with ZERO output because the old design ran four compile-heavy
metrics serially and printed once at the very end. This version:

* probes TPU health first with a tiny ``jnp.sum`` in a subprocess under a
  short deadline, and emits a ``{"tpu_unhealthy": ...}`` line fast if the
  worker is wedged (the CLAUDE.md recovery idiom);
* runs each metric in its OWN subprocess with a wall budget
  (``BENCH_<NAME>_BUDGET_S`` env overrides), so one wedged compile cannot
  eat the whole run — the child is killed and the metric is recorded as
  ``<name>_skipped`` instead;
* prints-and-flushes a CUMULATIVE JSON line after every metric, so the
  driver's tail always holds the best-so-far measurement no matter when an
  outer ``timeout`` fires (``timeout 60 python bench.py`` leaves at least
  the probe line);
* points children at a persistent JAX compilation cache
  (``.jax_compile_cache/``, disable with ``BENCH_COMPILE_CACHE=0``); per-
  metric wall seconds are recorded (``<name>_s``) so cache behavior is
  visible in the artifact. MEASURED (r5, this box, two back-to-back full
  runs): the cache WRITES entries (85 MB after one run) but gives no
  RELIABLE repeat speedup — infer256_s 653.8 -> 777.7 and train128_s
  374.8 -> 600+ (slower), while serve512/train512 dropped 600+/681 ->
  350/379; axon worker-health variance dominates whatever the cache
  contributes, and remote-helper compiles are not clearly short-circuited
  by local cache hits. Kept on: harmless here, correct on real local-TPU
  hosts.

Regression guard (VERDICT r3 #6): the final line compares its metrics
against the newest committed ``BENCH_r*.json`` THAT PARSED (a null/failed
artifact like round 4's is skipped — VERDICT r4 #2); a >3% drop in any
tracked metric prints a loud REGRESSION line to stderr and lands in the
JSON under ``"regression"``. ``python bench.py --check`` additionally exits
nonzero so local/CI use fails hard; the bare driver invocation stays exit-0
so the driver still records the artifact.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
BASELINE_PER_CHIP = 5000.0 / 8.0

# metrics the regression guard watches (all "higher is better")
GUARDED_KEYS = ("value", "train_value", "train512_value", "serve512_value")
REGRESSION_THRESHOLD = 0.03

# (name, primary output key, default wall budget in seconds). Ordered
# cheapest-compile-first so an outer timeout preserves the most metrics;
# train512 (SN+VGG+R1 grad-of-grad, 16-step scan — the 5–10 min compile
# class on this box) goes last.
METRICS = (
    ("infer256", "value", 900),
    ("train128", "train_value", 900),
    ("serve512", "serve512_value", 1200),
    ("train512", "train512_value", 1200),
    # opt-in: serve1024 is guard-trackABLE but disabled by default (budget
    # 0) so the driver's wall budget stays owned by the four core metrics;
    # enable with BENCH_SERVE1024_BUDGET_S=1500. Reference numbers (r5
    # probe, tools/probe_serve1024.py): 15.74 img/s b8, 4.1 GB temp.
    ("serve1024", "serve1024_value", 0),
)
CHILD_TAG = "BENCH_CHILD "


def latest_committed_bench() -> tuple[str, dict] | None:
    """Newest BENCH_r*.json with parseable metrics → (name, parsed dict).

    Artifacts whose ``parsed`` is null or metric-free (a timed-out round,
    like BENCH_r04) are skipped so the guard falls back to the newest GOOD
    round instead of silently comparing against nothing (VERDICT r4 #2).
    """
    paths = glob.glob(os.path.join(ROOT, "BENCH_r*.json"))

    def round_no(p):
        m = re.search(r"BENCH_r(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    for path in sorted(paths, key=round_no, reverse=True):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        ref = data.get("parsed", data)
        if isinstance(ref, dict) and any(
                isinstance(ref.get(k), (int, float)) for k in GUARDED_KEYS):
            return os.path.basename(path), ref
    return None


def check_regression(out: dict, ref: dict,
                     threshold: float = REGRESSION_THRESHOLD) -> list[str]:
    """Messages for every guarded metric that dropped >threshold vs ref."""
    msgs = []
    for key in GUARDED_KEYS:
        new, old = out.get(key), ref.get(key)
        if (isinstance(new, (int, float)) and isinstance(old, (int, float))
                and old > 0 and new < old * (1.0 - threshold)):
            msgs.append(f"REGRESSION {key}: {new:.2f} is "
                        f"{100 * (1 - new / old):.1f}% below the committed "
                        f"{old:.2f}")
    return msgs


# --------------------------------------------------------------------------
# child side: one metric per process, result on the last stdout line
# --------------------------------------------------------------------------

def run_child_metric(name: str) -> dict:
    from gan_inpainting_tpu.bench import bench_infer, bench_train
    from gan_inpainting_tpu.configs.base import apply_overrides, get_config

    if name == "infer256":
        cfg = get_config("serve_v4_8")
        cfg = apply_overrides(cfg, ["train.mesh.data=-1",
                                    "train.mesh.model=1"])
        # batch 128 saturates a v5e chip (555 img/s vs 439 at b64, 551 b256)
        r = bench_infer(cfg, batch=128, iters=10, warmup=2)
        return {"metric": r["metric"], "value": round(r["value"], 2),
                "unit": r["unit"],
                "vs_baseline": round(r["value"] / BASELINE_PER_CHIP, 4)}

    if name == "train128":
        # second tracked metric: G+D train steps/sec on the reference-
        # default 128² config (batch 32 — the round-1 operating point)
        cfg = get_config("celeba128_center")
        cfg = apply_overrides(cfg, ["data.batch_size=32",
                                    "train.mesh.data=-1",
                                    "train.mesh.model=1"])
        r = bench_train(cfg, iters=10)
        return {"train_metric": r["metric"],
                "train_value": round(r["value"], 2),
                "train_unit": r["unit"], "train_batch": r["batch"]}

    if name == "train512":
        # marquee 512² training config (SN-PatchGAN + VGG + mixed-mask
        # curriculum, BASELINE.json:10). One full lazy-R1 period per timed
        # scan: the config fires R1 every r1_interval-th step, so a shorter
        # window would weight the grad-of-grad step at 1/iters instead of
        # the true amortized 1/interval.
        cfg = get_config("places512_sn_vgg")
        cfg = apply_overrides(cfg, ["train.mesh.data=-1",
                                    "train.mesh.model=1"])
        iters = max(5, cfg.loss.r1_interval if cfg.loss.r1_gamma > 0 else 0)
        r = bench_train(cfg, iters=iters)
        return {"train512_metric":
                    "512² G+D train steps/sec (places512_sn_vgg)",
                "train512_value": round(r["value"], 2),
                "train512_batch": r["batch"]}

    if name == "serve512":
        # 512² serve throughput (VERDICT r3 #6: r2's 91.9 img/s headline
        # previously had no guard at all). Operating point follows the r5
        # 512² sweep (tools/sweep_serve512.py, SURVEY §8f): batch 64 beats
        # 32 (97.8 vs 91.5 img/s) and the fused-upsample decoder LOSES at
        # this size (the serving path now unfuses >256² via
        # infer.fuse_upsample_max_size — this measures what it ships);
        # combined 101.1 img/s vs the old point's 91.4.
        cfg = get_config("serve_v4_8")
        cfg = apply_overrides(cfg, ["data.image_size=512",
                                    "model.fuse_upsample=false",
                                    "train.mesh.data=-1",
                                    "train.mesh.model=1"])
        r = bench_infer(cfg, batch=64, iters=5, warmup=2)
        return {"serve512_metric": "512x512 inpaint images/sec/chip",
                "serve512_value": round(r["value"], 2),
                "serve512_batch": 64}

    if name == "serve1024":
        # single-chip 1024² bucket (r5 stretch): flash-attention regime,
        # 65,536 stage-2 tokens; fits one v5e with ~4x HBM headroom
        cfg = get_config("serve_v4_8")
        # unfused decoder to match shipped serving >256²
        # (infer.fuse_upsample_max_size); the r5 probe's 15.74 was the
        # FUSED formulation — expect ≥ that here per the 512² trend
        cfg = apply_overrides(cfg, ["data.image_size=1024",
                                    "model.fuse_upsample=false",
                                    "train.mesh.data=-1",
                                    "train.mesh.model=1"])
        r = bench_infer(cfg, batch=8, iters=5, warmup=2)
        return {"serve1024_metric": "1024x1024 inpaint images/sec/chip",
                "serve1024_value": round(r["value"], 2),
                "serve1024_batch": 8}

    raise ValueError(f"unknown bench metric {name!r}")


# --------------------------------------------------------------------------
# parent side: probe, budgets, cumulative flushing
# --------------------------------------------------------------------------

def _budget(name: str, default: int) -> float:
    return float(os.environ.get(f"BENCH_{name.upper()}_BUDGET_S", default))


def _child_env() -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    if os.environ.get("BENCH_COMPILE_CACHE", "1") != "0":
        # persistent compilation cache: repeat driver runs skip the big
        # compiles. Set via env BEFORE the child interpreter starts —
        # this box's sitecustomize imports jax at startup, so in-process
        # config updates would be too late for cache-config reads.
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(ROOT, ".jax_compile_cache"))
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    return env


def _emit(out: dict) -> None:
    print(json.dumps(out), flush=True)


def _run_subprocess(args: list[str], timeout: float) -> tuple[str, str]:
    """Run a child; return ("ok"|"timeout"|"rc<N>", last tagged line)."""
    try:
        proc = subprocess.run(args, capture_output=True, text=True,
                              timeout=timeout, env=_child_env(), cwd=ROOT)
    except subprocess.TimeoutExpired:
        return "timeout", ""
    sys.stderr.write(proc.stderr[-2000:])
    tagged = [ln for ln in proc.stdout.splitlines()
              if ln.startswith(CHILD_TAG)]
    if proc.returncode != 0:
        return f"rc{proc.returncode}", tagged[-1] if tagged else ""
    return "ok", tagged[-1] if tagged else ""


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        frag = run_child_metric(sys.argv[2])
        print(CHILD_TAG + json.dumps(frag), flush=True)
        return 0

    t_start = time.perf_counter()
    out: dict = {"metric": "256x256 inpaint images/sec/chip", "value": None,
                 "unit": "images/sec/chip", "vs_baseline": None}
    # first parseable line goes out BEFORE any TPU contact: even first
    # contact through the axon tunnel can take minutes cold, and a wedged
    # worker hangs a tiny jnp.sum for ~1 h — an outer `timeout 60` must
    # still find a line in the tail (VERDICT r4 #1).
    _emit(out)

    # TPU health probe: a wedged axon worker hangs even a tiny jnp.sum for
    # ~1 h (CLAUDE.md); bail out fast with an explicit marker instead.
    probe_t0 = time.perf_counter()
    status, _ = _run_subprocess(
        [sys.executable, "-c",
         "import jax.numpy as jnp; print(float(jnp.arange(8.0).sum()))"],
        _budget("probe", 600))  # measured: a RECOVERING worker answered a
    # tiny jnp.sum correctly after 9m43s (r5 session) — a short budget would
    # misclassify a healing worker as wedged
    out["probe_s"] = round(time.perf_counter() - probe_t0, 1)
    if status != "ok":
        out["tpu_unhealthy"] = (
            f"health probe (tiny jnp.sum) failed: {status} "
            f"after {out['probe_s']}s — axon worker likely wedged")
        for name, _key, _d in METRICS:
            out[f"{name}_skipped"] = "tpu unhealthy"
        _emit(out)
        return 0
    _emit(out)

    for name, _key, default_budget in METRICS:
        budget = _budget(name, default_budget)
        if budget <= 0:
            out[f"{name}_skipped"] = "budget 0 (disabled)"
            _emit(out)
            continue
        t0 = time.perf_counter()
        status, line = _run_subprocess(
            [sys.executable, os.path.abspath(__file__), "--child", name],
            budget)
        out[f"{name}_s"] = round(time.perf_counter() - t0, 1)
        if status == "ok" and line:
            out.pop(f"{name}_skipped", None)
            out.update(json.loads(line[len(CHILD_TAG):]))
        else:
            reason = ("timeout" if status == "timeout"
                      else f"child failed ({status})")
            out[f"{name}_skipped"] = (
                f"{reason} after {out[f'{name}_s']}s (budget {budget:.0f}s)")
            print(f"bench: {name} skipped: {out[f'{name}_skipped']}",
                  file=sys.stderr)
        _emit(out)

    out["elapsed_s"] = round(time.perf_counter() - t_start, 1)
    ref = latest_committed_bench()
    regressions = check_regression(out, ref[1]) if ref else []
    if regressions:
        out["regression"] = regressions
        for msg in regressions:
            print(f"{msg} (vs {ref[0]})", file=sys.stderr)
    _emit(out)
    if "--check" in sys.argv[1:]:
        return 1 if regressions else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
