"""Execute the multi-host (DCN) code path FOR REAL on one box.

VERDICT r2 next #4: every ``process_count > 1`` branch in
parallel/multihost.py, train/loop.py and train/evaluate.py had only ever
been unit-tested at the 1-process identity. This tool launches a genuine
2-process ``jax.distributed`` cluster on localhost (4 virtual CPU devices
each → 8 global), runs a short training loop through the REAL
``train.loop.train`` entry (per-process batch slicing, disjoint mask
streams, ``make_array_from_process_local_data`` batch assembly, in-jit
eval reduction, coordinated orbax checkpoint), and asserts metric parity
against a single-process simulation that reproduces the same global batch
from the two per-process streams.

Usage:
    python tools/run_multihost_cpu.py            # orchestrate + verify
    python tools/run_multihost_cpu.py --worker … # (internal)

Exit codes: 0 ok, 3 unsupported on this box (pytest skips), 1 mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import socket
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

STEPS = 3
GLOBAL_BATCH = 8
N_PROC = 2

OVERRIDES = [
    "data.image_size=32",
    f"data.batch_size={GLOBAL_BATCH}",
    "data.eval_batch_size=8",
    "data.num_eval_batches=2",
    "model.base_features=8",
    "model.disc_features=8",
    "model.disc_layers=2",
    "model.dtype_policy=f32",
    f"train.steps={STEPS}",
    "train.log_every=1",
    "train.eval_every=1000",      # final-step eval still triggers
    "train.checkpoint_every=1000",  # final-step save still triggers
    "train.mesh.data=-1",
    "train.mesh.model=1",
]


def _cfg(workdir: str):
    from gan_inpainting_tpu.configs.base import apply_overrides, get_config

    cfg = get_config("celeba128_center")
    return apply_overrides(cfg, OVERRIDES + [f"train.workdir={workdir}"])


def _worker(process_id: int, port: int, workdir: str, out_path: str) -> int:
    # CPU platform must be forced via jax.config (sitecustomize already
    # imported jax with the axon platform — CLAUDE.md env rule 1)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older/newer flag spelling; initialize() may still work

    # the real code path: train() → ensure_initialized() reads these
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(N_PROC)
    os.environ["JAX_PROCESS_ID"] = str(process_id)

    from gan_inpainting_tpu.train.evaluate import evaluate
    from gan_inpainting_tpu.train.loop import train

    cfg = _cfg(workdir)
    state, metrics = train(cfg, resume=False, verbose=process_id == 0)
    ev = evaluate(cfg, state.g_params)
    if process_id == 0:
        result = {
            "n_processes": jax.process_count(),
            "n_devices": jax.device_count(),
            "metrics": {k: float(v) for k, v in metrics.items()},
            "eval": {k: float(v) for k, v in ev.items()},
        }
        pathlib.Path(out_path).write_text(json.dumps(result))
    return 0


def _simulate(workdir: str) -> dict:
    """Reproduce the 2-process run in ONE process: same global batch built
    from the two per-process data/mask streams, same step keys."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)
    import jax.numpy as jnp

    from gan_inpainting_tpu.data.loader import make_dataset
    from gan_inpainting_tpu.data.pipeline import make_train_batch
    from gan_inpainting_tpu.parallel.mesh import build_mesh
    from gan_inpainting_tpu.parallel.sharding import replicated, shard_batch
    from gan_inpainting_tpu.train.evaluate import make_eval_step
    from gan_inpainting_tpu.train.state import create_state
    from gan_inpainting_tpu.train.step import make_train_step
    from gan_inpainting_tpu.utils.rng import make_streams

    cfg = _cfg(workdir)
    local = GLOBAL_BATCH // N_PROC
    seed_offsets = [p * 1_000_003 for p in range(N_PROC)]  # multihost.py

    mesh = build_mesh(cfg.train.mesh)
    streams = make_streams(cfg.train.seed)
    state = create_state(cfg, streams["params"].at_step(0))
    state = jax.device_put(state, replicated(mesh))
    train_step = make_train_step(cfg)

    iters = [make_dataset(cfg.data, seed=cfg.train.seed + off, split="train",
                          batch_size=local) for off in seed_offsets]
    cur = cfg.mask.curriculum_steps
    with jax.set_mesh(mesh):
        metrics = {}
        for step in range(STEPS):
            progress = min(1.0, step / cur) if cur else 1.0
            mk = streams["masks"].at_step(step)
            parts = [
                make_train_batch(next(iters[p]), jax.random.fold_in(mk, p),
                                 cfg.mask, progress,
                                 flip=cfg.data.random_flip)
                for p in range(N_PROC)
            ]
            batch = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *parts)
            batch = shard_batch(mesh, batch)
            state, metrics = train_step(state, batch,
                                        streams["train"].at_step(step))

        # evaluate() parity: same per-process eval streams + mask fold-ins
        eval_step = make_eval_step(cfg)
        elocal = cfg.data.eval_batch_size // N_PROC
        eits = [make_dataset(cfg.data, seed=cfg.train.seed + off,
                             split="eval", batch_size=elocal)
                for off in seed_offsets]
        key = jax.random.key(0 + 777)
        sums: dict[str, float] = {}
        count = 0
        for i in range(cfg.data.num_eval_batches):
            mki = jax.random.fold_in(key, i)
            parts = [
                make_train_batch(next(eits[p]), jax.random.fold_in(mki, p),
                                 cfg.mask)
                for p in range(N_PROC)
            ]
            batch = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *parts)
            per = eval_step(state.g_params, batch)
            for name, v in per.items():
                sums[name] = sums.get(name, 0.0) + float(v)
            count += cfg.data.eval_batch_size

    return {
        "metrics": {k: float(v) for k, v in metrics.items()},
        "eval": {k: total / count for k, total in sums.items()},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.worker:
        return _worker(args.process_id, args.port, args.workdir, args.out)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    tmp = tempfile.mkdtemp(prefix="multihost_cpu_")
    out_path = os.path.join(tmp, "result.json")
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=4").strip()
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"

    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", f"--process-id={p}",
             f"--port={port}", f"--workdir={tmp}/work", f"--out={out_path}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for p in range(N_PROC)
    ]
    outs = []
    try:
        for pr in procs:
            out, _ = pr.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for pr in procs:
            pr.kill()
        print("TIMEOUT waiting for workers")
        for out in outs:
            print(out[-4000:])
        return 3

    rcs = [pr.returncode for pr in procs]
    if any(rcs):
        text = "\n".join(o[-4000:] for o in outs)
        print(text)
        lowered = text.lower()
        # unsupported-box detection must not swallow real failures: a
        # "[Gloo] Rank N is connected" line proves collectives DO work
        # here, so only classify as unsupported when gloo never connected
        # and the error talks about collectives being unimplemented
        gloo_connected = "is connected to" in lowered
        if not gloo_connected and ("unimplemented" in lowered
                                   or "collectives" in lowered):
            print("UNSUPPORTED: multi-process CPU collectives unavailable")
            return 3
        print(f"worker failure rcs={rcs}")
        return 1

    got = json.loads(pathlib.Path(out_path).read_text())
    assert got["n_processes"] == N_PROC and got["n_devices"] == 8, got
    want = _simulate(tmp + "/sim")

    diffs = {}
    for section in ("metrics", "eval"):
        for k, v in want[section].items():
            diffs[f"{section}.{k}"] = abs(got[section][k] - v)
    max_diff = max(diffs.values())
    ok = max_diff < 5e-4
    print(json.dumps({"ok": ok, "max_diff": max_diff,
                      "got": got, "want": want}, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
