"""Minimal repro + bisection harness for the slab fused-attention crash.

Round-1 finding (ops/pallas/fused_attention.py): the slab strategy passes
interpreter equivalence and has produced correct values on v5e, but crashes
the TPU worker NONDETERMINISTICALLY. Suspects: input double-buffer prefetch
racing on the stacked overlapping slabs; the same jax array passed as two
pallas operands (qslabs is kslabs when kr == qr); grid-dimension pipelining.

This script runs ONE variant per invocation (a crash kills the process and
takes the axon worker down ~5 min, so the orchestrating shell loop retries):

    python tools/slab_repro.py <variant> [reps]

Variants:
    baseline        — the shipping slab call, exactly as dispatched
    distinct        — force kslabs to be a distinct buffer even when kr == qr
    buffered1       — pipeline_mode=pl.Buffered(1) on both slab operands
    arbitrary       — dimension_semantics marks all grid dims arbitrary
    serialk         — only the k grid dim arbitrary (q/batch parallel)

Prints PASS <variant> after `reps` successful jit executions of a
10-iteration scan each (matching the observed crash envelope).
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gan_inpainting_tpu.ops.pallas import fused_attention as fa


def _call_variant(variant, s2d_pad, bias, rnorm, *, scale, hs, ws, ksize,
                  rate, qr, kr):
    b = s2d_pad.shape[0]
    c = s2d_pad.shape[-1]
    lq = hs * ws
    nq, nk = hs // qr, hs // kr
    taps = 4 * rate * rate

    qslabs = fa._make_slabs(s2d_pad, qr)
    if variant == "distinct":
        kslabs = fa._make_slabs(s2d_pad, kr) + 0.0  # force a fresh buffer
    else:
        kslabs = fa._make_slabs(s2d_pad, kr) if kr != qr else qslabs

    pipeline_mode = None
    if variant == "buffered1":
        pipeline_mode = pl.Buffered(buffer_count=1)

    compiler_params = None
    if variant == "arbitrary":
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3)
    elif variant == "serialk":
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))

    def slab_spec(shape, index_map):
        if pipeline_mode is not None:
            return pl.BlockSpec(shape, index_map,
                                pipeline_mode=pipeline_mode,
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    kwargs = {}
    if compiler_params is not None:
        kwargs["compiler_params"] = compiler_params

    out = pl.pallas_call(
        functools.partial(
            fa._slab_kernel, scale=scale, nk=nk, qr=qr, kr=kr,
            ws=ws, c=c, ksize=ksize, rate=rate),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, kr * ws), lambda b_, iq, ik: (b_, 0, ik),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kr * ws), lambda b_, iq, ik: (b_, 0, ik),
                         memory_space=pltpu.VMEM),
            slab_spec((1, 1, rate * rate, qr + 2, ws + 2, c),
                      lambda b_, iq, ik: (b_, iq, 0, 0, 0, 0)),
            slab_spec((1, 1, rate * rate, kr + 2, ws + 2, c),
                      lambda b_, iq, ik: (b_, ik, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, taps, qr * ws, c),
            lambda b_, iq, ik: (b_, 0, iq, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, taps, lq, c), s2d_pad.dtype),
        scratch_shapes=[
            pltpu.VMEM((taps, qr * ws, c), jnp.float32),
            pltpu.VMEM((qr * ws, 128), jnp.float32),
            pltpu.VMEM((qr * ws, 128), jnp.float32),
        ],
        **kwargs,
    )(bias[:, None, :], rnorm[:, None, :], qslabs, kslabs)
    return out


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    # the 512² flagship shape: attention at 128² feature res, rate 2 →
    # hs = ws = 64, c = 192 — the config where resident maps blow VMEM
    bsz, h, w, c = 2, 128, 128, 192
    ksize, rate, scale = 3, 2, 10.0

    key = jax.random.key(0)
    feat = jax.random.normal(key, (bsz, h, w, c), jnp.bfloat16)
    hole = (jax.random.uniform(jax.random.fold_in(key, 1),
                               (bsz, h, w, 1)) < 0.3).astype(jnp.float32)

    s2d_pad, bias, rnorm, (hs, ws) = fa._prepare(feat, hole, ksize, rate)
    base = fa._lcm(128, ws) // ws
    qr = base
    kr = fa._slab_kr(hs, ws, c, rate, qr)
    assert kr is not None, "shape must route to the slab strategy"
    print(f"variant={variant} hs={hs} ws={ws} c={c} qr={qr} kr={kr}",
          flush=True)

    @jax.jit
    def run(s2d_pad, bias, rnorm, salt):
        # vary the input each rep (dedupe) and scan 10 iterations like the
        # envelope in which the round-1 crash was observed
        def body(acc, i):
            out = _call_variant(
                variant, s2d_pad + salt * i.astype(s2d_pad.dtype),
                bias, rnorm, scale=scale, hs=hs, ws=ws,
                ksize=ksize, rate=rate, qr=qr, kr=kr)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(10, dtype=jnp.int32))
        return acc

    for rep in range(reps):
        salt = jnp.bfloat16(1e-3 * (rep + 1))
        val = float(run(s2d_pad, bias, rnorm, salt))
        assert val == val, "NaN"
        print(f"rep {rep}: ok ({val:.3e})", flush=True)
    print(f"PASS {variant} ({reps} reps x 10 iters)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
