#!/bin/bash
# Contextual-attention quality ablation on the textured synthetic family
# (VERDICT r4 #3 / weak #4): the framework's centerpiece kernel family had
# superb equivalence/speed evidence but ZERO measured quality contribution,
# because every at-scale run used the blobs family — smooth gradients that
# a conv stack can interpolate without copying anything. These are matched
# 12k-step reruns of the 256^2 stabilized recipe (EMA 0.999 + R1 0.1, baked
# into celebahq256_freeform) on data.synthetic_family=textured, identical
# except model.use_attention. If attention does NOT win here either, that
# measured close-out is the deliverable.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
# persistent compile cache: spares the repeat arm the ~5-10 min train-step
# compile if the axon remote-compile helper honors it (recorded either way)
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_compile_cache}

run () {
  name=$1; shift
  wd=/root/r5/tex_ablation/${name}
  mkdir -p "$wd"
  echo "=== ${name} ==="
  timeout 4800 python -m gan_inpainting_tpu train --config celebahq256_freeform \
    train.steps=12000 train.eval_every=500 train.checkpoint_every=4000 \
    data.synthetic_family=textured \
    train.workdir=${wd} "$@" > ${wd}/train.log 2>&1
  echo "exit=$?"; grep "eval@" ${wd}/train.log | tail -2
}

run attn   model.use_attention=true
run noattn model.use_attention=false
python tools/compare_runs.py /root/r5/tex_ablation/attn /root/r5/tex_ablation/noattn
echo "ATTENTION ABLATION DONE"
