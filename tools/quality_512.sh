#!/bin/bash
# 512^2 at-scale quality rerun (VERDICT r3 #3): places512_deepfill, the r3
# qual512 recipe — EMA 0.999 now baked into the named config — producing
# in-repo reproducible artifacts (curves + best-generator npz) via
# tools/pin_artifacts.py afterwards.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p /root/r4/qual512
timeout 10800 python -m gan_inpainting_tpu train --config places512_deepfill \
  train.steps=12000 train.eval_every=500 train.checkpoint_every=1000 \
  train.workdir=/root/r4/qual512 > /root/r4/qual512/train.log 2>&1
echo "exit=$?"
grep "eval@" /root/r4/qual512/train.log | tail -3
echo "QUAL512 DONE"
