#!/bin/bash
# Random-VGG ablation at 256^2 (VERDICT r3 #7 / weak #6): matched 3k-step
# trainings quantifying what the perceptual/style terms contribute when the
# VGG is randomly initialized (this env has no downloadable weights).
# Arms: off | on with the shipped fixed-seed VGG | on with a different
# random seed (tests whether the effect is seed-robust, the closest
# available proxy for "would real features behave differently").
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
mkdir -p /root/r4/vgg_ablation

# synthesize the alternate-seed random VGG in the converted-weights format
# (on CPU — a deterministic init needs no TPU, and a second tunnel client
# blocks behind any in-flight TPU process for many minutes)
timeout 900 python - <<'EOF'
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from gan_inpainting_tpu.losses.perceptual import VGG16Features
import jax.numpy as jnp
model = VGG16Features(num_blocks=3)
params = model.init(jax.random.key(123),
                    jnp.zeros((1, 64, 64, 3), jnp.float32))["params"]
flat = {}
for name, leaf in params.items():
    flat[f"{name}/kernel"] = np.asarray(leaf["kernel"])
    flat[f"{name}/bias"] = np.asarray(leaf["bias"])
np.savez("/root/r4/vgg_ablation/vgg_seed123.npz", **flat)
print("wrote alt-seed VGG:", sorted(flat)[:2], "...")
EOF

run () {
  name=$1; shift
  wd=/root/r4/vgg_ablation/${name}
  mkdir -p "$wd"
  echo "=== ${name} ==="
  timeout 4800 python -m gan_inpainting_tpu train --config celebahq256_freeform \
    train.steps=3000 train.eval_every=500 train.checkpoint_every=3000 \
    train.g_ema_decay=0.999 loss.r1_gamma=0.1 \
    train.workdir=${wd} "$@" > ${wd}/train.log 2>&1
  echo "exit=$?"; grep "eval@" ${wd}/train.log | tail -2
}

run off
run rand7   loss.perceptual_weight=0.05 loss.style_weight=120
run rand123 loss.perceptual_weight=0.05 loss.style_weight=120 \
            loss.vgg_weights_path=/root/r4/vgg_ablation/vgg_seed123.npz
echo "VGG ABLATION DONE"
