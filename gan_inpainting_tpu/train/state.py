"""Train state: both networks, both optimizers, spectral-norm stats, step.

One pytree carries everything the jitted train step mutates, so the step is
``state, batch, key -> state, metrics`` with donated buffers (SURVEY.md §3.1).
The spectral-norm power-iteration vectors are explicit state here, not Python
side effects (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gan_inpainting_tpu.configs.base import Config
from gan_inpainting_tpu.models.discriminator import build_discriminator
from gan_inpainting_tpu.models.generator import build_generator


class GANTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_opt: Any
    d_params: Any
    d_opt: Any
    d_stats: Any        # spectral-norm collection ({} when SN is off)
    g_ema: Any = None   # EMA generator params ({} when g_ema_decay == 0)


def ema_generator_params(state: GANTrainState):
    """The params eval/serving should use: EMA when tracked, else raw."""
    ema = getattr(state, "g_ema", None)
    if ema is None or not jax.tree_util.tree_leaves(ema):
        return state.g_params
    return ema


def make_optimizers(cfg: Config):
    def adam(lr):
        return optax.adam(lr, b1=cfg.train.beta1, b2=cfg.train.beta2)

    return adam(cfg.train.g_lr), adam(cfg.train.d_lr)


def create_state(cfg: Config, key) -> GANTrainState:
    """Initialize G, D, and optimizer states for a config."""
    generator = build_generator(cfg.model)
    discriminator = build_discriminator(cfg.model)
    g_tx, d_tx = make_optimizers(cfg)

    size = cfg.data.image_size
    dummy_img = jnp.zeros((1, size, size, 3), jnp.float32)
    dummy_mask = jnp.zeros((1, size, size, 1), jnp.float32)

    kg, kd = jax.random.split(key)
    g_vars = generator.init(kg, dummy_img, dummy_mask)
    d_vars = discriminator.init(kd, dummy_img, dummy_mask)

    g_params = g_vars["params"]
    d_params = d_vars["params"]
    d_stats = d_vars.get("spectral", {})

    # EMA starts as a copy of the raw params (no bias correction needed)
    g_ema = (jax.tree.map(jnp.copy, g_params)
             if cfg.train.g_ema_decay > 0 else {})

    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_opt=g_tx.init(g_params),
        d_params=d_params,
        d_opt=d_tx.init(d_params),
        d_stats=d_stats,
        g_ema=g_ema,
    )
