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


def restore_state(cfg: Config, workdir: str | None = None, *,
                  best: bool = False, step: int | None = None,
                  ) -> GANTrainState:
    """Restore a full train state for eval/infer/tools.

    The restore template is built from the checkpoint's OWN saved config,
    not ``cfg`` — train-time CLI overrides of state-layout knobs
    (``train.g_ema_decay`` adds the EMA subtree, ``train.grad_clip`` /
    the LR-schedule knobs change the optimizer state tree) therefore do
    not have to be repeated on the eval/infer command line, where they
    would otherwise fail as an opaque orbax tree mismatch. ``cfg`` only
    locates the checkpoint (and is the config serving should keep using).
    """
    import jax.random

    from gan_inpainting_tpu.configs.base import config_from_dict
    from gan_inpainting_tpu.io.checkpoint import CheckpointManager

    subdir = "checkpoints_best" if best else "checkpoints"
    ckpt = CheckpointManager(workdir or cfg.train.workdir, subdir=subdir)
    if step is None:
        step = ckpt.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt.path}")
    saved_cfg = config_from_dict(ckpt.restore_config(step))
    template = create_state(saved_cfg, jax.random.key(0))
    return ckpt.restore(template, step)


def warm_start(state: GANTrainState, cfg: Config) -> GANTrainState:
    """Graft parameters from ``cfg.train.init_from`` into a fresh state.

    Fine-tuning semantics: G params (and, with ``train.init_from_d``, D
    params + spectral stats) come from the source checkpoint; step and both
    optimizer states stay fresh. The source may have a different optimizer /
    EMA layout — only the grafted subtrees must match, and a mismatch there
    (different architecture) fails loudly.
    """
    import pathlib

    from gan_inpainting_tpu.io.checkpoint import CheckpointManager

    subdir = ("checkpoints_best" if cfg.train.init_from_best
              else "checkpoints")
    if not (pathlib.Path(cfg.train.init_from) / subdir).is_dir():
        raise FileNotFoundError(
            f"train.init_from={cfg.train.init_from!r}: no {subdir}/ there "
            f"(expected another run's workdir)")
    src = CheckpointManager(cfg.train.init_from, subdir=subdir)
    raw = src.restore_raw()

    def graft(name: str, target, source):
        t_shapes = jax.tree.map(lambda x: (jnp.shape(x), jnp.result_type(x)),
                                target)
        s_shapes = jax.tree.map(lambda x: (jnp.shape(x), jnp.result_type(x)),
                                source)
        if t_shapes != s_shapes:
            raise ValueError(
                f"train.init_from={cfg.train.init_from!r}: {name} tree does "
                f"not match this config's architecture\n  want {t_shapes}\n"
                f"  got  {s_shapes}")
        return jax.tree.map(jnp.asarray, source)

    g_params = graft("g_params", state.g_params, raw["g_params"])
    updates = {"g_params": g_params}

    if jax.tree_util.tree_leaves(state.g_ema):
        src_ema = raw.get("g_ema")
        if src_ema is not None and jax.tree_util.tree_leaves(src_ema):
            updates["g_ema"] = graft("g_ema", state.g_ema, src_ema)
        else:  # source didn't track EMA: start it from the grafted params
            updates["g_ema"] = jax.tree.map(jnp.copy, g_params)

    if cfg.train.init_from_d:
        updates["d_params"] = graft("d_params", state.d_params,
                                    raw["d_params"])
        src_stats = raw.get("d_stats")
        if (jax.tree_util.tree_leaves(state.d_stats)
                and src_stats is not None
                and jax.tree_util.tree_leaves(src_stats)):
            updates["d_stats"] = graft("d_stats", state.d_stats, src_stats)

    return state.replace(**updates)


def make_lr_schedule(cfg: Config, base_lr: float):
    """Per-step learning rate for ``train.lr_schedule``.

    Returns the plain float when the config asks for constant-without-warmup
    so the default optimizer state tree (and therefore every pre-schedule
    checkpoint) is unchanged; otherwise an optax schedule callable.
    """
    tc = cfg.train
    if tc.lr_schedule == "constant" and tc.warmup_steps == 0:
        return base_lr
    horizon = (tc.lr_decay_steps or tc.steps) - tc.warmup_steps
    horizon = max(horizon, 1)
    end = base_lr * tc.lr_end_factor
    if tc.lr_schedule == "constant":
        sched = optax.constant_schedule(base_lr)
    elif tc.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(base_lr, horizon,
                                            alpha=tc.lr_end_factor)
    elif tc.lr_schedule == "linear":
        sched = optax.linear_schedule(base_lr, end, horizon)
    else:
        raise ValueError(
            f"train.lr_schedule={tc.lr_schedule!r}: want constant|cosine|linear")
    if tc.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base_lr, tc.warmup_steps)
        sched = optax.join_schedules([warmup, sched], [tc.warmup_steps])
    return sched


def make_optimizers(cfg: Config):
    def adam(base_lr):
        tx = optax.adam(make_lr_schedule(cfg, base_lr),
                        b1=cfg.train.beta1, b2=cfg.train.beta2)
        if cfg.train.grad_clip > 0:
            # prepended only when on, so the default optimizer state tree
            # (and old checkpoints) stay unchanged
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.train.grad_clip), tx)
        return tx

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
