"""The jitted alternating G/D train step (reference R13, SURVEY.md §3.1).

The whole per-batch body of the reference's training loop — D step on
(real, detached fake), then G step against the *updated* D with
adv + L1 (+ VGG perceptual/style) — compiles into ONE XLA program:

    train_step(state, batch, key) -> (state, metrics)

with the state buffers donated. Real and fake discriminator passes run as a
single batch-concatenated forward (one conv launch chain, better MXU shapes,
and spectral-norm stats update exactly once per D step). Under a sharded jit
the gradient all-reduce over the ``data`` mesh axis is emitted by GSPMD
inside the same program — there is no Python-visible communication
(SURVEY.md §2b).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from gan_inpainting_tpu.configs.base import Config
from gan_inpainting_tpu.data.pipeline import Batch
from gan_inpainting_tpu.losses import adversarial
from gan_inpainting_tpu.losses.perceptual import (
    init_vgg,
    perceptual_and_style_loss,
)
from gan_inpainting_tpu.losses.reconstruction import l1_loss, tv_loss
from gan_inpainting_tpu.models.discriminator import build_discriminator
from gan_inpainting_tpu.models.generator import build_generator
from gan_inpainting_tpu.train.state import GANTrainState, make_optimizers


def composite(fine, image, mask):
    """Paste the generated hole into the known image (SURVEY.md §3.2)."""
    mask = mask.astype(fine.dtype)
    return fine * mask + image.astype(fine.dtype) * (1.0 - mask)


def make_train_step(cfg: Config, *, donate: bool = True) -> Callable:
    """Build the jitted train step for a config."""
    generator = build_generator(cfg.model)
    discriminator = build_discriminator(cfg.model)
    g_tx, d_tx = make_optimizers(cfg)
    adv_kind = cfg.loss.adversarial

    use_vgg = cfg.loss.perceptual_weight > 0 or cfg.loss.style_weight > 0
    if use_vgg:
        if not cfg.loss.vgg_weights_path:
            import warnings

            warnings.warn(
                "perceptual/style loss enabled but loss.vgg_weights_path is "
                "empty: falling back to a fixed-seed randomly initialized "
                "VGG (test-only behavior). Convert real weights with "
                "tools/convert_vgg_weights.py and set the path for training.",
                stacklevel=2)
        vgg_model, vgg_params = init_vgg(cfg.loss.vgg_weights_path)

        def vgg_apply(params, x):
            return vgg_model.apply({"params": params}, x)

    def g_forward(g_params, batch: Batch):
        return generator.apply({"params": g_params}, batch.masked, batch.mask)

    def d_forward(d_params, d_stats, images, masks, update_stats):
        variables = {"params": d_params, "spectral": d_stats}
        if update_stats:
            logits, mutated = discriminator.apply(
                variables, images, masks, update_stats=True,
                mutable=["spectral"])
            return logits, mutated["spectral"]
        return discriminator.apply(variables, images, masks,
                                   update_stats=False), d_stats

    accum = cfg.train.grad_accum

    def g_loss_terms(g_params, b: Batch, d_params, d_stats):
        """G total loss + aux on one (micro-)batch against a frozen D."""
        gen = g_forward(g_params, b)
        comp = composite(gen.fine, b.image, b.mask)
        use_fm = cfg.loss.feature_match_weight > 0
        if use_fm:
            variables = {"params": d_params, "spectral": d_stats}
            logits, fake_feats = discriminator.apply(
                variables, comp, b.mask, update_stats=False,
                return_features=True)
            # real features are constant w.r.t. g_params — no stop_gradient
            # needed under the G-side jax.grad
            _, real_feats = discriminator.apply(
                variables, b.image, b.mask, update_stats=False,
                return_features=True)
        else:
            logits, _ = d_forward(d_params, d_stats, comp, b.mask,
                                  update_stats=False)
        adv = adversarial.g_loss(logits, adv_kind)

        rec = l1_loss(gen.fine, b.image, b.mask,
                      hole_weight=cfg.loss.l1_hole_weight,
                      valid_weight=cfg.loss.l1_valid_weight,
                      discount_gamma=cfg.loss.spatial_discount)
        if gen.coarse is not None:
            rec = rec + l1_loss(gen.coarse, b.image, b.mask,
                                hole_weight=cfg.loss.l1_hole_weight,
                                valid_weight=cfg.loss.l1_valid_weight,
                                discount_gamma=cfg.loss.spatial_discount)

        perc = style = jnp.asarray(0.0, jnp.float32)
        if use_vgg:
            perc, style = perceptual_and_style_loss(
                vgg_apply, vgg_params, comp, b.image)

        total = (cfg.loss.gan_weight * adv
                 + cfg.loss.l1_weight * rec
                 + cfg.loss.perceptual_weight * perc
                 + cfg.loss.style_weight * style)
        aux = {"g_adv": adv, "g_l1": rec, "g_perceptual": perc,
               "g_style": style}
        if cfg.loss.tv_weight > 0:
            tv = tv_loss(comp, b.mask)
            total = total + cfg.loss.tv_weight * tv
            aux["g_tv"] = tv
        if use_fm:
            fm = sum(jnp.mean(jnp.abs(ff.astype(jnp.float32)
                                      - rf.astype(jnp.float32)))
                     for ff, rf in zip(fake_feats, real_feats))
            fm = fm / len(fake_feats)
            total = total + cfg.loss.feature_match_weight * fm
            aux["g_fm"] = fm
        return total, aux

    def accum_step(state: GANTrainState, batch: Batch, key):
        """grad_accum > 1: scan micro-batches, average grads, update once.

        Identical math to the full-batch step for the mean-reduced losses
        (micro-means of equal slices average to the batch mean); the one
        semantic difference is spectral norm, whose power iteration
        advances once per micro-batch (documented on the config knob).
        Activation memory scales with batch/grad_accum.
        """
        del key
        if batch.image.shape[0] % accum:
            raise ValueError(
                f"train.grad_accum={accum} does not divide batch size "
                f"{batch.image.shape[0]}")

        def micro(tree):
            return jax.tree.map(
                lambda x: x.reshape((accum, x.shape[0] // accum)
                                    + x.shape[1:]), tree)

        mbs = micro(batch)

        # ---------------- D phase ----------------------------------------
        def d_scan(carry, mb: Batch):
            stats, gsum = carry
            with jax.named_scope("g_forward_detached"):
                out = g_forward(state.g_params, mb)
            fake = jax.lax.stop_gradient(
                composite(out.fine, mb.image, mb.mask))

            def d_loss_fn(d_params):
                both = jnp.concatenate([mb.image, fake], axis=0)
                masks2 = jnp.concatenate([mb.mask, mb.mask], axis=0)
                logits, new_stats = d_forward(d_params, stats, both, masks2,
                                              update_stats=True)
                real_logits, fake_logits = jnp.split(logits, 2, axis=0)
                loss = adversarial.d_loss(real_logits, fake_logits, adv_kind)
                r1 = jnp.asarray(0.0, jnp.float32)
                if cfg.loss.r1_gamma > 0:
                    def real_score(imgs):
                        lg, _ = d_forward(d_params, stats, imgs, mb.mask,
                                          update_stats=False)
                        return lg

                    k = max(cfg.loss.r1_interval, 1)
                    if k == 1:
                        r1 = adversarial.r1_penalty(real_score, mb.image)
                        loss = loss + cfg.loss.r1_gamma * r1
                    else:
                        # lazy R1 under accumulation: the whole optimizer
                        # step is regularized or not (state.step is constant
                        # across microbatches), mirroring the plain path
                        r1 = jax.lax.cond(
                            state.step % k == 0,
                            lambda: adversarial.r1_penalty(
                                real_score, mb.image),
                            lambda: jnp.asarray(0.0, jnp.float32))
                        loss = loss + (cfg.loss.r1_gamma * k) * r1
                return loss, (new_stats, jnp.mean(real_logits),
                              jnp.mean(fake_logits), r1)

            (loss, (new_stats, d_real, d_fake, r1)), grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params))
            gsum = jax.tree.map(jnp.add, gsum, grads)
            return (new_stats, gsum), (loss, d_real, d_fake, r1)

        zeros_d = jax.tree.map(jnp.zeros_like, state.d_params)
        with jax.named_scope("d_accum"):
            ((new_stats, d_gsum),
             (d_losses, d_reals, d_fakes, d_r1s)) = jax.lax.scan(
                d_scan, (state.d_stats, zeros_d), mbs)
        d_grads = jax.tree.map(lambda g: g / accum, d_gsum)
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt,
                                           state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- G phase (vs the updated D) ----------------------
        def g_scan(gsum, mb: Batch):
            def g_loss_fn(g_params):
                return g_loss_terms(g_params, mb, new_d_params, new_stats)

            (loss, aux), grads = (
                jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params))
            gsum = jax.tree.map(jnp.add, gsum, grads)
            return gsum, (loss, aux)

        zeros_g = jax.tree.map(jnp.zeros_like, state.g_params)
        with jax.named_scope("g_accum"):
            g_gsum, (g_losses, g_auxes) = jax.lax.scan(
                g_scan, zeros_g, mbs)
        g_grads = jax.tree.map(lambda g: g / accum, g_gsum)
        g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt,
                                           state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        ema_decay = cfg.train.g_ema_decay
        new_g_ema = state.g_ema
        if ema_decay > 0:
            with jax.named_scope("g_ema"):
                new_g_ema = jax.tree.map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    state.g_ema, new_g_params)

        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, g_opt=new_g_opt,
            d_params=new_d_params, d_opt=new_d_opt,
            d_stats=new_stats, g_ema=new_g_ema)
        metrics = {
            "d_loss": jnp.mean(d_losses),
            "g_loss": jnp.mean(g_losses),
            "d_real": jnp.mean(d_reals),
            "d_fake": jnp.mean(d_fakes),
            **{k: jnp.mean(v) for k, v in g_auxes.items()},
        }
        if cfg.loss.r1_gamma > 0:
            metrics["d_r1"] = jnp.mean(d_r1s)
        return new_state, metrics

    def step(state: GANTrainState, batch: Batch, key):
        del key  # reserved for latent-noise generators
        mask = batch.mask

        # ---------------- D step ------------------------------------------
        with jax.named_scope("g_forward_detached"):
            out = g_forward(state.g_params, batch)
        fake = composite(out.fine, batch.image, mask)
        fake = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            both = jnp.concatenate([batch.image, fake], axis=0)
            masks2 = jnp.concatenate([mask, mask], axis=0)
            logits, new_stats = d_forward(d_params, state.d_stats, both,
                                          masks2, update_stats=True)
            real_logits, fake_logits = jnp.split(logits, 2, axis=0)
            loss = adversarial.d_loss(real_logits, fake_logits, adv_kind)
            r1 = jnp.asarray(0.0, jnp.float32)
            if cfg.loss.r1_gamma > 0:
                def real_score(imgs):
                    lg, _ = d_forward(d_params, state.d_stats, imgs, mask,
                                      update_stats=False)
                    return lg

                k = max(cfg.loss.r1_interval, 1)
                if k == 1:
                    r1 = adversarial.r1_penalty(real_score, batch.image)
                    loss = loss + cfg.loss.r1_gamma * r1
                else:
                    # lazy R1: pay the grad-of-grad only on every k-th
                    # step, with γ·k keeping the expected pressure equal
                    # (StyleGAN2 lazy regularization). lax.cond executes
                    # one branch, so skipped steps skip the extra D pass.
                    r1 = jax.lax.cond(
                        state.step % k == 0,
                        lambda: adversarial.r1_penalty(
                            real_score, batch.image),
                        lambda: jnp.asarray(0.0, jnp.float32))
                    loss = loss + (cfg.loss.r1_gamma * k) * r1
            return loss, (new_stats, real_logits, fake_logits, r1)

        with jax.named_scope("d_step"):
            (d_loss_val,
             (new_stats, real_logits, fake_logits, d_r1)), d_grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params))
        d_updates, new_d_opt = d_tx.update(d_grads, state.d_opt,
                                           state.d_params)
        new_d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- G step (vs the updated D) -----------------------
        def g_loss_fn(g_params):
            return g_loss_terms(g_params, batch, new_d_params, new_stats)

        with jax.named_scope("g_step"):
            (g_loss_val, g_aux), g_grads = (
                jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params))
        g_updates, new_g_opt = g_tx.update(g_grads, state.g_opt,
                                           state.g_params)
        new_g_params = optax.apply_updates(state.g_params, g_updates)

        ema_decay = cfg.train.g_ema_decay
        new_g_ema = state.g_ema
        if ema_decay > 0:
            with jax.named_scope("g_ema"):
                new_g_ema = jax.tree.map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    state.g_ema, new_g_params)

        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, g_opt=new_g_opt,
            d_params=new_d_params, d_opt=new_d_opt,
            d_stats=new_stats, g_ema=new_g_ema)
        metrics = {
            "d_loss": d_loss_val,
            "g_loss": g_loss_val,
            "d_real": jnp.mean(real_logits),
            "d_fake": jnp.mean(fake_logits),
            **g_aux,
        }
        if cfg.loss.r1_gamma > 0:
            metrics["d_r1"] = d_r1
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    fn = accum_step if accum > 1 else step
    return jax.jit(fn, donate_argnums=donate_argnums)
