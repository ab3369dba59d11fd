"""Adversarial losses (reference R10): hinge, BCE (vanilla GAN), LSGAN.

All operate on PatchGAN logit maps of any shape and reduce with a full mean;
everything in float32 (SURVEY.md §7 bf16 discipline).

* hinge — SN-PatchGAN objective (DeepFill v2):
    L_D = E[relu(1 - D(x))] + E[relu(1 + D(G))];  L_G = -E[D(G)]
* bce   — original GAN with logits (reference's 128² default per
  BASELINE.json:5 "hinge/BCE").
* lsgan — least-squares GAN (Mao et al.), included for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

KINDS = ("hinge", "bce", "lsgan")


def _bce_with_logits(logits, target: float):
    # mean of softplus-form BCE: -t*log σ(x) - (1-t)*log(1-σ(x))
    return jnp.mean(jax.nn.softplus(logits) - target * logits)


def d_loss(real_logits, fake_logits, kind: str = "hinge"):
    real = real_logits.astype(jnp.float32)
    fake = fake_logits.astype(jnp.float32)
    if kind == "hinge":
        return (jnp.mean(jax.nn.relu(1.0 - real))
                + jnp.mean(jax.nn.relu(1.0 + fake)))
    if kind == "bce":
        return _bce_with_logits(real, 1.0) + _bce_with_logits(fake, 0.0)
    if kind == "lsgan":
        return 0.5 * (jnp.mean((real - 1.0) ** 2) + jnp.mean(fake ** 2))
    raise ValueError(f"unknown adversarial kind {kind!r}")


def r1_penalty(score_fn, images):
    """0.5 · E_batch[ ‖∇_x score(x)‖² ] — the R1 regularizer.

    Mescheder et al. 2018 ("Which training methods for GANs do actually
    converge?"): penalize the discriminator's gradient on REAL data only.
    Stabilizes the alternating game (used by StyleGAN-family trainers);
    optional here via ``loss.r1_gamma`` (the caller multiplies by γ, so
    the total term is γ/2 · E[‖∇‖²]).

    ``score_fn`` maps an image batch (B, H, W, C) to per-sample logits
    (any trailing shape). Each sample's logits depend only on that sample
    (per-image discriminator), so grad-of-sum rows are per-sample
    gradients. Differentiable — contributing to the D loss makes the
    update second-order through the D forward, which JAX handles.
    """
    imgs = images.astype(jnp.float32)
    grads = jax.grad(lambda x: jnp.sum(score_fn(x).astype(jnp.float32)))(imgs)
    grads = grads.astype(jnp.float32)
    per_sample = jnp.sum(grads * grads, axis=tuple(range(1, grads.ndim)))
    return 0.5 * jnp.mean(per_sample)


def g_loss(fake_logits, kind: str = "hinge"):
    fake = fake_logits.astype(jnp.float32)
    if kind == "hinge":
        return -jnp.mean(fake)
    if kind == "bce":
        return _bce_with_logits(fake, 1.0)
    if kind == "lsgan":
        return 0.5 * jnp.mean((fake - 1.0) ** 2)
    raise ValueError(f"unknown adversarial kind {kind!r}")
