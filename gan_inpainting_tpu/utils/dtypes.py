"""Mixed-precision dtype policy.

TPU-first discipline (SURVEY.md §1b "core runtime"): parameters and optimizer
state live in float32; convolution / matmul compute runs in bfloat16 so the
MXU gets fed at full rate; losses, discriminator logits, and all loss
accumulation stay in float32 (GAN training is numerically fragile under bf16 —
SURVEY.md §7 "GAN training dynamics under bf16").

The reference (a PyTorch CPU/GPU trainer, BASELINE.json:5) runs in fp32
end-to-end; the policy object lets configs reproduce that exactly
(``DTypePolicy.full_f32()``) for parity checks.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Dtype assignments for one model/run."""

    param_dtype: jnp.dtype = jnp.float32   # parameter storage
    compute_dtype: jnp.dtype = jnp.bfloat16  # conv/matmul compute
    loss_dtype: jnp.dtype = jnp.float32    # losses, logits, reductions

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_loss(self, x):
        return x.astype(self.loss_dtype)

    @classmethod
    def full_f32(cls) -> "DTypePolicy":
        return cls(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                   loss_dtype=jnp.float32)

    @classmethod
    def bf16_compute(cls) -> "DTypePolicy":
        return cls()


def default_policy() -> DTypePolicy:
    return DTypePolicy.bf16_compute()
