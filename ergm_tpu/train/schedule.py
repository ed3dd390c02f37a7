"""Learning-rate schedule: polynomial decay with linear warmup, power=2.

Matches HF ``get_polynomial_decay_schedule_with_warmup`` as configured
by the reference (src/main.py:93-95: warmup_steps, total steps, power=2,
default lr_end=1e-7):

    step < warmup:  lr * step / warmup
    step >= total:  lr_end
    else:           lr_end + (lr - lr_end) * (1 - (step-warmup)/(total-warmup))**power
"""

from __future__ import annotations

import jax.numpy as jnp


def polynomial_warmup_schedule(
    lr: float,
    warmup_steps: int,
    total_steps: int,
    power: float = 2.0,
    lr_end: float = 1e-7,
):
    warmup_steps = max(int(warmup_steps), 0)
    total_steps = max(int(total_steps), warmup_steps + 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / jnp.maximum(warmup_steps, 1)
        frac = 1.0 - (step - warmup_steps) / (total_steps - warmup_steps)
        decay = lr_end + (lr - lr_end) * jnp.clip(frac, 0.0, 1.0) ** power
        out = jnp.where(step < warmup_steps, warm, decay)
        return jnp.where(step >= total_steps, lr_end, out)

    return schedule
