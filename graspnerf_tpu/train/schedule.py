"""Learning-rate schedules (ref: src/nr/train/lr_common_manager.py:3-57)."""
from __future__ import annotations

import jax.numpy as jnp


def exp_decay_lr(lr_init: float = 1e-4, decay_step: int = 100_000,
                 decay_rate: float = 0.5, lr_min: float = 1e-5):
    """Staircase exponential decay with a floor (the reference's ExpDecayLR)."""
    def schedule(step):
        lr = lr_init * decay_rate ** (step // decay_step)
        return jnp.maximum(lr, lr_min)
    return schedule


def warmup_exp_decay_lr(warmup_steps: int = 1000, **kw):
    base = exp_decay_lr(**kw)

    def schedule(step):
        warm = kw.get("lr_init", 1e-4) * (step + 1) / warmup_steps
        return jnp.where(step < warmup_steps, warm, base(step))
    return schedule
