"""LR schedule lambdas (multiplier on the base lr, LambdaLR semantics).

Reference: `/root/reference/src/jamun/lr_schedules/_lr_schedules.py:2-24`.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["linear", "linear_warmup_linear_decay", "linear_warmup_plateau"]


def linear(total_steps: int):
    def fn(step):
        return 1.0 - jnp.minimum(step, total_steps) / total_steps

    return fn


def linear_warmup_linear_decay(warmup_steps: int, total_steps: int):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(warmup_steps, 1)
        decay = (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1)
        return jnp.clip(jnp.where(step < warmup_steps, warm, decay), 0.0, 1.0)

    return fn


def linear_warmup_plateau(warmup_steps: int):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.clip(step / jnp.maximum(warmup_steps, 1), 0.0, 1.0)

    return fn
