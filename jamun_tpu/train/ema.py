"""Exponential moving average of parameters as a pure functional transform.

Replaces the reference's NeMo-vendored `EMAOptimizer` with CUDA side-streams
(`/root/reference/src/jamun/callbacks/_ema.py:17-347`): on TPU the fused
`ema = decay*ema + (1-decay)*p` update is just part of the jitted train step —
no streams, no threads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_init", "ema_update"]


def ema_init(params):
    return jax.tree.map(jnp.asarray, params)


def ema_update(ema_params, params, decay: float):
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)
