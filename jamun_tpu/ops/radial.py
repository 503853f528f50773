"""Radial basis embedding (e3nn `soft_one_hot_linspace` parity).

Reference: gaussian basis with cutoff=True at
`/root/reference/src/jamun/model/arch/e3conv.py:118-127`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["soft_one_hot_linspace"]


def soft_one_hot_linspace(
    x: jnp.ndarray,
    start: float,
    end,
    number: int,
    basis: str = "gaussian",
    cutoff: bool = True,
) -> jnp.ndarray:
    """x: [...] -> [..., number]. With cutoff=True the grid excludes the
    interval endpoints (e3nn semantics), so the basis decays toward both ends."""
    if cutoff:
        # linspace(start, end, number + 2)[1:-1] with possibly-traced `end`.
        i = jnp.arange(1, number + 1, dtype=x.dtype)
        values = start + (end - start) * i / (number + 1)
        step = (end - start) / (number + 1)
    else:
        i = jnp.arange(0, number, dtype=x.dtype)
        values = start + (end - start) * i / max(number - 1, 1)
        step = (end - start) / max(number - 1, 1)

    diff = (x[..., None] - values) / step
    if basis == "gaussian":
        return jnp.exp(-(diff**2)) / 1.12
    if basis == "cosine":
        return jnp.where(jnp.abs(diff) < 1.0, jnp.cos(np.pi / 2 * diff), 0.0)
    raise ValueError(f"unsupported basis {basis!r}")
