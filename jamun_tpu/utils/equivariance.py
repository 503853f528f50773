"""Runtime equivariance self-test.

Reference parity: `E3Conv.test_equivariance` / `TestEquivariance`
(`/root/reference/src/jamun/model/arch/e3conv.py:93-107`,
`ophiuchus.py:89-110`) run `e3nn.util.test.assert_equivariant` on the first
forward. Here it is an explicit check callable on any arch apply function.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from jamun_tpu.ops.graph import GraphBatch
from jamun_tpu.ops.wigner import random_rotation

__all__ = ["assert_arch_equivariant", "equivariance_error"]


def equivariance_error(
    apply_fn: Callable[[GraphBatch], jnp.ndarray],
    batch: GraphBatch,
    seed: int = 0,
    translation: float = 0.3,
) -> float:
    """Max deviation of apply_fn from E(3)-equivariance (rotation + translation
    invariance of the per-atom vector output, (y,z,x) irrep layout)."""
    rng = np.random.default_rng(seed)
    R = random_rotation(rng).astype(np.float32)
    perm = [1, 2, 0]
    D1 = jnp.asarray(R[np.ix_(perm, perm)])

    out = apply_fn(batch)
    if float(jnp.max(jnp.abs(out))) == 0.0:
        # zero output (e.g. zero-initialized output gain) makes the check
        # vacuous — surface that instead of silently passing
        raise ValueError(
            "equivariance check is vacuous: apply_fn returned all zeros "
            "(perturb zero-initialized output gains before testing)"
        )
    batch_rot = batch.replace(
        pos=jnp.einsum("ij,gnj->gni", jnp.asarray(R), batch.pos) + translation
    )
    out_rot = apply_fn(batch_rot)
    return float(jnp.max(jnp.abs(out_rot - out @ D1.T)))


def assert_arch_equivariant(apply_fn, batch: GraphBatch, atol: float = 1e-3, seed: int = 0):
    err = equivariance_error(apply_fn, batch, seed=seed)
    if err > atol:
        raise AssertionError(f"architecture is not equivariant: max error {err:.2e} > {atol}")
    return err
