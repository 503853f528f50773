"""Irreps slicing/scaling helpers.

Reference: `/root/reference/src/jamun/e3tools/nn/_extract_irreps.py:5` and
`nn/_scaling.py:5`.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from jamun_tpu.ops.irreps import Irrep, Irreps
from jamun_tpu.ops.tensor_product import scale_irreps

__all__ = ["extract_irreps", "ExtractIrreps", "ScaleIrreps"]


def extract_irreps(x: jnp.ndarray, irreps_in: Union[str, Irreps], keep) -> jnp.ndarray:
    """Slice out the blocks whose irrep is in `keep` (order preserved)."""
    irreps_in = Irreps(irreps_in)
    keep = [Irrep.parse(k) for k in (keep if isinstance(keep, (list, tuple)) else [keep])]
    parts = [x[..., s] for s, mi in zip(irreps_in.slices(), irreps_in) if mi.ir in keep]
    if not parts:
        return x[..., :0]
    return jnp.concatenate(parts, axis=-1)


class ExtractIrreps:
    def __init__(self, irreps_in: Union[str, Irreps], irreps_extract):
        self.irreps_in = Irreps(irreps_in)
        keep = [Irrep.parse(k) for k in (
            irreps_extract if isinstance(irreps_extract, (list, tuple)) else [irreps_extract]
        )]
        self.keep = keep
        self.irreps_out = Irreps([mi for mi in self.irreps_in if mi.ir in keep])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return extract_irreps(x, self.irreps_in, self.keep)


class ScaleIrreps:
    """Per-irrep-copy scaling (elementwise TP with scalars)."""

    def __init__(self, irreps_in: Union[str, Irreps]):
        self.irreps_in = Irreps(irreps_in)
        self.irreps_out = self.irreps_in

    def __call__(self, x: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
        return scale_irreps(x, scales, self.irreps_in)
