"""Irreps layout reshaping: multiplicity <-> tensor axis.

Reference: `/root/reference/src/jamun/e3tools/nn/_pack_unpack.py:55-99`
(`mul_to_axis`, `axis_to_mul`, module wrappers).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp

from jamun_tpu.ops.irreps import Irreps

__all__ = ["mul_to_axis", "axis_to_mul", "MulToAxis", "AxisToMul"]


def mul_to_axis(x: jnp.ndarray, irreps: Union[str, Irreps], factor: int) -> Tuple[jnp.ndarray, Irreps]:
    """[..., irreps.dim] -> [..., factor, (irreps/factor).dim]."""
    irreps = Irreps(irreps)
    batch_shape = x.shape[:-1]
    parts = []
    out_irreps = Irreps([(mi.mul // factor, mi.ir) for mi in irreps])
    for s, mi, fo in zip(irreps.slices(), irreps, out_irreps):
        if mi.mul % factor:
            raise ValueError(f"multiplicity {mi.mul} not divisible by {factor}")
        f = x[..., s].reshape(batch_shape + (factor, fo.mul * mi.ir.dim))
        parts.append(f)
    return jnp.concatenate(parts, axis=-1), out_irreps


def axis_to_mul(x: jnp.ndarray, irreps: Union[str, Irreps]) -> Tuple[jnp.ndarray, Irreps]:
    """[..., factor, irreps.dim] -> [..., (factor*irreps).dim]."""
    irreps = Irreps(irreps)
    factor = x.shape[-2]
    batch_shape = x.shape[:-2]
    parts = []
    for s, mi in zip(irreps.slices(), irreps):
        f = x[..., s].reshape(batch_shape + (factor * mi.mul * mi.ir.dim,))
        parts.append(f)
    out_irreps = Irreps([(factor * mi.mul, mi.ir) for mi in irreps])
    return jnp.concatenate(parts, axis=-1), out_irreps


class MulToAxis:
    def __init__(self, irreps_in: Union[str, Irreps], factor: int):
        self.irreps_in = Irreps(irreps_in)
        self.factor = factor
        self.irreps_out = Irreps([(mi.mul // factor, mi.ir) for mi in self.irreps_in])

    def __call__(self, x):
        return mul_to_axis(x, self.irreps_in, self.factor)[0]


class AxisToMul:
    def __init__(self, irreps_in: Union[str, Irreps], factor: int):
        self.irreps_in = Irreps(irreps_in)
        self.factor = factor
        self.irreps_out = Irreps([(mi.mul * factor, mi.ir) for mi in self.irreps_in])

    def __call__(self, x):
        return axis_to_mul(x, self.irreps_in)[0]
