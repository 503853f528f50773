"""Equivariant layer norm (Equiformer fast layer norm parity).

l=0 blocks: standard layer norm over the multiplicity axis (no affine params).
l>0 blocks: divide by the RMS of per-copy L2 norms.

Reference: `/root/reference/src/jamun/e3tools/nn/_layer_norm.py:9-46`.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from jamun_tpu.ops.irreps import Irreps, unpack_irreps

__all__ = ["equivariant_layer_norm"]


def equivariant_layer_norm(x: jnp.ndarray, irreps: Union[str, Irreps], eps: float = 1e-6) -> jnp.ndarray:
    irreps = Irreps(irreps)
    fields = []
    batch_shape = x.shape[:-1]
    for mul, ir, field in unpack_irreps(x, irreps):
        if ir.l == 0 and ir.p == 1:
            mean = jnp.mean(field, axis=(-2, -1), keepdims=True)
            var = jnp.var(field, axis=(-2, -1), keepdims=True)
            field = (field - mean) / jnp.sqrt(var + eps)
            fields.append(field.reshape(batch_shape + (mul,)))
            continue
        norm2 = jnp.sum(field**2, axis=-1)  # [..., mul]
        inv_rms = (jnp.mean(norm2, axis=-1) + eps) ** -0.5  # [...]
        field = field * inv_rms[..., None, None]
        fields.append(field.reshape(batch_shape + (mul * ir.dim,)))
    return jnp.concatenate(fields, axis=-1)
