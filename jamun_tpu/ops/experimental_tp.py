"""ExperimentalTensorProduct: unweighted full tensor product followed by an
externally-weighted linear.

Reference: `/root/reference/src/jamun/e3tools/nn/_tensor_product.py:61-91`
(`o3.FullTensorProductv2` + externally-weighted `o3.Linear`) — the
"compileable" TP variant.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import jax.numpy as jnp

from jamun_tpu.ops.cg import real_wigner_3j
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.precision import matmul_precision

__all__ = ["full_tensor_product", "ExperimentalTensorProduct", "external_linear"]


def full_tensor_product(
    x1: jnp.ndarray, x2: jnp.ndarray, irreps1: Irreps, irreps2: Irreps
) -> Tuple[jnp.ndarray, Irreps]:
    """Unweighted full TP: every (i1, i2) pair contributes mul1*mul2 copies of
    each allowed output irrep."""
    irreps1, irreps2 = Irreps(irreps1), Irreps(irreps2)
    sl1, sl2 = irreps1.slices(), irreps2.slices()
    batch_shape = x1.shape[:-1]
    blocks, out_irreps = [], []
    for i1, mi1 in enumerate(irreps1):
        f1 = x1[..., sl1[i1]].reshape(batch_shape + (mi1.mul, mi1.ir.dim))
        for i2, mi2 in enumerate(irreps2):
            f2 = x2[..., sl2[i2]].reshape(batch_shape + (mi2.mul, mi2.ir.dim))
            for ir3 in mi1.ir * mi2.ir:
                C = jnp.asarray(
                    real_wigner_3j(mi1.ir.l, mi2.ir.l, ir3.l) * math.sqrt(ir3.dim),
                    dtype=x1.dtype,
                )
                blk = jnp.einsum(
                    "...ui,...vj,ijk->...uvk", f1, f2, C,
                    precision=matmul_precision(x1.dtype),
                )
                blocks.append(blk.reshape(batch_shape + (mi1.mul * mi2.mul * ir3.dim,)))
                out_irreps.append((mi1.mul * mi2.mul, ir3))
    return jnp.concatenate(blocks, axis=-1), Irreps(out_irreps)


class _ExternalLinear:
    """o3.Linear with externally-supplied flat weights."""

    def __init__(self, irreps_in: Irreps, irreps_out: Irreps):
        self.irreps_in, self.irreps_out = Irreps(irreps_in), Irreps(irreps_out)
        self.paths: List[Tuple[int, int, slice, Tuple[int, int]]] = []
        offset = 0
        fan = [
            sum(mi.mul for mi in self.irreps_in if mi.ir == mo.ir) for mo in self.irreps_out
        ]
        for io, mo in enumerate(self.irreps_out):
            for ii, mi in enumerate(self.irreps_in):
                if mi.ir != mo.ir:
                    continue
                n = mi.mul * mo.mul
                self.paths.append((ii, io, slice(offset, offset + n), (mi.mul, mo.mul)))
                offset += n
        self.weight_numel = offset
        self._fan = fan

    def __call__(self, x: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
        sl_in, sl_out = self.irreps_in.slices(), self.irreps_out.slices()
        batch_shape = x.shape[:-1]
        out = [None] * len(self.irreps_out)
        for ii, io, wsl, (m_in, m_out) in self.paths:
            mi, mo = self.irreps_in[ii], self.irreps_out[io]
            f = x[..., sl_in[ii]].reshape(batch_shape + (m_in, mi.ir.dim))
            w = weights[..., wsl].reshape(weights.shape[:-1] + (m_in, m_out))
            blk = jnp.einsum(
                "...ui,...uw->...wi", f, w, precision=matmul_precision(x.dtype)
            ) / math.sqrt(max(self._fan[io], 1))
            out[io] = blk if out[io] is None else out[io] + blk
        flat = []
        for io, mo in enumerate(self.irreps_out):
            if out[io] is None:
                flat.append(jnp.zeros(batch_shape + (mo.dim,), x.dtype))
            else:
                flat.append(out[io].reshape(batch_shape + (mo.dim,)))
        return jnp.concatenate(flat, axis=-1)


def external_linear(irreps_in, irreps_out) -> _ExternalLinear:
    return _ExternalLinear(Irreps(irreps_in), Irreps(irreps_out))


class ExperimentalTensorProduct:
    """(x1, x2, weights) -> linear(full_tp(x1, x2), weights)."""

    def __init__(self, irreps_in1, irreps_in2, irreps_out):
        self.irreps_in1 = Irreps(irreps_in1)
        self.irreps_in2 = Irreps(irreps_in2)
        self.irreps_out = Irreps(irreps_out)
        # trace the output irreps of the full product once
        _, self._irreps_ftp = full_tensor_product(
            jnp.zeros((1, self.irreps_in1.dim)),
            jnp.zeros((1, self.irreps_in2.dim)),
            self.irreps_in1,
            self.irreps_in2,
        )
        self._lin = _ExternalLinear(self._irreps_ftp, self.irreps_out)
        self.weight_numel = self._lin.weight_numel

    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
        ftp, _ = full_tensor_product(x1, x2, self.irreps_in1, self.irreps_in2)
        return self._lin(ftp, weights)
