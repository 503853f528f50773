"""Equivariant linear layer on packed irreps arrays (e3nn `o3.Linear` parity).

Each output block receives contributions from every input block with the same
irrep; per-path kernels are [mul_in, mul_out], init N(0, 1), scaled at apply
time by 1/sqrt(total fan-in multiplicity) ("element" path normalization).

Reference usage: self-interactions in `/root/reference/src/jamun/e3tools/nn/_interaction.py:5`,
MLP stacks in `nn/_mlp.py:37-114`.
"""

from __future__ import annotations

import math
from typing import Union

import flax.linen as nn
import jax.numpy as jnp

from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.precision import matmul_precision

__all__ = ["IrrepsLinear"]


class IrrepsLinear(nn.Module):
    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]
    biases: bool = False  # e3nn default: no biases

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        irreps_in, irreps_out = Irreps(self.irreps_in), Irreps(self.irreps_out)
        assert x.shape[-1] == irreps_in.dim, f"{x.shape} vs {irreps_in}"
        sl_in, sl_out = irreps_in.slices(), irreps_out.slices()
        batch_shape = x.shape[:-1]

        # fan-in per output block = sum of matching input multiplicities
        fan_in = [
            sum(mi_in.mul for mi_in in irreps_in if mi_in.ir == mi_out.ir) for mi_out in irreps_out
        ]

        out_blocks = []
        for i_out, mi_out in enumerate(irreps_out):
            acc = None
            for i_in, mi_in in enumerate(irreps_in):
                if mi_in.ir != mi_out.ir:
                    continue
                w = self.param(
                    f"w_{i_in}_{i_out}",
                    nn.initializers.normal(stddev=1.0),
                    (mi_in.mul, mi_out.mul),
                )
                f = x[..., sl_in[i_in]].reshape(batch_shape + (mi_in.mul, mi_in.ir.dim))
                blk = jnp.einsum(
                    "...ui,uw->...wi", f, w.astype(x.dtype),
                    precision=matmul_precision(x.dtype),
                )
                acc = blk if acc is None else acc + blk
            if acc is None:
                acc = jnp.zeros(batch_shape + (mi_out.mul, mi_out.ir.dim), dtype=x.dtype)
            else:
                acc = acc / math.sqrt(max(fan_in[i_out], 1))
            if self.biases and mi_out.ir.l == 0 and mi_out.ir.p == 1:
                b = self.param(f"b_{i_out}", nn.initializers.zeros, (mi_out.mul,))
                acc = acc + b.astype(acc.dtype)[..., :, None]
            out_blocks.append(acc.reshape(batch_shape + (mi_out.dim,)))
        return jnp.concatenate(out_blocks, axis=-1)
