"""Equivariant gate nonlinearity (e3nn `nn.Gate` parity).

Input layout: scalars ++ gates ++ gated, where
  - scalars: all l=0 blocks of the target irreps, activated directly
    (LeakyReLU for even parity, tanh for odd),
  - gates: one extra 0e scalar per gated irrep copy, squashed by sigmoid,
  - gated: all l>0 blocks, multiplied by their gate scalar.

Reference: `/root/reference/src/jamun/e3tools/nn/_gate.py:10-64`.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.tensor_product import scale_irreps

__all__ = ["Gate"]


def _leaky_relu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.01)


class Gate:
    """Stateless callable built from the target output irreps.

    act / act_gates: parity->activation maps (reference `_gate.py:36-48`;
    defaults LeakyReLU/tanh for scalars, sigmoid/tanh for gates)."""

    def __init__(self, irreps_out: Union[str, Irreps], act=None, act_gates=None):
        irreps_out = Irreps(irreps_out)
        self.act = act or {1: _leaky_relu, -1: jnp.tanh}
        self.act_gates = act_gates or {1: jax.nn.sigmoid, -1: jnp.tanh}
        self.irreps_scalars = Irreps([mi for mi in irreps_out if mi.ir.l == 0])
        self.irreps_gated = Irreps([mi for mi in irreps_out if mi.ir.l > 0])
        self.irreps_gates = Irreps([(mi.mul, "0e") for mi in self.irreps_gated])
        self.irreps_in = self.irreps_scalars + self.irreps_gates + self.irreps_gated
        self.irreps_out = (self.irreps_scalars + self.irreps_gated).simplify()

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_s = self.irreps_scalars.dim
        d_g = self.irreps_gates.dim
        scalars = x[..., :d_s]
        gates = x[..., d_s : d_s + d_g]
        gated = x[..., d_s + d_g :]

        out = []
        ix = 0
        for mi in self.irreps_scalars:
            out.append(self.act[mi.ir.p](scalars[..., ix : ix + mi.dim]))
            ix += mi.dim
        if d_g:
            # gates are 0e scalars: even-parity gate activation applies
            gated = scale_irreps(gated, self.act_gates[1](gates), self.irreps_gated)
        out.append(gated)
        return jnp.concatenate(out, axis=-1)
