"""Small equivariant wrapper modules.

Reference parity:
  - `Gated` / `GateWrapper` (`/root/reference/src/jamun/e3tools/nn/_gate.py:67-131`)
  - `LinearSelfInteraction` (`nn/_interaction.py:5`)
  - `LearnableSkipConnection` (`model/skip_connection.py:7`)
  - `GateActivation` (`model/gate_activation.py:6`)
  - `ExperimentalConv` (`nn/_conv.py:138`)
"""

from __future__ import annotations

from typing import Callable, Union

import flax.linen as nn
import jax.numpy as jnp

from jamun_tpu.ops.gate import Gate
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.linear import IrrepsLinear

__all__ = [
    "Gated",
    "GateWrapper",
    "LinearSelfInteraction",
    "LearnableSkipConnection",
    "GateActivation",
]


class Gated(nn.Module):
    """Wrap a layer factory with an equivariant gate: the layer outputs
    gate.irreps_in, the gate squashes to irreps_out."""

    layer: Callable[..., nn.Module]  # layer(irreps_in=..., irreps_out=...) -> Module
    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]

    @nn.compact
    def __call__(self, *args, **kwargs):
        gate = Gate(Irreps(self.irreps_out))
        f = self.layer(irreps_in=Irreps(self.irreps_in), irreps_out=gate.irreps_in)
        return gate(f(*args, **kwargs))


class GateWrapper(nn.Module):
    """Linear -> gate -> linear (`_gate.py:113-131`)."""

    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gate = Gate(Irreps(self.irreps_out))
        x = IrrepsLinear(Irreps(self.irreps_in), gate.irreps_in)(x)
        x = gate(x)
        return IrrepsLinear(gate.irreps_out, Irreps(self.irreps_out))(x)


class LinearSelfInteraction(nn.Module):
    """out = linear(f(x)) + linear_skip(x) (`nn/_interaction.py:5`)."""

    f: nn.Module
    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]

    @nn.compact
    def __call__(self, x, *args):
        skip = IrrepsLinear(Irreps(self.irreps_in), Irreps(self.irreps_out))(x)
        y = self.f(x, *args)
        y = IrrepsLinear(Irreps(self.irreps_out), Irreps(self.irreps_out))(y)
        return y + skip


class LearnableSkipConnection(nn.Module):
    """Sigmoid-gated learnable blend alpha*x1 + (1-alpha)*x2
    (`model/skip_connection.py:7`)."""

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        import jax

        alpha = self.param("alpha", nn.initializers.ones, ())
        w = jax.nn.sigmoid(alpha)
        return w * x1 + (1.0 - w) * x2


class GateActivation(nn.Module):
    """Standalone equivariant gate nonlinearity module
    (`model/gate_activation.py:6`)."""

    irreps_out: Union[str, Irreps]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Gate(Irreps(self.irreps_out))(x)
