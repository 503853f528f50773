"""Scalar and equivariant MLP stacks.

`ScalarMLP` mirrors `/root/reference/src/jamun/e3tools/nn/_mlp.py:10-34` (the
radial network producing tensor-product weights) including torch's
Linear init (uniform +-1/sqrt(fan_in) for kernel and bias) so weight statistics
match the reference's training dynamics.

`EquivariantMLP` mirrors `nn/_mlp.py:37-114`: gated equivariant blocks followed
by a final linear.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from jamun_tpu.ops.gate import Gate
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.linear import IrrepsLinear
from jamun_tpu.ops.precision import matmul_precision

__all__ = ["ScalarMLP", "EquivariantMLPBlock", "EquivariantMLP", "torch_linear_kernel_init", "torch_linear_bias_init"]


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class ScalarMLP(nn.Module):
    out_features: int
    hidden_features: Sequence[int]
    activation: Callable = nn.silu
    dtype: Any = None  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        prec = matmul_precision(self.dtype)
        for h in self.hidden_features:
            x = nn.Dense(
                h,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(x.shape[-1]),
                dtype=self.dtype,
                precision=prec,
            )(x)
            x = self.activation(x)
        x = nn.Dense(
            self.out_features,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(x.shape[-1]),
            dtype=self.dtype,
            precision=prec,
        )(x)
        return x


class EquivariantMLPBlock(nn.Module):
    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gate = Gate(Irreps(self.irreps_out))
        x = IrrepsLinear(Irreps(self.irreps_in), gate.irreps_in)(x)
        if self.use_layer_norm:
            from jamun_tpu.ops.layer_norm import equivariant_layer_norm

            x = equivariant_layer_norm(x, gate.irreps_in)
        return gate(x)


class EquivariantMLP(nn.Module):
    irreps_in: Union[str, Irreps]
    irreps_out: Union[str, Irreps]
    irreps_hidden_list: Sequence[Union[str, Irreps]] = ()
    use_layer_norm: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        irreps = Irreps(self.irreps_in)
        for irreps_hidden in self.irreps_hidden_list:
            x = EquivariantMLPBlock(irreps, Irreps(irreps_hidden), self.use_layer_norm)(x)
            irreps = Gate(Irreps(irreps_hidden)).irreps_out
        return IrrepsLinear(irreps, Irreps(self.irreps_out))(x)
