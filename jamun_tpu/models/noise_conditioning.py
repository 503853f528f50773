"""Noise-conditional scaling and skip connections
(reference `/root/reference/src/jamun/model/noise_conditioning.py`)."""

from __future__ import annotations

from typing import Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.mlp import torch_linear_bias_init, torch_linear_kernel_init
from jamun_tpu.ops.tensor_product import scale_irreps, scale_irreps_transposed

__all__ = ["NoiseConditionalScaling", "NoiseConditionalSkipConnection", "NoiseEmbedding", "linear_embedding_transform"]


class _ScalePredictor(nn.Module):
    """Linear(1 -> n) -> [SELU -> Linear(n -> n)] x num_layers, with the final
    layer initialized to weight=0, bias=1 so the initial scaling is identity
    (`noise_conditioning.py:39-42`)."""

    n: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, c_noise: jnp.ndarray) -> jnp.ndarray:
        x = c_noise.reshape(-1, 1)
        x = nn.Dense(
            self.n, kernel_init=torch_linear_kernel_init, bias_init=torch_linear_bias_init(1)
        )(x)
        for i in range(self.num_layers):
            x = nn.activation.selu(x)
            last = i == self.num_layers - 1
            x = nn.Dense(
                self.n,
                kernel_init=nn.initializers.zeros if last else torch_linear_kernel_init,
                bias_init=nn.initializers.ones if last else torch_linear_bias_init(self.n),
            )(x)
        return x


class NoiseConditionalScaling(nn.Module):
    irreps: Union[str, Irreps]

    @nn.compact
    def __call__(self, x: jnp.ndarray, c_noise: jnp.ndarray, transposed: bool = False) -> jnp.ndarray:
        """`transposed`: x is in the kernel-native [..., C_rows, N] layout
        (zero-transpose layer chaining); params are identical either way."""
        irreps = Irreps(self.irreps)
        scales = _ScalePredictor(irreps.num_irreps)(c_noise)  # [1, num_irreps]
        if transposed:
            scales = scales.reshape((1,) * (x.ndim - 2) + (irreps.num_irreps,))
            return scale_irreps_transposed(x, scales, irreps)
        scales = scales.reshape((1,) * (x.ndim - 1) + (irreps.num_irreps,))
        return scale_irreps(x, scales, irreps)


class NoiseConditionalSkipConnection(nn.Module):
    """Sigmoid-gated convex blend x1*w + x2*(1-w), w = sigmoid(mlp(c_noise))
    per irrep copy (`noise_conditioning.py:57-74`)."""

    irreps: Union[str, Irreps]

    @nn.compact
    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, c_noise: jnp.ndarray, transposed: bool = False
    ) -> jnp.ndarray:
        irreps = Irreps(self.irreps)
        w = jax.nn.sigmoid(_ScalePredictor(irreps.num_irreps)(c_noise))
        if transposed:
            w = w.reshape((1,) * (x1.ndim - 2) + (irreps.num_irreps,))
            return scale_irreps_transposed(x1, w, irreps) + scale_irreps_transposed(
                x2, 1.0 - w, irreps
            )
        w = w.reshape((1,) * (x1.ndim - 1) + (irreps.num_irreps,))
        return scale_irreps(x1, w, irreps) + scale_irreps(x2, 1.0 - w, irreps)


class NoiseEmbedding(nn.Module):
    """MLP embedding of c_noise (`noise_conditioning.py:9-24`)."""

    output_dims: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, c_noise: jnp.ndarray) -> jnp.ndarray:
        x = c_noise.reshape(-1, 1)
        x = nn.Dense(
            self.output_dims, kernel_init=torch_linear_kernel_init, bias_init=torch_linear_bias_init(1)
        )(x)
        for _ in range(self.num_layers):
            x = nn.activation.selu(x)
            x = nn.Dense(
                self.output_dims,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(self.output_dims),
            )(x)
        return x


def linear_embedding_transform(sigma, scale: float = 1.0, shift: float = 0.0):
    """Trivial linear sigma-embedding transform (reference model/sigma_embedding.py:4)."""
    return scale * sigma + shift
