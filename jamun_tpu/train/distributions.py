"""Noise-level (sigma) sampling distributions.

Reference: `/root/reference/src/jamun/distributions/_distributions.py` (torch
Distribution subclasses). Here each is a tiny dataclass with
`sample(key, shape=()) -> jnp.ndarray`, jit-safe.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "ConstantSigma",
    "UniformSigma",
    "ExponentialSigma",
    "ClippedLogNormalSigma",
    "UniformPlusNormal",
    "CategoricalValue",
    "WeightedMeasurement",
    "UniformMeasurement",
]


@dataclasses.dataclass(frozen=True)
class ConstantSigma:
    sigma: float = 0.04

    def sample(self, key, shape: Tuple[int, ...] = ()):
        return jnp.broadcast_to(jnp.asarray(self.sigma), shape)

    @property
    def mean(self):
        return self.sigma


@dataclasses.dataclass(frozen=True)
class UniformSigma:
    sigma_max: float
    sigma_min: float = 1e-4

    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, minval=self.sigma_min, maxval=self.sigma_max)


@dataclasses.dataclass(frozen=True)
class ExponentialSigma:
    """Log-uniform in [sigma_min, sigma_max]."""

    sigma_max: float = 50.0
    sigma_min: float = 1e-2
    epsilon: float = 1e-5

    def sample(self, key, shape=()):
        t = jax.random.uniform(key, shape, minval=self.epsilon, maxval=1.0)
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** t


@dataclasses.dataclass(frozen=True)
class ClippedLogNormalSigma:
    log_sigma_mean: float
    log_sigma_std: float
    sigma_max: float = 100.0

    def sample(self, key, shape=()):
        log_sigma = self.log_sigma_mean + self.log_sigma_std * jax.random.normal(key, shape)
        return jnp.clip(jnp.exp(log_sigma), max=self.sigma_max)


@dataclasses.dataclass(frozen=True)
class UniformPlusNormal:
    sigma: float
    sample_shape: Tuple[int, ...] = ()

    def sample(self, key, shape=()):
        k1, k2 = jax.random.split(key)
        full = tuple(shape) + tuple(self.sample_shape)
        x = jax.random.uniform(k1, full)
        return x + jax.random.normal(k2, full) * self.sigma


@dataclasses.dataclass(frozen=True)
class CategoricalValue:
    values: Tuple[float, ...]
    probs: Tuple[float, ...]

    def sample(self, key, shape=()):
        logits = jnp.log(jnp.asarray(self.probs) / np.sum(self.probs))
        idx = jax.random.categorical(key, logits, shape=shape)
        return jnp.asarray(self.values)[idx]

    @property
    def mean(self):
        p = np.asarray(self.probs) / np.sum(self.probs)
        return float(np.dot(np.asarray(self.values), p))


def WeightedMeasurement(sigma: float, probs: Sequence[float]) -> CategoricalValue:
    """sigma ladder sigma * k^{-1/2}, k = 1..m (multi-measurement training)."""
    m = len(probs)
    values = tuple(sigma * (k**-0.5) for k in range(1, m + 1))
    return CategoricalValue(values=values, probs=tuple(probs))


def UniformMeasurement(sigma: float, m: int) -> CategoricalValue:
    return WeightedMeasurement(sigma, [1.0] * m)
