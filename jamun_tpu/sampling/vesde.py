"""VE-SDE reverse-diffusion sampler (Song & Ermon 2021 discretization) as a
single `lax.scan`. Reference: `/root/reference/src/jamun/sampling/diffusion/_ve.py:156-212`."""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from jamun_tpu.ops.graph import GraphBatch

__all__ = ["VESDEReverseDiffusionSampler"]


@dataclasses.dataclass
class VESDEReverseDiffusionSampler:
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    N: int = 1000
    eps: float = 1e-5

    @property
    def sigma(self) -> float:
        # Sampler-driver interface: the init-noise level (annealing starts at
        # sigma_max regardless; y_init/v_init are ignored by this sampler)
        return self.sigma_max

    def sample(self, denoiser, params, init_graphs: GraphBatch, key, y_init=None, v_init=None):
        """Anneal from sigma_max noise down to clean samples.

        Returns dict with final "sample" plus y/xhat trajectories [N, G, n, 3].
        """
        mask = init_graphs.node_mask[..., None].astype(init_graphs.pos.dtype)
        key, ikey = jax.random.split(key)
        y = self.sigma_max * jax.random.normal(ikey, init_graphs.pos.shape) * mask

        log_smin, log_smax = math.log(self.sigma_min), math.log(self.sigma_max)
        sigmas = jnp.exp(jnp.linspace(log_smin, log_smax, self.N))
        ts = jnp.linspace(1.0, self.eps, self.N)
        steps = jnp.arange(self.N - 1, -1, -1)

        def body(carry, inp):
            y, key = carry
            i, t_i = inp
            sigma_i = sigmas[i]
            sigma_prev = jnp.where(i > 0, sigmas[jnp.maximum(i - 1, 0)], 0.0)
            sigma_t = self.sigma_min * (self.sigma_max / self.sigma_min) ** t_i
            s = denoiser.score(params, init_graphs.replace_pos(y), sigma_t)
            G2 = sigma_i**2 - sigma_prev**2  # forward diffusion increment
            key, zkey = jax.random.split(key)
            z = jax.random.normal(zkey, y.shape) * mask
            xhat_i = y + sigma_i**2 * s
            y_mean = y + G2 * s
            y = y_mean + jnp.sqrt(G2) * z
            return (y, key), (y, y_mean, xhat_i)

        (y, _), (y_traj, y_mean_traj, xhat_traj) = jax.lax.scan(body, (y, key), (steps, ts))
        return {
            "sample": y_mean_traj[-1],
            "y": y,
            "v": jnp.zeros_like(y),
            "y_traj": y_traj,
            "y_mean_traj": y_mean_traj,
            "xhat_traj": xhat_traj,
        }
