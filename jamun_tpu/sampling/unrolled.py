"""Host-chunked BAOAB walk: jitted fully-unrolled step chunks driven by a host
loop — no device-side loop ops.

Rationale (this sandbox's tunneled TPU): the remote Mosaic compile service
compiles Pallas kernels inside `lax.scan`/`fori_loop` pathologically slowly
(minutes for a 2-iteration loop), while fully-unrolled kernel chains compile
in seconds. This walk mode unrolls `chunk_steps` BAOAB updates into one jit
program and loops over chunks on the host, enabling the fused conv kernel on
the hot path. Semantics match `sampling.mcmc.BAOAB` with save_every=1 (each
chunk re-evaluates the score at its first step: one extra forward per chunk).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List

import jax
import jax.numpy as jnp

from jamun_tpu.sampling.mcmc import MCMCConfig, make_processed_score_fn

__all__ = ["UnrolledBAOAB"]


@dataclasses.dataclass
class UnrolledBAOAB:
    config: MCMCConfig
    chunk_steps: int = 25

    def make_chunk_fn(self, score_fn: Callable, mask=None):
        cfg = self.config
        processed = make_processed_score_fn(score_fn, cfg.inverse_temperature, cfg.score_fn_clip)
        zeta2 = math.sqrt(1.0 - math.exp(-2.0 * cfg.friction))
        damp = math.exp(-cfg.friction)
        sqrt_u = math.sqrt(cfg.u)
        d2 = cfg.delta / 2.0

        @jax.jit
        def chunk(y, v, key):
            psi, _, _ = processed(y)
            frames = []
            for i in range(self.chunk_steps):
                key, sub = jax.random.split(key)
                v = v + cfg.u * d2 * psi  # B
                y = y + d2 * v  # A
                R = jax.random.normal(sub, y.shape, y.dtype)
                if mask is not None:
                    R = R * mask
                vhat = damp * v + zeta2 * sqrt_u * R  # O
                y = y + d2 * vhat  # A
                psi, _, _ = processed(y)
                v = vhat + d2 * psi  # B
                frames.append(y)
            return y, v, jnp.stack(frames)

        return chunk

    def __call__(self, key, y, score_fn, v_init="gaussian", mask=None):
        """Host-driven walk. Returns (y, v, y_traj, score_traj=None-like)."""
        cfg = self.config
        from jamun_tpu.sampling.mcmc import initialize_velocity

        key, vkey = jax.random.split(key)
        v = initialize_velocity(v_init, y, cfg.u, vkey)
        if mask is not None:
            v = v * mask

        chunk = self.make_chunk_fn(score_fn, mask)
        total = max(cfg.steps - 1, 0)
        n_chunks = total // self.chunk_steps
        frames: List[jnp.ndarray] = [y[None]]
        for _ in range(n_chunks):
            key, sub = jax.random.split(key)
            y, v, traj = chunk(y, v, sub)
            frames.append(traj)
        y_traj = jnp.concatenate(frames, axis=0)
        if cfg.save_every_n_steps > 1:
            y_traj = y_traj[:: cfg.save_every_n_steps]
        return y, v, y_traj, jnp.zeros_like(y_traj)
