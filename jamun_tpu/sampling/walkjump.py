"""Walk-jump sampling: Langevin walk in noised space + denoiser jump.

Reference: `/root/reference/src/jamun/sampling/walkjump/_single_measurement.py:8-89`.
The jump loop there runs one denoiser forward per saved frame in Python; here
it is a `lax.map` over frame chunks folded into the batch axis — or, with
`fused_jump` (default, BAOAB only), skipped entirely: the walk already
evaluates the raw score at every saved state, and by the denoiser identity
score(y) = (xhat(y) - y) / sigma^2 the jump is exactly
xhat = y + sigma^2 * score — the trajectory jump costs ZERO extra denoiser
forwards. (ABOBA carries the midpoint score, so it falls back to re-running
the denoiser.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from jamun_tpu.ops.graph import GraphBatch
from jamun_tpu.sampling.mcmc import BAOAB, _SplittingSampler

__all__ = ["SingleMeasurementSampler"]


@dataclasses.dataclass
class SingleMeasurementSampler:
    """Single-measurement walk-jump sampler."""

    mcmc: _SplittingSampler
    sigma: float
    jump_chunk_size: int = 0  # 0 = jump all frames at once
    fused_jump: bool = True  # reuse walk scores for the trajectory jump (BAOAB)

    def walk(self, denoiser, params, init_graphs: GraphBatch, key, y_init, v_init="gaussian"):
        mask = init_graphs.node_mask[..., None].astype(y_init.dtype)

        def score_fn(y):
            return denoiser.score(params, init_graphs.replace_pos(y), self.sigma)

        y, v, y_traj, score_traj = self.mcmc(key, y_init, score_fn, v_init=v_init, mask=mask)
        return {"y": y, "v": v, "y_traj": y_traj, "score_traj": score_traj}

    def walk_jump(self, denoiser, params, init_graphs: GraphBatch, key, y_init, v_init="gaussian"):
        out = self.walk(denoiser, params, init_graphs, key, y_init, v_init)
        xhat = denoiser.xhat(params, init_graphs.replace_pos(out["y"]), self.sigma)

        y_traj = out["y_traj"]  # [F, G, N, 3]

        def jump(y_frame):
            return denoiser.xhat(params, init_graphs.replace_pos(y_frame), self.sigma)

        if y_traj.shape[0] == 0:
            xhat_traj = jnp.zeros_like(y_traj)
        elif self.fused_jump and isinstance(self.mcmc, BAOAB):
            # zero-cost jump: the walk's saved raw score is at the saved state
            xhat_traj = y_traj + (self.sigma**2) * out["score_traj"]
        elif self.jump_chunk_size and self.jump_chunk_size < y_traj.shape[0]:
            xhat_traj = jax.lax.map(jump, y_traj, batch_size=self.jump_chunk_size)
        else:
            xhat_traj = jax.vmap(jump)(y_traj)

        return {**out, "xhat": xhat, "xhat_traj": xhat_traj}

    def sample(self, denoiser, params, init_graphs: GraphBatch, key, y_init, v_init="gaussian"):
        out = self.walk_jump(denoiser, params, init_graphs, key, y_init, v_init)
        out["sample"] = out["xhat"]
        return out
