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

`offload_chunk_steps` is the reference's `cpu_offload` analog
(`mcmc/functional/_splitting.py:168-170`): the walk is split into fixed-size
scan chunks and each chunk's saved frames are drained to HOST memory before
the next chunk runs, so a 10-20k-step trajectory never has to fit in HBM.
The chunk boundary is exact: BAOAB's carried score is a deterministic
function of y, so re-evaluating it at the chunk start reproduces the carried
value, and frames stay on the reference's absolute save grid.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

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
    offload_chunk_steps: int = 0  # >0: drain saved frames to host every N steps
    neighbor_skin: float = 0.0  # >0: Verlet-cached neighbor lists for the
    # sparse execution path — the walk carries a (cutoff + skin) capped list
    # and rebuilds it only when some atom moved > skin/2 (model-space nm),
    # instead of the O(N^2) build + top_k every score call. No-op when the
    # denoiser runs the dense path at this molecule size.

    def walk(self, denoiser, params, init_graphs: GraphBatch, key, y_init, v_init="gaussian"):
        mask = init_graphs.node_mask[..., None].astype(y_init.dtype)

        def score_fn(y):
            return denoiser.score(params, init_graphs.replace_pos(y), self.sigma)

        cached = None
        if self.neighbor_skin > 0 and hasattr(denoiser, "make_neighbor_cached_score"):
            cached = denoiser.make_neighbor_cached_score(
                params, init_graphs, self.sigma, self.neighbor_skin
            )
        y, v, y_traj, score_traj = self.mcmc(
            key, y_init, score_fn, v_init=v_init, mask=mask, cached_score=cached
        )
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

    def sample_chunked(self, denoiser, params, init_graphs: GraphBatch, key, y_init, v_init="gaussian"):
        """`sample` with host offload: runs the walk in `offload_chunk_steps`-
        update chunks, draining each chunk's trajectory to host numpy before
        the next chunk. Must be called OUTSIDE jit (each chunk is jitted).

        Frames land on the same absolute save grid as the single-scan walk
        (chunk-initial frames that duplicate the previous chunk's last save
        are dropped). Note: the per-chunk key split draws a different random
        realization than the unchunked walk, so chunked and unchunked runs
        agree in distribution and save grid but are not bitwise identical."""
        cfg = self.mcmc.config
        C = self.offload_chunk_steps
        total = max(cfg.steps - 1, 0)
        if C <= 0 or total <= C:
            out = self.sample(denoiser, params, init_graphs, key, y_init, v_init)
            return {
                k: (np.asarray(v) if k.endswith("_traj") else v) for k, v in out.items()
            }
        if cfg.burn_in_steps != 0:
            raise NotImplementedError("offload_chunk_steps requires burn_in_steps == 0")
        if C % cfg.save_every_n_steps != 0:
            raise ValueError("offload_chunk_steps must be a multiple of save_every_n_steps")

        n_chunks, rem = divmod(total, C)

        def sub(updates: int) -> "SingleMeasurementSampler":
            sub_cfg = dataclasses.replace(cfg, steps=updates + 1)
            return dataclasses.replace(
                self, mcmc=type(self.mcmc)(sub_cfg), offload_chunk_steps=0
            )

        main = sub(C)
        # String v_init ("gaussian"/"zero") is baked into the first chunk's
        # trace; an array v_init is passed as a traced argument via fn_cont,
        # so it is honored exactly like the unchunked walk's contract.
        if isinstance(v_init, str):
            fn_first = jax.jit(
                lambda p, y, k: main.walk_jump(denoiser, p, init_graphs, k, y, v_init)
            )
        fn_cont = jax.jit(
            lambda p, y, v, k: main.walk_jump(denoiser, p, init_graphs, k, y, v)
        )
        if rem:
            tail = sub(rem)
            fn_tail = jax.jit(
                lambda p, y, v, k: tail.walk_jump(denoiser, p, init_graphs, k, y, v)
            )

        y, v = y_init, v_init
        host: dict = {"y_traj": [], "score_traj": [], "xhat_traj": []}
        out = None
        for c in range(n_chunks + (1 if rem else 0)):
            key, ckey = jax.random.split(key)
            if c == 0 and isinstance(v, str):
                out = fn_first(params, y, ckey)
            elif c < n_chunks:
                out = fn_cont(params, y, v, ckey)
            else:
                out = fn_tail(params, y, v, ckey)
            y, v = out["y"], out["v"]
            start = 0 if c == 0 else 1  # drop the duplicated chunk-initial frame
            for k2 in host:
                host[k2].append(np.asarray(out[k2])[start:])
        result = {k2: np.concatenate(frames, axis=0) for k2, frames in host.items()}
        result.update(y=y, v=v, xhat=out["xhat"], sample=out["xhat"])
        return result
