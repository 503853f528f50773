"""Sampling driver: host loop over sample batches around one jitted walk-jump
program per batch, with chain continuation and observer callbacks.

Reference: `/root/reference/src/jamun/sampling/_sampler.py:15-99` (a
Lightning-Fabric loop there). Multi-device fan-out is embarrassingly parallel:
shard chains over the mesh with `jamun_tpu.parallel` (each device walks its own
chains; zero collective traffic during the walk, matching the reference's
rank-independent chains, `cmdline/sample.py:86-88`).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jamun_tpu.ops.graph import GraphBatch

__all__ = ["Sampler", "unbatch_samples"]


def unbatch_samples(samples: Dict[str, jnp.ndarray], init_graphs: GraphBatch) -> List[Dict[str, Any]]:
    """Split stacked device outputs into per-graph host dicts.

    Trajectory arrays [frames, G, N, 3] become per-graph [atoms, frames, 3]
    (reference layout, `utils/sampling_wrapper.py:49-83`); final-state arrays
    [G, N, 3] become [atoms, 3]. Padding atoms are stripped.
    """
    node_mask = np.asarray(init_graphs.node_mask)
    out: List[Dict[str, Any]] = []
    host = {k: np.asarray(v) for k, v in samples.items() if hasattr(v, "shape")}
    G = node_mask.shape[0]
    graph_mask = np.asarray(init_graphs.graph_mask)
    for g in range(G):
        if not graph_mask[g]:
            continue
        n = int(node_mask[g].sum())
        entry: Dict[str, Any] = {"graph_index": g, "num_atoms": n}
        for key, value in host.items():
            if value.ndim == 4 and value.shape[1] == G:  # [frames, G, N, 3]
                entry[key] = np.transpose(value[:, g, :n], (1, 0, 2))
            elif value.ndim == 3 and value.shape[0] == G:  # [G, N, 3]
                entry[key] = value[g, :n]
        out.append(entry)
    return out


@dataclasses.dataclass
class Sampler:
    """Runs `num_batches` sampling rounds, optionally continuing the chain.

    With `num_devices` > 1 (or a prebuilt `mesh`) the chain/graph axis of the
    batch is sharded over the mesh "data" axis — each device walks its own
    chains with zero collective traffic (the reference's rank-independent
    Fabric chains, `cmdline/sample.py:86-88`), and the compiler partitions the
    jitted walk program SPMD."""

    callbacks: Sequence[Any] = ()
    donate_state: bool = True
    num_devices: Optional[int] = None
    mesh: Any = None
    atom_sharded: bool = False  # shard each molecule's ATOM axis over the
    # mesh (jamun_tpu/parallel/atom_sharded.py) instead of sharding chains —
    # the large-molecule mode: every chain's walk runs the arch forward with
    # per-layer feature halos over ICI (SURVEY 5.7)

    def _call(self, hook: str, **kwargs):
        for cb in self.callbacks:
            fn = getattr(cb, hook, None)
            if fn is not None:
                fn(**kwargs)

    def sample(
        self,
        denoiser,
        params,
        batch_sampler,
        num_batches: int,
        init_graphs: GraphBatch,
        continue_chain: bool = False,
        seed: int = 0,
    ) -> List[List[Dict[str, Any]]]:
        sigma = batch_sampler.sigma
        key = jax.random.PRNGKey(seed)

        if self.atom_sharded:
            from jamun_tpu.parallel.atom_sharded import (
                denoiser_with_atom_sharding,
                pad_atoms_to_multiple,
                prepare_atom_sharded_batch,
            )
            from jamun_tpu.parallel.mesh import make_mesh

            mesh = self.mesh or make_mesh(self.num_devices)
            denoiser = denoiser_with_atom_sharding(denoiser, mesh)
            init_graphs = prepare_atom_sharded_batch(
                pad_atoms_to_multiple(init_graphs, mesh.devices.size), mesh
            )
        elif self.mesh is not None or (self.num_devices or 1) > 1:
            from jamun_tpu.parallel.mesh import make_mesh, pad_batch_to_multiple, shard_batch

            mesh = self.mesh or make_mesh(self.num_devices)
            init_graphs = pad_batch_to_multiple(init_graphs, mesh.devices.size)
            init_graphs = shard_batch(init_graphs, mesh)

        mask = init_graphs.node_mask[..., None].astype(init_graphs.pos.dtype)

        key, nkey = jax.random.split(key)
        y_init = init_graphs.pos + sigma * jax.random.normal(nkey, init_graphs.pos.shape) * mask
        v_init: Any = "gaussian"

        def make_batch_fns(sampler_obj):
            if getattr(sampler_obj, "offload_chunk_steps", 0) > 0:
                # host-offload mode: the chunk loop runs OUTSIDE jit (each
                # chunk is jitted internally; frames drain to host numpy)
                return (
                    lambda p, y, k: sampler_obj.sample_chunked(
                        denoiser, p, init_graphs, k, y, "gaussian"
                    ),
                    lambda p, y, v, k: sampler_obj.sample_chunked(
                        denoiser, p, init_graphs, k, y, v
                    ),
                )

            def _one_batch(params, y, v, key):
                return sampler_obj.sample(denoiser, params, init_graphs, key, y, v_init=v)

            return (
                jax.jit(lambda p, y, k: _one_batch(p, y, "gaussian", k)),
                jax.jit(_one_batch),
            )

        one_batch_gaussian_v, one_batch_carried_v = make_batch_fns(batch_sampler)
        has_param_callbacks = any(hasattr(cb, "update_sampler") for cb in self.callbacks)

        # sparse-cap telemetry: when the arch runs the capped-K neighbor path
        # (the only path that drops edges), report per batch how many
        # in-cutoff edges the cap dropped at the chain's end positions, so
        # raising `neighbor_cap` is a data-driven decision (VERDICT r4 #6).
        # One [G, N, N] panel per BATCH (not per step) — negligible next to
        # the walk. Decision is static (molecule size + mode), so the dense
        # path pays nothing.
        overflow_fn = None
        if getattr(denoiser, "sparse_neighbors_active", None) and denoiser.sparse_neighbors_active(
            init_graphs.pos.shape[1], training=False
        ):
            overflow_fn = jax.jit(
                lambda y: denoiser.neighbor_overflow(init_graphs.replace_pos(y), sigma)
            )

        self._call("on_sample_start", sampler=self)
        self.global_step = 0
        all_samples: List[List[Dict[str, Any]]] = []
        for batch_idx in range(num_batches):
            self.global_step = batch_idx
            if has_param_callbacks:
                # parameter callbacks mutate MCMC params per batch
                # (`sampling/walkjump/_callbacks.py` parity); params are
                # compile-time constants so the batch fn is rebuilt.
                for cb in self.callbacks:
                    if hasattr(cb, "update_sampler"):
                        batch_sampler = cb.update_sampler(batch_sampler, batch_idx)
                one_batch_gaussian_v, one_batch_carried_v = make_batch_fns(batch_sampler)
            key, bkey = jax.random.split(key)
            t0 = time.perf_counter()
            if isinstance(v_init, str):
                out = one_batch_gaussian_v(params, y_init, bkey)
            else:
                out = one_batch_carried_v(params, y_init, v_init, bkey)
            jax.block_until_ready(out["y"])
            elapsed = time.perf_counter() - t0

            if continue_chain:
                y_init, v_init = out["y"], out["v"]
            else:
                key, nkey = jax.random.split(key)
                y_init = (
                    init_graphs.pos
                    + sigma * jax.random.normal(nkey, init_graphs.pos.shape) * mask
                )
                v_init = "gaussian"

            overflow = None
            if overflow_fn is not None:
                ov = np.asarray(jax.device_get(overflow_fn(out["y"])))
                gm = np.asarray(init_graphs.graph_mask)
                ov = ov[gm] if gm.shape == ov.shape else ov
                overflow = {
                    "mean": float(ov.mean()) if ov.size else 0.0,
                    "max": int(ov.max()) if ov.size else 0,
                }

            samples = unbatch_samples(out, init_graphs)
            all_samples.append(samples)
            self._call(
                "on_after_sample_batch",
                sample=samples,
                sampler=self,
                elapsed_seconds=elapsed,
                neighbor_overflow=overflow,
            )
        self._call("on_sample_end", sampler=self)
        return all_samples
