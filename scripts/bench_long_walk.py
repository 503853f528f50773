"""Steady-state long-walk benchmark: the reference's 20,000-step sampling
workload (`/root/reference/configs/experiment/sample_uncapped_2AA.yaml:16`)
with chunked host trajectory offload.

Run: python scripts/bench_long_walk.py [--steps 20000] [--chains 128]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def device_mem_mb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return {k: round(v / 1e6) for k, v in stats.items() if "bytes_in_use" in k or "peak" in k}
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=2000)
    args = ap.parse_args()

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.sampling.walkjump import SingleMeasurementSampler
    from jamun_tpu.utils.testing import make_test_batch

    SIGMA = 0.04
    arch = E3Conv(tensor_product="uvu", dtype=jnp.bfloat16, use_pallas=True)
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
    batch = make_test_batch(
        num_graphs=args.chains, max_nodes=48, nodes_per_graph=[44] * args.chains,
        max_bonds=96, scale=0.35,
    )
    params = den.init(jax.random.PRNGKey(0), batch)
    mask = batch.node_mask[..., None].astype(batch.pos.dtype)
    y0 = batch.pos + SIGMA * jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape) * mask

    for save_every in (10, 1):
        cfg = MCMCConfig(
            delta=0.04, friction=1.0, M=1.0, steps=args.steps + 1,
            save_every_n_steps=save_every, score_fn_clip=100.0,
        )
        bs = SingleMeasurementSampler(
            mcmc=BAOAB(cfg), sigma=SIGMA, offload_chunk_steps=args.chunk
        )
        t0 = time.perf_counter()
        out = bs.sample_chunked(den, params, batch, jax.random.PRNGKey(2), y0)
        elapsed = time.perf_counter() - t0
        frames = out["y_traj"].shape[0]
        n_samples = frames * args.chains
        host_gb = sum(out[k].nbytes for k in ("y_traj", "score_traj", "xhat_traj")) / 1e9
        print(
            f"save_every={save_every}: {args.steps} steps x {args.chains} chains in "
            f"{elapsed:.1f}s = {elapsed*1e3/n_samples:.4f} ms/sample "
            f"({args.steps/elapsed:.1f} steps/s); frames={frames} "
            f"host_traj={host_gb:.2f} GB device_mem={device_mem_mb()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
