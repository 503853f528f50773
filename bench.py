"""Headline benchmark: walk-jump sampling throughput on a 4AA-scale peptide.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published 2.5 ms/sample on Timewarp 4AA, 1 GPU
(`/root/reference/analysis/sampling_times/JAMUN.csv:4`), where one "sample" is
one emitted walk-jump frame of one chain (save_every=1: each sample costs one
walk denoiser forward + one jump forward). Here the whole walk is a fused
lax.scan over vmapped chains on one TPU chip; vs_baseline = baseline_ms /
our_ms (>1 is faster than the reference).

The walk and jump are compiled as two separate programs (the tunneled remote
compile service handles two medium programs far better than one huge one).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS_PER_SAMPLE = 2.5  # Timewarp 4AA, reference CSV

N_ATOMS = 44  # 4AA-scale heavy-atom count
N_PAD = 48
NUM_CHAINS = 128
STEPS = 101  # steps-1 walk updates (reference loop semantics)
SIGMA = 0.04


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.utils.testing import make_test_batch

    arch = E3Conv(tensor_product="uvu", dtype=jnp.bfloat16)
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
    batch = make_test_batch(
        num_graphs=NUM_CHAINS,
        max_nodes=N_PAD,
        nodes_per_graph=[N_ATOMS] * NUM_CHAINS,
        max_bonds=2 * N_PAD,
        scale=0.35,
    )
    log("init params")
    params = den.init(jax.random.PRNGKey(0), batch)
    mask = batch.node_mask[..., None].astype(batch.pos.dtype)

    mcmc = BAOAB(
        MCMCConfig(
            delta=0.04, friction=1.0, M=1.0, steps=STEPS,
            save_every_n_steps=1, score_fn_clip=100.0,
        )
    )

    @jax.jit
    def walk(params, y0, key):
        def score_fn(y):
            return den.score(params, batch.replace_pos(y), SIGMA)

        y, v, y_traj, _ = mcmc(key, y0, score_fn, v_init="gaussian", mask=mask)
        return y, v, y_traj

    @jax.jit
    def jump(params, y_traj):
        def xhat_frame(y):
            return den.xhat(params, batch.replace_pos(y), SIGMA)

        return jax.lax.map(xhat_frame, y_traj)

    y0 = batch.pos + SIGMA * jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape) * mask

    log("compiling walk...")
    t0 = time.perf_counter()
    y, v, y_traj = walk(params, y0, jax.random.PRNGKey(2))
    jax.block_until_ready(y_traj)
    log(f"walk compile+run {time.perf_counter() - t0:.1f}s; frames={y_traj.shape[0]}")

    log("compiling jump...")
    t0 = time.perf_counter()
    xhat_traj = jump(params, y_traj)
    jax.block_until_ready(xhat_traj)
    log(f"jump compile+run {time.perf_counter() - t0:.1f}s")

    # timed runs
    walk_times, jump_times = [], []
    for i in range(2):
        t0 = time.perf_counter()
        y, v, y_traj = walk(params, y, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(y_traj)
        walk_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        xhat_traj = jump(params, y_traj)
        jax.block_until_ready(xhat_traj)
        jump_times.append(time.perf_counter() - t0)

    elapsed = min(walk_times) + min(jump_times)
    n_frames = int(y_traj.shape[0])
    n_samples = NUM_CHAINS * n_frames
    ms_per_sample = elapsed * 1e3 / n_samples
    result = {
        "metric": "walkjump_ms_per_sample_4AA",
        "value": round(ms_per_sample, 5),
        "unit": "ms/sample",
        "vs_baseline": round(BASELINE_MS_PER_SAMPLE / ms_per_sample, 2),
    }
    print(json.dumps(result))
    log(
        f"chains={NUM_CHAINS} frames={n_frames} walk={min(walk_times):.3f}s "
        f"jump={min(jump_times):.3f}s steps/sec/chip={(STEPS - 1) / min(walk_times):.1f} "
        f"(x{NUM_CHAINS} chains)"
    )


if __name__ == "__main__":
    main()
