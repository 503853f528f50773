"""Standalone profiling harness: trace the walk-jump hot loop with
jax.profiler (XProf/TensorBoard trace).

Reference parity: `profiling/standalone_training.py` + `profiling/profile.sh`
(nsys + NVTX there; jax.profiler trace + named annotations here).

Usage:
    python scripts/profile_walk.py --trace-dir /tmp/jamun_trace --steps 50
    # inspect with: tensorboard --logdir /tmp/jamun_trace
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace-dir", default="/tmp/jamun_tpu_trace")
    parser.add_argument("--steps", type=int, default=51)
    parser.add_argument("--chains", type=int, default=64)
    parser.add_argument("--atoms", type=int, default=44)
    parser.add_argument("--pad", type=int, default=48)
    parser.add_argument("--tp", default="uvu", choices=["uvu", "uvw"])
    args = parser.parse_args()

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.utils.jax_setup import setup_jax
    from jamun_tpu.utils.testing import make_test_batch

    setup_jax()
    arch = E3Conv(tensor_product=args.tp, dtype=jnp.bfloat16)
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
    batch = make_test_batch(
        num_graphs=args.chains,
        max_nodes=args.pad,
        nodes_per_graph=[args.atoms] * args.chains,
        max_bonds=2 * args.pad,
        scale=0.35,
    )
    params = den.init(jax.random.PRNGKey(0), batch)
    mask = batch.node_mask[..., None].astype(batch.pos.dtype)
    mcmc = BAOAB(
        MCMCConfig(delta=0.04, steps=args.steps, save_every_n_steps=1, score_fn_clip=100.0)
    )

    @jax.jit
    def walk(params, y0, key):
        with jax.named_scope("walk"):
            return mcmc(
                key,
                y0,
                lambda y: den.score(params, batch.replace_pos(y), 0.04),
                v_init="gaussian",
                mask=mask,
            )[0]

    y0 = batch.pos
    y = walk(params, y0, jax.random.PRNGKey(1))  # compile
    jax.block_until_ready(y)

    jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    y = walk(params, y, jax.random.PRNGKey(2))
    jax.block_until_ready(y)
    elapsed = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(
        f"traced {args.steps - 1} steps x {args.chains} chains in {elapsed:.3f}s "
        f"({elapsed * 1e3 / (args.steps - 1):.2f} ms/step) -> {args.trace_dir}"
    )


if __name__ == "__main__":
    main()
