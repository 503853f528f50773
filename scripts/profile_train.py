"""Standalone training-loop profiling harness (no Trainer).

Reference parity: `profiling/standalone_training.py` (Lightning-free loop with
cudaProfilerStart/NVTX there; jax.profiler trace here).

Usage:
    python scripts/profile_train.py --steps 30 --trace-dir /tmp/jamun_train_trace
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trace-dir", default="/tmp/jamun_tpu_train_trace")
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--atoms", type=int, default=22)
    parser.add_argument("--pad", type=int, default=24)
    parser.add_argument("--tp", default="uvu", choices=["uvu", "uvw"])
    parser.add_argument("--pallas", action="store_true",
                        help="fused kernel path (fwd + custom-VJP backward)")
    args = parser.parse_args()

    import optax

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.train.distributions import ConstantSigma
    from jamun_tpu.train.state import create_train_state, make_train_step
    from jamun_tpu.utils.jax_setup import setup_jax
    from jamun_tpu.utils.testing import make_test_batch

    setup_jax()
    arch = E3Conv(tensor_product=args.tp, dtype=jnp.bfloat16, use_pallas=args.pallas)
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.3))
    batch = make_test_batch(
        num_graphs=args.batch_size,
        max_nodes=args.pad,
        nodes_per_graph=[args.atoms] * args.batch_size,
        max_bonds=2 * args.pad,
    )
    optimizer = optax.adam(2e-3)
    state = create_train_state(den, optimizer, batch, seed=0)
    step_fn = jax.jit(make_train_step(den, optimizer, ConstantSigma(0.04), 0.999))

    state, aux = step_fn(state, batch)  # compile
    jax.block_until_ready(aux["loss"])

    jax.profiler.start_trace(args.trace_dir)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, aux = step_fn(state, batch)
    jax.block_until_ready(aux["loss"])
    elapsed = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(
        f"traced {args.steps} train steps in {elapsed:.3f}s "
        f"({elapsed * 1e3 / args.steps:.2f} ms/step, "
        f"{args.steps * args.batch_size / elapsed:.0f} samples/s) -> {args.trace_dir}"
    )


if __name__ == "__main__":
    main()
