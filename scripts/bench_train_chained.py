"""Device-chained training-step benchmark (true device ms/step).

Host-loop per-step timings through the tunnel are dispatch-dominated (~20 ms
of RTT per step shows up as "train time"); chaining steps inside one jitted
`lax.fori_loop` (state feeds the next iteration) measures the real device
cost.  Reference-parity role: `profiling/standalone_training.py` measures the
same thing with CUDA events there.

Usage:
    python scripts/bench_train_chained.py --batch-size 32 --atoms 44 --pad 48
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--atoms", type=int, default=44)
    ap.add_argument("--pad", type=int, default=48)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--paths", default="kernel,xla")
    ap.add_argument(
        "--fake-bwd-recompute", action="store_true",
        help="TIMING ONLY (wrong gradients): DCE the bwd kernel's in-kernel "
        "forward recompute — the ceiling of the residual-forward optimization",
    )
    args = ap.parse_args()

    if args.fake_bwd_recompute:
        from jamun_tpu.ops.pallas import packed_conv

        packed_conv._TIMING_FAKE_BWD_RECOMPUTE = True
        print("WARNING: fake bwd recompute — gradients are WRONG, timing only", flush=True)

    import optax

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.train.distributions import ConstantSigma
    from jamun_tpu.train.state import create_train_state, make_train_step
    from jamun_tpu.utils.jax_setup import setup_jax
    from jamun_tpu.utils.testing import make_test_batch

    setup_jax()
    batch = make_test_batch(
        num_graphs=args.batch_size,
        max_nodes=args.pad,
        nodes_per_graph=[args.atoms] * args.batch_size,
        max_bonds=2 * args.pad,
    )
    optimizer = optax.adam(2e-3)

    for path in args.paths.split(","):
        arch = E3Conv(
            tensor_product="uvu",
            dtype=jnp.bfloat16,
            use_pallas=(path == "kernel"),
            # benchmarking escape hatch: "kernel" means the kernel path even
            # at N > 128, where the production training dispatch prefers XLA
            # (gen-4 bwd measured 2.2x slower, BENCH_NOTES round 3e)
            tiled_kernel_training=(path == "kernel"),
        )
        den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.3))
        state = create_train_state(den, optimizer, batch, seed=0)
        step_fn = make_train_step(den, optimizer, ConstantSigma(0.04), 0.999)

        @jax.jit
        def chain(state):
            def body(_, s):
                s2, _aux = step_fn(s, batch)
                return s2
            return jax.lax.fori_loop(0, args.steps, body, state)

        # sync via a SCALAR value fetch: block_until_ready through the tunnel
        # has been observed to ack before execution (BENCH_NOTES round 3d)
        def sync(out):
            return float(jnp.sum(jax.tree_util.tree_leaves(out.params)[0]))

        from jamun_tpu.utils.timing import timed_chain

        t0 = time.time()
        sync(chain(state))
        compile_s = time.time() - t0
        dt = timed_chain(lambda: sync(chain(state)), args.steps)
        if dt is None:
            print(f"{path:>6}: TIMING FAILED (tunnel early-ack artifact)", flush=True)
            continue
        dt = dt / args.steps * 1e3
        print(
            f"{path:>6}: {dt:7.2f} ms/step  (b={args.batch_size}, N={args.pad}, "
            f"{args.steps}-step chain, compile {compile_s:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
