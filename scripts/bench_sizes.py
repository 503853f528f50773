"""Walk-jump ms/sample across the reference's published system sizes.

Reproduces the BENCH_NOTES speedup table (2AA/4AA/5AA vs the reference's
2.2/2.5/7.5 ms/sample, `/root/reference/analysis/sampling_times/JAMUN.csv`).

Run: python scripts/bench_sizes.py [--no-pallas] [--size 2AA|4AA|5AA]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

SIZES = {
    # label: (chains, N_pad, heavy_atoms, reference ms/sample)
    "2AA": (256, 24, 19, 2.2),
    "4AA": (256, 48, 44, 2.5),
    "5AA": (128, 112, 108, 7.5),
    # beyond the reference's published sizes (no baseline): the gen-4 tiled
    # kernel regime / the costed story for train_idrome-scale molecules
    "N256": (64, 256, 250, None),
    "N512": (16, 512, 500, None),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--stack", action="store_true",
                    help="whole-model stack kernel (ops/pallas/e3_stack.py)")
    ap.add_argument("--exact-n", action="store_true",
                    help="pad N to the heavy-atom count instead of the "
                    "round number (pair work is O(N^2): 2AA 19 vs 24, "
                    "4AA 44 vs 48)")
    ap.add_argument("--size", choices=SIZES, default=None)
    ap.add_argument("--chains", type=int, default=None,
                    help="override the size's default chain count G")
    args = ap.parse_args()

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.utils.testing import make_test_batch

    SIGMA = 0.04
    for label, (G, N, NA, ref_ms) in SIZES.items():
        if args.size and label != args.size:
            continue
        if args.exact_n:
            N = NA
        if args.chains:
            G = args.chains
        batch = make_test_batch(
            num_graphs=G, max_nodes=N, nodes_per_graph=[NA] * G, max_bonds=2 * N,
            scale=0.3 + 0.15 * (N > 48),
        )
        mcmc = BAOAB(
            MCMCConfig(delta=0.04, friction=1.0, M=1.0, steps=101,
                       save_every_n_steps=1, score_fn_clip=100.0)
        )
        mask = batch.node_mask[..., None].astype(batch.pos.dtype)
        if args.stack and N > 64:
            print(
                f"{label}: NOTE --stack requested but N={N} exceeds the stack "
                "kernel's default N<=64 gate (JAMUN_STACK_NMAX raises it); "
                "without the override this row measures the LAYERWISE path",
                flush=True,
            )
        arch = E3Conv(
            tensor_product="uvu", dtype=jnp.bfloat16,
            use_pallas=not args.no_pallas, fused_stack=args.stack,
        )
        den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
        params = den.init(jax.random.PRNGKey(0), batch)

        @jax.jit
        def walk(params, y0, key, den=den, batch=batch, mcmc=mcmc, mask=mask):
            def score_fn(y):
                return den.score(params, batch.replace_pos(y), SIGMA)

            return mcmc(key, y0, score_fn, v_init="gaussian", mask=mask)

        y0 = batch.pos + SIGMA * jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape) * mask
        # sync via a SCALAR value fetch: block_until_ready through the tunnel
        # has been observed to ack before execution (esp. after cold compiles)
        from jamun_tpu.utils.timing import timed_chain

        t0 = time.perf_counter()
        out = walk(params, y0, jax.random.PRNGKey(2))
        float(jnp.sum(out[0][0]))
        c = time.perf_counter() - t0
        state = {"y": out[0], "i": 0}

        def run():
            state["i"] += 1
            o = walk(params, state["y"], jax.random.PRNGKey(2 + state["i"]))
            float(jnp.sum(o[0][0]))
            state["y"] = o[0]

        t = timed_chain(run, 100)
        if t is None:
            print(f"{label}: TIMING FAILED (tunnel early-ack artifact)", flush=True)
            continue
        ms = t * 1e3 / (G * 101)
        vs = f"= {ref_ms/ms:.1f}x the reference's {ref_ms} ms" if ref_ms else "(no published baseline)"
        print(
            f"{label} (G={G}, N={N}): compile {c:.1f}s  {t*1e3/100:.3f} ms/step  "
            f"{ms:.5f} ms/sample  {vs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
