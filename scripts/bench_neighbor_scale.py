"""Sparse-vs-dense scale benchmark: walk ms/sample + train ms/step, N=256..2048.

VERDICT round-3 ask #2: measure the capped-neighbor sparse path
(ops/neighbors.py — the TPU replacement for torch_cluster.radius_graph,
`/root/reference/src/jamun/model/denoiser.py:149`) against the dense
masked-adjacency paths (XLA and the gen-4 tiled kernel) in the regime where
the dense panel's fill factor collapses, on worm-like-chain conformations
(`make_chain_positions`) — the train_idrome large-molecule regime.

Reports, per size: measured adjacency fill factor, overflow fraction at the
cap, and ms/sample / ms/step per path. Rows that OOM or fail print the error
instead of a number (dense at N >= 1024 is EXPECTED to be the wrong
algorithm; that is the point of the table).

Run: python scripts/bench_neighbor_scale.py [--sizes 256,512,1024,2048]
     [--paths walk,train] [--cap 32]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

# label: N -> (walk_G, train_G); G chosen so the DENSE paths fit in HBM
# (the sparse path could run far larger G — the *_sparse rows show it)
SIZES = {
    256: dict(walk_G=16, train_G=8, sparse_G=64),
    512: dict(walk_G=8, train_G=4, sparse_G=32),
    1024: dict(walk_G=2, train_G=1, sparse_G=16),
    2048: dict(walk_G=1, train_G=1, sparse_G=8),
}
SIGMA = 0.04
WALK_STEPS = 101  # steps per dispatch; one host RTT (~20 ms through the
# tunnel) is amortized over WALK_STEPS * reps chained device steps


def make_batch(G, N, seed=0):
    from jamun_tpu.utils.testing import make_chain_positions, make_test_batch

    batch = make_test_batch(
        num_graphs=G, max_nodes=N, nodes_per_graph=[N] * G, max_bonds=2 * N, seed=seed
    )
    pos = make_chain_positions(G, N, seed=seed)
    return batch.replace(pos=jnp.asarray(pos))


def fill_and_overflow(batch, cutoff, cap):
    from jamun_tpu.ops.neighbors import capped_neighbor_lists

    # one jitted program: eager per-op dispatch through the tunnel costs a
    # compile RPC per op per shape (minutes of apparent hang)
    @jax.jit
    def stats(pos, mask):
        d = jnp.linalg.norm(pos[:, None, :, :] - pos[:, :, None, :] + 1e-12, axis=-1)
        eye = jnp.eye(pos.shape[1], dtype=bool)[None]
        adj = (d < cutoff) & mask[:, :, None] & mask[:, None, :] & ~eye
        _, _, overflow = capped_neighbor_lists(pos, mask, cutoff, cap)
        return jnp.sum(adj), jnp.sum(overflow)

    n_edges, overflow = stats(jnp.asarray(batch.pos), jnp.asarray(batch.node_mask))
    n_pairs = batch.pos.shape[0] * batch.pos.shape[1] ** 2
    return float(n_edges) / n_pairs, float(overflow) / max(float(n_edges), 1.0)


def arch_for(path, cap):
    from jamun_tpu.models.e3conv import E3Conv

    return E3Conv(
        tensor_product="uvu",
        dtype=jnp.bfloat16,
        use_pallas=(path == "kernel"),
        tiled_kernel_training=(path == "kernel"),
        neighbor_mode="nbr" if path == "nbr" else "dense",
        neighbor_cap=cap,
    )


def bench_walk(path, G, N, cap):
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.utils.timing import timed_chain

    batch = make_batch(G, N)
    mask = batch.node_mask[..., None].astype(batch.pos.dtype)
    den = Denoiser(
        arch_for(path, cap), DenoiserConfig(max_radius=1.0, average_squared_distance=0.5)
    )
    params = den.init(jax.random.PRNGKey(0), batch)
    mcmc = BAOAB(
        MCMCConfig(delta=0.04, friction=1.0, M=1.0, steps=WALK_STEPS,
                   save_every_n_steps=1, score_fn_clip=100.0)
    )

    @jax.jit
    def walk(params, y0, key):
        def score_fn(y):
            return den.score(params, batch.replace_pos(y), SIGMA)

        return mcmc(key, y0, score_fn, v_init="gaussian", mask=mask)

    y0 = batch.pos + SIGMA * jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape) * mask
    t0 = time.perf_counter()
    out = walk(params, y0, jax.random.PRNGKey(2))
    float(jnp.sum(out[0][0]))
    compile_s = time.perf_counter() - t0
    state = {"y": out[0], "i": 0}

    def run():
        state["i"] += 1
        o = walk(params, state["y"], jax.random.PRNGKey(2 + state["i"]))
        float(jnp.sum(o[0][0]))
        state["y"] = o[0]

    reps = 5
    t = timed_chain(lambda: [run() for _ in range(reps)], reps * WALK_STEPS)
    if t is None:
        return None, compile_s
    return t * 1e3 / (reps * WALK_STEPS * G), compile_s


def bench_train(path, G, N, cap):
    import optax

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.train.distributions import ConstantSigma
    from jamun_tpu.train.state import create_train_state, make_train_step
    from jamun_tpu.utils.timing import timed_chain

    batch = make_batch(G, N)
    den = Denoiser(
        arch_for(path, cap), DenoiserConfig(max_radius=1.0, average_squared_distance=0.3)
    )
    state = create_train_state(den, optax.adam(2e-3), batch, seed=0)
    step_fn = make_train_step(den, optax.adam(2e-3), ConstantSigma(0.04), 0.999)
    steps = 10

    @jax.jit
    def chain(state):
        def body(_, s):
            s2, _aux = step_fn(s, batch)
            return s2

        return jax.lax.fori_loop(0, steps, body, state)

    def sync(out):
        return float(jnp.sum(jax.tree_util.tree_leaves(out.params)[0]))

    t0 = time.perf_counter()
    sync(chain(state))
    compile_s = time.perf_counter() - t0
    t = timed_chain(lambda: sync(chain(state)), steps)
    if t is None:
        return None, compile_s
    return t / steps * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512,1024,2048")
    ap.add_argument("--paths", default="walk,train")
    ap.add_argument("--cap", type=int, default=32)
    ap.add_argument("--walk-variants", default="xla,kernel,nbr,nbr_bigG")
    ap.add_argument("--train-variants", default="xla,nbr,nbr_bigG")
    args = ap.parse_args()

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    cutoff = float(np.sqrt(1.0 + 6 * SIGMA**2))  # effective walk cutoff

    for N in (int(s) for s in args.sizes.split(",")):
        cfg = SIZES[N]
        fill, ovf = fill_and_overflow(make_batch(4, N), cutoff, args.cap)
        print(
            f"\nN={N}: fill={100 * fill:.1f}%  overflow@cap{args.cap}={100 * ovf:.2f}% "
            f"(dense/sparse pair-slot ratio N/K = {N / args.cap:.0f}x; "
            f"sparse slot utilization = {100 * fill * N / args.cap:.0f}%)",
            flush=True,
        )
        if "walk" in args.paths:
            for variant in args.walk_variants.split(","):
                path = variant.replace("_bigG", "")
                G = cfg["sparse_G"] if variant.endswith("bigG") else cfg["walk_G"]
                try:
                    ms, comp = bench_walk(path, G, N, args.cap)
                    msg = f"{ms:.4f} ms/sample" if ms else "TIMING FAILED"
                    print(f"  walk {variant:>9} (G={G:3d}): {msg}  (compile {comp:.0f}s)", flush=True)
                except Exception as e:  # noqa: BLE001 — report OOM rows as data
                    print(f"  walk {variant:>9} (G={G:3d}): FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        if "train" in args.paths:
            for variant in args.train_variants.split(","):
                path = variant.replace("_bigG", "")
                G = cfg["sparse_G"] if variant.endswith("bigG") else cfg["train_G"]
                try:
                    ms, comp = bench_train(path, G, N, args.cap)
                    msg = f"{ms:.2f} ms/step" if ms else "TIMING FAILED"
                    print(f"  train {variant:>8} (b={G:3d}): {msg}  (compile {comp:.0f}s)", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"  train {variant:>8} (b={G:3d}): FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
