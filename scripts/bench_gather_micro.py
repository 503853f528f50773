"""Micro-bench: XLA row-gather strategies for the sparse neighbor path.

The sparse path's per-layer message work (`fast_uvu_messages_nbr`) starts
with a [G, N, K] row-gather of the [G, N_src, C] node features. VERDICT r4
says the path "saturates HBM before the MXU" — this isolates whether the
gather itself (XLA's lowering of vmap(x[idx])) is the hog, and compares the
candidate lowerings a fused Pallas kernel could use:

  gather      — jax.vmap(lambda xg, ig: xg[ig]) as shipped (ops/neighbors.py)
  take        — jnp.take_along_axis formulation
  onehot      — one-hot [N*K, N] matmul gather (the MXU formulation)
  gather_flat — single flat gather with precomputed graph offsets
  msum        — gather + mask-weighted sum over K (the fusion XLA should do)

Run: python scripts/bench_gather_micro.py [--N 1024] [--G 2] [--C 216]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from jamun_tpu.utils.jax_setup import setup_jax  # noqa: E402


def chained(fn, state0, reps=30):
    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, reps, lambda i, s: fn(s, i), state)

    out = run(state0)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:8]))
    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        out = run(state0)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:8]))
        dt = time.perf_counter() - t0
        if dt > reps * 1e-6:
            times.append(dt)
        if len(times) >= 2:
            break
    return min(times) / reps if times else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=1024)
    ap.add_argument("--G", type=int, default=2)
    ap.add_argument("--K", type=int, default=32)
    ap.add_argument("--C", type=int, default=216)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()
    setup_jax()

    G, N, K, C = args.G, args.N, args.K, args.C
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (G, N, C), jnp.bfloat16)
    idx = jax.random.randint(key, (G, N, K), 0, N, jnp.int32)
    mask = (jax.random.uniform(key, (G, N, K)) > 0.2).astype(jnp.bfloat16)

    res = {}

    def g_step(state, i):
        xs = state
        xg = jax.vmap(lambda xg_, ig: xg_[ig])(xs, idx)  # [G,N,K,C]
        return xs + 1e-9 * jnp.sum(xg, axis=2)

    res["gather"] = chained(g_step, x, args.reps)

    def t_step(state, i):
        xs = state
        xg = jnp.take_along_axis(xs[:, :, None, :], idx[..., None], axis=1)
        return xs + 1e-9 * jnp.sum(xg, axis=2)

    res["take"] = chained(t_step, x, args.reps)

    def o_step(state, i):
        xs = state
        onehot = (idx[..., None] == jnp.arange(N)[None, None, None, :]).astype(
            jnp.bfloat16
        )  # [G,N,K,N]
        xg = jnp.einsum("gnkm,gmc->gnkc", onehot, xs)
        return xs + 1e-9 * jnp.sum(xg, axis=2)

    res["onehot"] = chained(o_step, x, args.reps)

    flat_idx = (idx + jnp.arange(G)[:, None, None] * N).reshape(-1)

    def f_step(state, i):
        xs = state
        xg = xs.reshape(G * N, C)[flat_idx].reshape(G, N, K, C)
        return xs + 1e-9 * jnp.sum(xg, axis=2)

    res["gather_flat"] = chained(f_step, x, args.reps)

    def m_step(state, i):
        xs = state
        xg = jax.vmap(lambda xg_, ig: xg_[ig])(xs, idx)
        out = jnp.einsum("gnkc,gnk->gnc", xg, mask)
        return xs + 1e-9 * out

    res["msum"] = chained(m_step, x, args.reps)

    print(f"N={N} G={G} K={K} C={C} (ms/call, {args.reps}-chained):")
    for k, v in res.items():
        print(f"  {k:>12}: {v * 1e3:8.3f}")


if __name__ == "__main__":
    main()
