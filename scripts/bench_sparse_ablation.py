"""Sparse-path component ablation: where does the N>=512 walk step go?

VERDICT r4 #2: the capped-neighbor path (ops/neighbors.py — the production
execution format for N>=256 training / N>=512 sampling, replacing
torch_cluster+torch_scatter at `/root/reference/src/jamun/model/denoiser.py:149`
and `e3tools/nn/_conv.py:116-117`) had one day of work and no attribution.
This measures, dependency-chained on the real chip:

  nbrbuild   — capped_neighbor_lists as shipped (diff panel + norm + top_k)
  nbrbuild2  — candidate: dist^2 via the |x|^2 - 2x.y matmul trick (no [N,N,3]
               diff materialization, no sqrt; ranking by dist^2 is the same
               order) + top_k
  nbrbuild3  — candidate: matmul dist^2 + jax.lax.approx_min_k (the
               TPU-native partial-sort operator, recall ~0.95)
  edgefeat   — sh_nbr + attr_nbr for the kept [G, N, K] edges
  msg1       — ONE fast_uvu_messages_nbr layer call (radial MLP + gather +
               messages + K-masked mean) at hidden widths, inputs fixed
  score      — the full denoiser score forward (6 conv layers + glue)
  walkstep   — one BAOAB step (score + integrator update)

Timing rule (NOTES_NEXT): scalar-fetch sync, chained fori_loop inside one
jit per component; standalone dispatch timings through the tunnel are
meaningless.

Run: python scripts/bench_sparse_ablation.py [--sizes 512,1024,2048]
     [--reps 30] [--components nbrbuild,...]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

SIZES = {512: 8, 1024: 2, 2048: 1}  # N -> walk G (BENCH_NOTES round 4a)
SIGMA = 0.04
CAP = 32


def log(msg):
    import sys

    print(f"# {msg}", file=sys.stderr, flush=True)


def chained(fn, state0, reps):
    """Run `state = fn(state, i)` reps times inside one jitted fori_loop and
    time it with scalar-fetch sync. Returns seconds per rep."""

    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, reps, lambda i, s: fn(s, i), state)

    out = run(state0)
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))  # compile sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(state0)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))
        dt = time.perf_counter() - t0
        if dt > reps * 1e-6:
            times.append(dt)
        if len(times) >= 2:
            break
    return min(times) / reps if times else float("nan")


def dist2_matmul(pos, node_mask, cutoff, cap, dst_index=None):
    """capped_neighbor_lists with dist^2 via the matmul identity — candidate."""
    G, N, _ = pos.shape
    sq = jnp.sum(pos * pos, axis=-1)  # [G, N]
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * jnp.einsum(
        "gnd,gmd->gnm", pos, pos, preferred_element_type=jnp.float32
    )
    eye = jnp.eye(N, dtype=bool)[None]
    in_cut = (d2 < cutoff * cutoff) & node_mask[:, :, None] & node_mask[:, None, :] & (~eye)
    ranked = jnp.where(in_cut, d2, jnp.inf)
    neg_topk, nbr_idx = jax.lax.top_k(-ranked, cap)
    nbr_mask = jnp.isfinite(neg_topk)
    deg = jnp.sum(in_cut, axis=-1, dtype=jnp.int32)
    overflow = jnp.sum(jnp.maximum(deg - cap, 0), axis=-1, dtype=jnp.int32)
    return nbr_idx.astype(jnp.int32), nbr_mask, overflow


def dist2_approx(pos, node_mask, cutoff, cap):
    """matmul dist^2 + approx_min_k (TPU-optimized partial reduction)."""
    G, N, _ = pos.shape
    sq = jnp.sum(pos * pos, axis=-1)
    d2 = sq[:, :, None] + sq[:, None, :] - 2.0 * jnp.einsum(
        "gnd,gmd->gnm", pos, pos, preferred_element_type=jnp.float32
    )
    eye = jnp.eye(N, dtype=bool)[None]
    in_cut = (d2 < cutoff * cutoff) & node_mask[:, :, None] & node_mask[:, None, :] & (~eye)
    ranked = jnp.where(in_cut, d2, jnp.inf)
    vals, nbr_idx = jax.lax.approx_min_k(ranked, cap)
    nbr_mask = jnp.isfinite(vals)
    deg = jnp.sum(in_cut, axis=-1, dtype=jnp.int32)
    overflow = jnp.sum(jnp.maximum(deg - cap, 0), axis=-1, dtype=jnp.int32)
    return nbr_idx.astype(jnp.int32), nbr_mask, overflow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024")
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--skin", type=float, default=1.0, help="Verlet skin (nm) for walkstepc/walkstepkc")
    ap.add_argument(
        "--components",
        default="nbrbuild,nbrbuild2,nbrbuild3,edgefeat,msg1,msg1k,score,scorek,walkstep,walkstepk",
    )
    args = ap.parse_args()
    comps = args.components.split(",")

    import sys

    sys.path.insert(0, "/root/repo")
    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.ops.neighbors import capped_neighbor_lists
    from jamun_tpu.utils.testing import make_chain_positions, make_test_batch

    for N in [int(s) for s in args.sizes.split(",")]:
        G = SIZES.get(N, 2)
        batch = make_test_batch(
            num_graphs=G, max_nodes=N, nodes_per_graph=[N] * G, max_bonds=2 * N
        )
        batch = batch.replace(pos=jnp.asarray(make_chain_positions(G, N, seed=0)))
        arch = E3Conv(tensor_product="uvu", dtype=jnp.bfloat16, use_pallas=False)
        den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
        params = den.init(jax.random.PRNGKey(0), batch)
        mask = batch.node_mask[..., None].astype(batch.pos.dtype)
        # the geometry the walk actually sees: c_in-scaled positions, scaled cutoff
        from jamun_tpu.models.denoiser import normalization_factors

        c_in, _, _, c_noise = normalization_factors(SIGMA, 0.5)
        cutoff = float(den.effective_radial_cutoff(SIGMA) / c_in)
        pos_s = batch.pos * c_in
        nm = batch.node_mask

        results = {}

        if "nbrbuild" in comps:
            def nb_step(state, i):
                pos = state
                idx, m, ov = capped_neighbor_lists(pos, nm, cutoff, CAP)
                # fold outputs back into the carry so the loop chains
                return pos + 1e-9 * (
                    m[..., :1].astype(pos.dtype) + ov[:, None, None].astype(pos.dtype)
                )

            results["nbrbuild"] = chained(nb_step, pos_s, args.reps)

        if "nbrbuild2" in comps:
            def nb2_step(state, i):
                pos = state
                idx, m, ov = dist2_matmul(pos, nm, cutoff, CAP)
                return pos + 1e-9 * (
                    m[..., :1].astype(pos.dtype) + ov[:, None, None].astype(pos.dtype)
                )

            results["nbrbuild2"] = chained(nb2_step, pos_s, args.reps)

        if "nbrbuild3" in comps:
            def nb3_step(state, i):
                pos = state
                idx, m, ov = dist2_approx(pos, nm, cutoff, CAP)
                return pos + 1e-9 * (
                    m[..., :1].astype(pos.dtype) + ov[:, None, None].astype(pos.dtype)
                )

            results["nbrbuild3"] = chained(nb3_step, pos_s, args.reps)

        if any(c in comps for c in ("edgefeat", "msg1", "msg1k", "msg1kng")):
            from jamun_tpu.ops.irreps import Irreps
            from jamun_tpu.ops.neighbors import gather_neighbors, neighbor_edge_data
            from jamun_tpu.ops.radial import soft_one_hot_linspace
            from jamun_tpu.ops.sh import spherical_harmonics

            irreps_sh = Irreps("1x0e + 1x1e")
            sh_fn = functools.partial(spherical_harmonics, irreps_sh)

            def attr_fn(dist, bonded: bool):
                radial = soft_one_hot_linspace(dist, 0.0, cutoff, 32, basis="gaussian", cutoff=True)
                bond = jnp.zeros(dist.shape + (32,), dist.dtype)
                return jnp.concatenate([bond, radial], axis=-1)

            idx0, m0, _ = capped_neighbor_lists(pos_s, nm, cutoff, CAP)

            if "edgefeat" in comps:
                def ef_step(state, i):
                    pos = state
                    pos_nbr = gather_neighbors(pos, idx0)
                    ev = pos_nbr - pos[:, :, None, :]
                    el = jnp.linalg.norm(ev + 1e-12, axis=-1)
                    sh = sh_fn(ev)
                    at = attr_fn(el, False)
                    return pos + 1e-9 * (sh[..., :1, 0] + at[..., :1, 0])

                results["edgefeat"] = chained(ef_step, pos_s, args.reps)

            if any(c in comps for c in ("msg1", "msg1k", "msg1kng")):
                from jamun_tpu.ops.fast_uvu import fast_uvu_messages_nbr

                S, V = 120, 32
                C = S + 3 * V
                key = jax.random.PRNGKey(1)
                x0 = jax.random.normal(key, (G, N, C), jnp.bfloat16)
                pos_nbr = gather_neighbors(pos_s, idx0)
                ev = pos_nbr - pos_s[:, :, None, :]
                el = jnp.linalg.norm(ev + 1e-12, axis=-1)
                sh0 = sh_fn(ev).astype(jnp.bfloat16)
                at0 = attr_fn(el, False).astype(jnp.bfloat16)
                w1 = jax.random.normal(key, (64, 64), jnp.bfloat16) * 0.1
                w2 = jax.random.normal(key, (64, 2 * S + 3 * V), jnp.bfloat16) * 0.1

                if "msg1" in comps:
                    def msg_step(state, i):
                        x = state
                        h = jax.nn.silu(at0 @ w1)
                        w = h @ w2  # [G, N, K, 2S+3V]
                        out, deg = fast_uvu_messages_nbr(
                            x, sh0, w, idx0, m0.astype(jnp.bfloat16), S=S, V=V
                        )
                        return x + 1e-9 * out[..., :C]

                    results["msg1"] = chained(msg_step, x0, args.reps)

                if "msg1kng" in comps:
                    # timing diagnostic: whole kernel minus the one-hot gather
                    # (wrong results; separate process from msg1k — the jit
                    # trace caches the flag)
                    import jamun_tpu.ops.pallas.nbr_conv as _nbrmod

                    _nbrmod._TIMING_SKIP_GATHER = True
                if "msg1k" in comps or "msg1kng" in comps:
                    from jamun_tpu.ops.pallas.nbr_conv import nbr_uvu_conv

                    def msgk_step(state, i):
                        x = state
                        out, deg = nbr_uvu_conv(
                            x, sh0, at0, idx0, m0.astype(jnp.bfloat16),
                            w1.astype(jnp.float32), jnp.zeros(64),
                            w2.astype(jnp.float32), jnp.zeros(2 * S + 3 * V),
                            S=S, V=V, compute_dtype=jnp.bfloat16,
                        )
                        return x + 1e-9 * out[..., :C].astype(x.dtype)

                    results["msg1kng" if "msg1kng" in comps else "msg1k"] = chained(
                        msgk_step, x0, args.reps
                    )

        if "score" in comps:
            def score_step(state, i):
                y = state
                s = den.score(params, batch.replace_pos(y), SIGMA)
                return y + 1e-9 * s

            results["score"] = chained(score_step, batch.pos, args.reps)

        if "scorek" in comps:
            arch_k = E3Conv(tensor_product="uvu", dtype=jnp.bfloat16, use_pallas=True)
            den_k = Denoiser(arch_k, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))

            def scorek_step(state, i):
                y = state
                s = den_k.score(params, batch.replace_pos(y), SIGMA)
                return y + 1e-9 * s

            results["scorek"] = chained(scorek_step, batch.pos, args.reps)

        walk_variants = []
        if "walkstep" in comps:
            walk_variants.append(("walkstep", den, 0.0))
        if "walkstepc" in comps:
            walk_variants.append(("walkstepc", den, args.skin))
        if "walkstepk" in comps or "walkstepkc" in comps:
            arch_wk = E3Conv(tensor_product="uvu", dtype=jnp.bfloat16, use_pallas=True)
            den_wk = Denoiser(arch_wk, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
            if "walkstepk" in comps:
                walk_variants.append(("walkstepk", den_wk, 0.0))
            if "walkstepkc" in comps:
                walk_variants.append(("walkstepkc", den_wk, args.skin))
        for wname, wden, wskin in walk_variants:
            from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig

            mcmc = BAOAB(
                MCMCConfig(delta=0.04, friction=1.0, M=1.0, steps=args.reps + 1,
                           save_every_n_steps=args.reps, score_fn_clip=100.0)
            )

            cached = (
                wden.make_neighbor_cached_score(params, batch, SIGMA, wskin)
                if wskin > 0
                else None
            )

            @jax.jit
            def walk(y0, key, _wden=wden, _cached=cached):
                def score_fn(y):
                    return _wden.score(params, batch.replace_pos(y), SIGMA)

                y, v, yt, st = mcmc(
                    key, y0, score_fn, v_init="gaussian", mask=mask, cached_score=_cached
                )
                return y

            y0 = batch.pos
            y = walk(y0, jax.random.PRNGKey(2))
            float(jnp.sum(y[0, 0]))
            times = []
            for r in range(3):
                t0 = time.perf_counter()
                y = walk(y, jax.random.PRNGKey(3 + r))
                float(jnp.sum(y[0, 0]))
                dt = time.perf_counter() - t0
                if dt > args.reps * 1e-6:
                    times.append(dt)
                if len(times) >= 2:
                    break
            results[wname] = min(times) / args.reps if times else float("nan")

        print(f"\nN={N} G={G} (ms/call, {args.reps}-chained):")
        for k, v in results.items():
            print(f"  {k:>10}: {v * 1e3:8.3f}")


if __name__ == "__main__":
    main()
