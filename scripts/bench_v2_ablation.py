"""Gen-4 tiled-kernel ablation: per-call time vs dst-block size.

The aggregation matmul msg[C, P] @ ei[P, Nblk] costs C*N^2*Nblk MACs total
(one-hot: only C*N^2 useful), so small dst blocks cut the dominant wasted-MAC
term at 5AA scale — at the price of more grid programs and per-chunk bond
recompute. This sweep finds the optimum empirically (tunnel rule: only
dependency-chained fori_loop timings are real).

Run: python scripts/bench_v2_ablation.py [--N 112] [--G 128] [--steps 30]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from jamun_tpu.utils.timing import timed_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=112)
    ap.add_argument("--G", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--blocks", type=str, default="")
    args = ap.parse_args()

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from jamun_tpu.ops.pallas.packed_conv import (
        _auto_dst_block,
        _pad16,
        packed_edge_features,
        packed_fused_block_v2,
        packed_geometry_inputs,
        packed_separable_conv_layer,
    )

    G, N = args.G, args.N
    S, V = 120, 32
    B = 2 * N
    n_radial = 32
    Sp, Vp = _pad16(S), _pad16(V)
    Fp = Sp + 3 * Vp
    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    f32 = np.float32

    pos = jnp.asarray(rng.standard_normal((G, N, 3)).astype(f32)) * 0.4
    node_mask = jnp.ones((G, N), bool)
    bond_src = jnp.asarray(rng.integers(0, N, (G, B)).astype(np.int32))
    bond_dst = jnp.asarray(rng.integers(0, N, (G, B)).astype(np.int32))
    bond_mask = jnp.ones((G, B), bool)
    cutoff = jnp.asarray(1.0, jnp.float32)

    posm, bf, ebsT, ebd = packed_geometry_inputs(
        pos, node_mask, bond_src, bond_dst, bond_mask, cutoff,
        n_radial=n_radial, compute_dtype=cdt,
    )
    Sc, Gt, Vg = S, V, V
    out_blocks = ((Sc, 0), (Gt, 0), (Vg, 1))
    sn = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.1).astype(f32))
    w1 = sn(32 + n_radial, 64)
    b1 = sn(64)
    w2 = sn(64, 2 * S + 3 * V)
    b2 = sn(2 * S + 3 * V)
    bond0, bond1 = sn(32), sn(32)
    plp = {
        "w_0_0": sn(S, Sc), "w_3_0": sn(V, Sc),
        "w_0_1": sn(S, Gt), "w_3_1": sn(V, Gt),
        "w_1_2": sn(S, Vg), "w_2_2": sn(V, Vg), "w_4_2": sn(V, Vg),
    }
    l2p = {"w_0_0": sn(Sc, Sc), "w_1_1": sn(Vg, Vg)}
    skp = {"w_0_0": sn(S, Sc), "w_1_1": sn(V, Vg)}
    x0 = jnp.asarray(rng.standard_normal((G, Fp, N)).astype(f32)).astype(cdt)

    kw = dict(
        S=S, V=V, out_blocks=out_blocks, n_radial=n_radial, interpret=False,
        compute_dtype=cdt, transposed_in=True, transposed_out=True,
    )

    def timed(name, step_fn):
        @jax.jit
        def chain(x):
            return jax.lax.fori_loop(0, args.steps, lambda i, x: step_fn(x).astype(cdt), x)

        # tunnel-proof sync: a scalar VALUE fetch cannot ack early the way
        # block_until_ready does right after cold compiles (utils/timing.py)
        def run():
            return float(jnp.sum(chain(x0).astype(jnp.float32)))

        t0 = time.time()
        run()
        compile_s = time.time() - t0
        el = timed_chain(run, args.steps)
        if el is None:
            print(f"{name:>28}: TIMING FAILED (tunnel early-ack artifact)")
            return float("nan")
        dt = el / args.steps * 1e3
        out = chain(x0)
        print(f"{name:>28}: {dt:7.3f} ms/call  (compile {compile_s:.1f}s)  "
              f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}")
        return dt

    if args.blocks:
        blocks = [int(b) for b in args.blocks.split(",")]
    else:
        blocks = sorted({b for b in (8, 16, 28, 56, 112, _auto_dst_block(N)) if b and N % b == 0})

    # gen-3 baseline (precomputed ef; N <= 128 only)
    if N <= 128:
        ef3, bf3, ebsT3, ebd3 = packed_edge_features(
            pos, node_mask, bond_src, bond_dst, bond_mask, cutoff,
            n_radial=n_radial, compute_dtype=cdt,
        )
        timed(
            "gen-3 (ef precomp)",
            lambda x: packed_separable_conv_layer(
                x, ef3, bf3, ebsT3, ebd3, w1, b1, w2, b2, bond0, bond1, plp,
                S=S, V=V, out_blocks=out_blocks, n_radial=n_radial,
                compute_dtype=cdt, fuse_block=True, lin2_params=l2p,
                skip_params=skp, transposed_in=True, transposed_out=True,
            ),
        )

    for nb in blocks:
        timed(
            f"gen-4 Nblk={nb} (NB={N // nb})",
            lambda x, nb=nb: packed_fused_block_v2(
                x, posm, bf, ebsT, ebd, w1, b1, w2, b2, bond0, bond1,
                plp, l2p, skp, cutoff, dst_block=nb, **kw,
            ),
        )


if __name__ == "__main__":
    main()
