"""Measure the bonds-stream share of the fused ConvBlock kernel.

The kernel body runs the full message/radial-MLP instruction sequence TWICE:
once on the dense [*, N^2] pair lanes, once on the tiny [*, 2N] bond lanes
(`_conv_block_body` `stream(bf, ...)`). If per-op fixed cost dominates the
bond stream, merging bond pairs into the dense lane dimension is a real
lever. This times the real fused layer chained, with the bonds stream
switched off via the in-process measurement global
`packed_conv._SKIP_BONDS_FOR_MEASUREMENT` (wrong numerics, timing only;
deliberately NOT an env var so it cannot leak into real runs).

Run: python scripts/bench_bonds_share.py [--n 44] [--g 256] [--steps 50]
     python scripts/bench_bonds_share.py --skip-bonds ...
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=44)
    ap.add_argument("--g", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--skip-bonds", action="store_true",
                    help="drop the bond stream (WRONG numerics; timing only)")
    args = ap.parse_args()

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    if args.skip_bonds:
        import jamun_tpu.ops.pallas.packed_conv as packed_conv

        packed_conv._SKIP_BONDS_FOR_MEASUREMENT = True
    from jamun_tpu.ops.conv import ConvBlock
    from jamun_tpu.ops.graph import dense_edge_data
    from jamun_tpu.ops.irreps import Irreps
    from jamun_tpu.ops.radial import soft_one_hot_linspace
    from jamun_tpu.ops.sh import spherical_harmonics
    from jamun_tpu.utils.testing import make_test_batch

    S, V = 120, 32  # flagship widths
    irreps = Irreps(f"{S}x0e + {V}x1e")
    irreps_sh = Irreps("1x0e + 1x1e")
    cutoff = jnp.asarray(1.0)
    attr_dim = 64
    radial_dim = (attr_dim + 1) // 2

    bonded_dim = attr_dim // 2
    bond_embed = np.random.default_rng(7).standard_normal((2, bonded_dim)).astype(np.float32)

    def attr_fn(dist, bonded):
        radial = soft_one_hot_linspace(
            dist, 0.0, cutoff, radial_dim, basis="gaussian", cutoff=True
        )
        bond_vec = jnp.asarray(bond_embed[1] if bonded else bond_embed[0])
        bond_part = jnp.broadcast_to(bond_vec, dist.shape + (bonded_dim,))
        return jnp.concatenate([bond_part, radial], axis=-1)

    batch = make_test_batch(
        num_graphs=args.g, max_nodes=args.n,
        nodes_per_graph=[args.n] * args.g, max_bonds=2 * args.n, scale=0.35,
    )
    edges = dense_edge_data(
        batch.pos, batch.node_mask, batch.bond_src, batch.bond_dst,
        batch.bond_mask, cutoff,
        functools.partial(spherical_harmonics, irreps_sh), attr_fn,
        dense=True,
        bond0_embed=jnp.asarray(bond_embed[0]),
        bond1_embed=jnp.asarray(bond_embed[1]),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((args.g, args.n, irreps.dim)).astype(np.float32)
    ).astype(jnp.bfloat16)

    block = ConvBlock(
        irreps_in=irreps, irreps_out=irreps, irreps_sh=irreps_sh,
        edge_attr_dim=attr_dim, tensor_product="uvu",
        use_pallas=True, dtype=jnp.bfloat16,
    )
    params = block.init(jax.random.PRNGKey(0), x, edges)

    @jax.jit
    def chain(x0):
        def body(_, x):
            return block.apply(params, x.astype(jnp.bfloat16), edges).astype(jnp.bfloat16)

        return jax.lax.fori_loop(0, args.steps, body, x0)

    from jamun_tpu.utils.timing import timed_chain

    def run():
        float(jnp.sum(chain(x).astype(jnp.float32)))

    t0 = time.time()
    run()
    comp = time.time() - t0
    dt = timed_chain(run, args.steps)
    tag = "NOBONDS" if args.skip_bonds else "full   "
    if dt is None:
        print(f"N={args.n} G={args.g} {tag}: TIMING FAILED (tunnel early-ack artifact)",
              flush=True)
        return
    out = chain(x)
    print(
        f"N={args.n} G={args.g} {tag}: {dt / args.steps * 1e3:7.3f} ms/layer-call "
        f"(compile {comp:.1f}s) "
        f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}",
        flush=True,
    )


if __name__ == "__main__":
    main()
