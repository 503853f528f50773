"""Fused kernel vs XLA fast path at Ophiuchus RESIDUE level (VERDICT r2 #5).

The Ophiuchus hierarchy runs spatial ConvBlocks over residues (R ~ 2-20 for
the reference's peptide systems, `/root/reference/src/jamun/model/arch/
ophiuchus.py:432-573` at `n_layers: 4` residue stages). The fused Pallas
ConvBlock kernel admits N >= 16 only (`packed_shape_bounds_ok`); this script
measures whether padding residue counts up to the guard is worth it, with
residue-level feature widths (irreps_hidden 64x0e + 64x1e from
`hydra_config/model/arch/ophiuchus.yaml`).

Timing rule (tunnel): dependency-chained fori_loop only.

Run: python scripts/bench_residue_kernel.py [--G 256] [--steps 50]
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
    ap.add_argument("--G", type=int, default=256)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import functools

    from jamun_tpu.ops.conv import ConvBlock
    from jamun_tpu.ops.graph import dense_edge_data
    from jamun_tpu.ops.irreps import Irreps
    from jamun_tpu.ops.radial import soft_one_hot_linspace
    from jamun_tpu.ops.sh import spherical_harmonics
    from jamun_tpu.utils.testing import make_test_batch

    S = V = 64  # residue-level widths (ophiuchus irreps_hidden 64x0e + 64x1e)
    irreps = Irreps(f"{S}x0e + {V}x1e")
    irreps_sh = Irreps("1x0e + 1x1e")
    cutoff = jnp.asarray(2.0)  # residue centroids are farther apart

    def attr_fn(dist, bonded):
        return soft_one_hot_linspace(dist, 0.0, cutoff, 32, cutoff=True)

    rng = np.random.default_rng(0)
    for R_real, R_pad in ((10, 16), (16, 16), (20, 20)):
        batch = make_test_batch(
            num_graphs=args.G, max_nodes=R_pad,
            nodes_per_graph=[R_real] * args.G, max_bonds=2 * R_pad, scale=1.0,
        )
        edges = dense_edge_data(
            batch.pos, batch.node_mask, batch.bond_src, batch.bond_dst,
            batch.bond_mask, cutoff,
            functools.partial(spherical_harmonics, irreps_sh), attr_fn,
        )
        x = jnp.asarray(
            rng.standard_normal((args.G, R_pad, irreps.dim)).astype(np.float32)
        ).astype(jnp.bfloat16)

        for use_pallas in (False, True):
            block = ConvBlock(
                irreps_in=irreps, irreps_out=irreps, irreps_sh=irreps_sh,
                edge_attr_dim=32, tensor_product="uvu",
                use_pallas=use_pallas, dtype=jnp.bfloat16,
            )
            params = block.init(jax.random.PRNGKey(0), x, edges)

            @jax.jit
            def chain(x0):
                def body(_, x):
                    return block.apply(params, x.astype(jnp.bfloat16), edges).astype(
                        jnp.bfloat16
                    )

                return jax.lax.fori_loop(0, args.steps, body, x0)

            # tunnel-proof sync via scalar value fetch (utils/timing.py)
            def run():
                return float(jnp.sum(chain(x).astype(jnp.float32)))

            t0 = time.time()
            run()
            comp = time.time() - t0
            el = timed_chain(run, args.steps)
            label = "kernel" if use_pallas else "xla   "
            if el is None:
                print(f"R={R_real:>3} pad={R_pad:>3} {label}: TIMING FAILED "
                      f"(tunnel early-ack artifact)", flush=True)
                continue
            dt = el / args.steps * 1e3
            out = chain(x)
            print(
                f"R={R_real:>3} pad={R_pad:>3} {label}: {dt:7.3f} ms/call "
                f"(G={args.G}, compile {comp:.1f}s) "
                f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}",
                flush=True,
            )


if __name__ == "__main__":
    main()
