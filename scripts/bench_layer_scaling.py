"""Decompose the walk step: fixed cost vs per-layer cost of the fused path.

Times the jitted denoiser score forward inside a 50-iteration loop for
n_layers in {1, 3, 5}; linear fit gives ms/layer and the fixed overhead
(edge features + initial projector + BAOAB/glue).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.utils.testing import make_test_batch

    G, SIGMA = 128, 0.04
    batch = make_test_batch(
        num_graphs=G, max_nodes=48, nodes_per_graph=[44] * G, max_bonds=96, scale=0.35
    )
    results = {}
    for n_layers in (1, 3, 5):
        arch = E3Conv(
            tensor_product="uvu", dtype=jnp.bfloat16, use_pallas=True, n_layers=n_layers
        )
        den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
        params = den.init(jax.random.PRNGKey(0), batch)

        @jax.jit
        def loop(params, y0):
            def body(_, y):
                s = den.score(params, batch.replace_pos(y), SIGMA)
                return y + 1e-6 * s

            return jax.lax.fori_loop(0, 50, body, y0)

        y0 = batch.pos
        t0 = time.perf_counter()
        jax.block_until_ready(loop(params, y0))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(params, y0))
        t = (time.perf_counter() - t0) / 50
        results[n_layers] = t * 1e3
        print(f"n_layers={n_layers}: compile {c:6.1f}s  {t*1e3:.3f} ms/forward", flush=True)

    ks = sorted(results)
    slope = (results[ks[-1]] - results[ks[0]]) / (ks[-1] - ks[0])
    fixed = results[ks[0]] - slope * ks[0]
    print(f"per-hidden-layer: {slope:.3f} ms; fixed (edge feats + projector + glue): {fixed:.3f} ms")


if __name__ == "__main__":
    main()
