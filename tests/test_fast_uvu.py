"""SoA fast-path uvu conv: parity with the generic packed-irreps path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jamun_tpu.ops.conv import Conv
from jamun_tpu.ops.graph import dense_edge_data
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.radial import soft_one_hot_linspace
from jamun_tpu.ops.sh import spherical_harmonics
from jamun_tpu.utils.testing import make_test_batch

S, V = 24, 8
IRREPS_IN = Irreps(f"{S}x0e + {V}x1e")
IRREPS_OUT = Irreps("16x0e + 8x1e")
IRREPS_SH = Irreps("1x0e + 1x1e")


def test_fast_uvu_matches_generic():
    rng = np.random.default_rng(0)
    batch = make_test_batch(num_graphs=2, max_nodes=12, nodes_per_graph=[10, 12], scale=0.3)
    cutoff = jnp.asarray(0.8)

    def attr_fn(dist, bonded):
        radial = soft_one_hot_linspace(dist, 0.0, cutoff, 8, cutoff=True)
        return radial

    edges = dense_edge_data(
        batch.pos, batch.node_mask, batch.bond_src, batch.bond_dst, batch.bond_mask,
        cutoff, functools.partial(spherical_harmonics, IRREPS_SH), attr_fn,
    )
    x = jnp.asarray(rng.standard_normal((2, 12, IRREPS_IN.dim)).astype(np.float32))
    kwargs = dict(
        irreps_in=IRREPS_IN, irreps_out=IRREPS_OUT, irreps_sh=IRREPS_SH,
        edge_attr_dim=8, tensor_product="uvu",
    )
    generic = Conv(**kwargs, fast_path=False)
    fast = Conv(**kwargs, fast_path=True)
    params = generic.init(jax.random.PRNGKey(0), x, edges)
    out_g = np.asarray(jax.jit(generic.apply)(params, x, edges))
    out_f = np.asarray(jax.jit(fast.apply)(params, x, edges))
    np.testing.assert_allclose(out_f, out_g, atol=2e-5, rtol=1e-4)
