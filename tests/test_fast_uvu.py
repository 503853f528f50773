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


def test_fast_uvu_gradient_parity():
    """Gradients through the fast path match the generic path (training uses it)."""
    rng = np.random.default_rng(1)
    batch = make_test_batch(num_graphs=2, max_nodes=12, scale=0.3)
    cutoff = jnp.asarray(0.8)

    def attr_fn(dist, bonded):
        return soft_one_hot_linspace(dist, 0.0, cutoff, 8, cutoff=True)

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

    def loss(conv):
        return lambda p, xx: jnp.sum(conv.apply(p, xx, edges) ** 2)

    g_ref = jax.jit(jax.grad(loss(generic), argnums=(0, 1)))(params, x)
    g_fast = jax.jit(jax.grad(loss(fast), argnums=(0, 1)))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fast)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4, rtol=1e-3)
