"""Tests for the TPU-native EquiFold contrib port (`jamun_tpu/ops/contrib/equifold.py`).

Covers (reference: `/root/reference/src/jamun/e3tools/contrib/equifold/`):
- SO(3) equivariance of Convnet and Equiformer (scalars invariant, vectors
  rotate) on masked dense pairs;
- mask semantics: features of padded src nodes never leak into valid outputs,
  and the masked softmax matches an explicit per-edge scatter-softmax;
- Convnet cross-check against an independent per-edge numpy evaluation of the
  same math (the reference's edge-list formulation) using identical params;
- SVLayerNorm / radial-basis unit behavior.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.ops.contrib import (
    BesselBasis,
    Convnet,
    Equiformer,
    RadialNN,
    SinusoidalBasis,
    SVLayerNorm,
    SVLinear,
)
from jamun_tpu.ops.wigner import random_rotation


def _radial_factory(**overrides):
    def factory(num_out_features, name=None):
        return RadialNN(
            num_out_features=num_out_features,
            rc=1.2,
            radial_num_basis=8,
            radial_num_hidden=16,
            radial_num_layers=2,
            name=name,
            **overrides,
        )

    return factory


def _make_inputs(key, G=2, N=12, S=8, n_valid=(12, 9)):
    k1, k2, k3 = jax.random.split(key, 3)
    pos = jax.random.normal(k1, (G, N, 3))
    s = jax.random.normal(k2, (G, N, S))
    v = jax.random.normal(k3, (G, N, S, 3))
    node_mask = np.zeros((G, N), dtype=bool)
    for g, nv in enumerate(n_valid):
        node_mask[g, :nv] = True
    node_mask = jnp.asarray(node_mask)
    pair_mask = node_mask[:, :, None] & node_mask[:, None, :]
    pair_mask = pair_mask & ~jnp.eye(N, dtype=bool)[None]
    return pos, s, v, node_mask, pair_mask


def _pair_geometry(pos):
    d = pos[:, :, None, :] - pos[:, None, :, :]  # i(dst) - j(src)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    rvec = d / r[..., None]
    return r, rvec


@pytest.mark.parametrize(
    "module",
    ["convnet", pytest.param("equiformer", marks=pytest.mark.slow)],
)
def test_equivariance(module):
    key = jax.random.PRNGKey(0)
    pos, s, v, node_mask, pair_mask = _make_inputs(key)
    r, rvec = _pair_geometry(pos)
    cutoff = jnp.exp(-r)

    if module == "convnet":
        mod = Convnet(nc_s=8, nc_v=8, radial_nn=_radial_factory(), div_factor=3.0)
    else:
        mod = Equiformer(nc_s=8, nc_v=8, radial_nn=_radial_factory(), num_heads=2)
    params = mod.init(jax.random.PRNGKey(1), s, v, pair_mask, r, rvec, cutoff)
    s_out, v_out = mod.apply(params, s, v, pair_mask, r, rvec, cutoff)

    R = jnp.asarray(random_rotation(np.random.default_rng(7)), dtype=jnp.float32)
    pos_r = pos @ R.T
    v_r = v @ R.T
    r2, rvec2 = _pair_geometry(pos_r)
    s_out_r, v_out_r = mod.apply(params, s, v_r, pair_mask, r2, rvec2, cutoff)

    np.testing.assert_allclose(np.asarray(s_out_r), np.asarray(s_out), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(v_out_r), np.asarray(v_out @ R.T), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("module", ["convnet", "equiformer"])
def test_masked_nodes_do_not_leak(module):
    key = jax.random.PRNGKey(2)
    pos, s, v, node_mask, pair_mask = _make_inputs(key, n_valid=(9, 7))
    r, rvec = _pair_geometry(pos)
    cutoff = jnp.exp(-r)

    if module == "convnet":
        mod = Convnet(nc_s=8, nc_v=8, radial_nn=_radial_factory(), div_factor=3.0)
    else:
        mod = Equiformer(nc_s=8, nc_v=8, radial_nn=_radial_factory(), num_heads=2)
    params = mod.init(jax.random.PRNGKey(1), s, v, pair_mask, r, rvec, cutoff)
    s_out, v_out = mod.apply(params, s, v, pair_mask, r, rvec, cutoff)

    # scramble features and positions of padded nodes
    junk = 1e3 * jax.random.normal(jax.random.PRNGKey(3), s.shape)
    s2 = jnp.where(node_mask[..., None], s, junk)
    v2 = jnp.where(node_mask[..., None, None], v, junk[..., None] * jnp.ones(3))
    pos2 = jnp.where(node_mask[..., None], pos, 50.0 + pos)
    r2, rvec2 = _pair_geometry(pos2)
    cutoff2 = jnp.exp(-r2)
    s_out2, v_out2 = mod.apply(params, s2, v2, pair_mask, r2, rvec2, cutoff2)

    m = np.asarray(node_mask)
    np.testing.assert_allclose(
        np.asarray(s_out2)[m], np.asarray(s_out)[m], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(v_out2)[m], np.asarray(v_out)[m], rtol=1e-4, atol=1e-4
    )


def test_convnet_matches_edge_list_reference():
    """Independent per-edge numpy evaluation of the Convnet math (the
    reference's scatter formulation, `_conv.py:40-98`) with the same params."""
    S = 4
    key = jax.random.PRNGKey(4)
    pos, s, v, node_mask, pair_mask = _make_inputs(key, G=1, N=6, S=S, n_valid=(6,))
    r, rvec = _pair_geometry(pos)
    div = 2.5

    mod = Convnet(nc_s=S, nc_v=S, radial_nn=_radial_factory(), div_factor=div)
    params = mod.init(jax.random.PRNGKey(5), s, v, pair_mask, r, rvec)
    s_out, v_out = mod.apply(params, s, v, pair_mask, r, rvec)

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    sn = np.asarray(s[0], dtype=np.float64)
    vn = np.asarray(v[0], dtype=np.float64)
    posn = np.asarray(pos[0], dtype=np.float64)
    mask = np.asarray(pair_mask[0])

    def sv_linear(pp, s_in, v_in):
        s_o = s_in @ pp["w_s"].T + pp.get("b_s", 0.0)
        v_o = np.einsum("ij,...jk->...ik", pp["w_v"], v_in)
        return s_o, v_o

    def silu(x):
        return x / (1.0 + np.exp(-x))

    def sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    def radial2(pp, dist):
        freqs = pp["BesselBasis_0"]["bessel_weights"]
        x = (2.0 / 1.2) * np.sin(freqs * dist / 1.2)
        n_dense = len([k for k in pp if k.startswith("Dense_")])
        for i in range(n_dense):
            d = pp[f"Dense_{i}"]
            x = x @ d["kernel"] + d["bias"]
            if i < n_dense - 1:
                x = silu(x)
        return x

    N = sn.shape[0]
    agg_s = np.zeros((N, S))
    agg_v = np.zeros((N, S, 3))
    for i in range(N):
        for j in range(N):
            if not mask[i, j]:
                continue
            dvec = posn[i] - posn[j]
            dist = math.sqrt(float(dvec @ dvec) + 1e-12)
            u = dvec / dist
            ss = sn[i] * sn[j]
            vv = np.sum(vn[i] * vn[j], axis=-1)
            sv = sn[i][:, None] * vn[j]
            vs = vn[i] * sn[j][:, None]
            s_p = np.concatenate([ss, vv])
            v_p = np.concatenate([sv, vs], axis=0)
            w = radial2(p["radial_nn1"], dist)
            s_p = w[: 2 * S] * s_p
            v_p = w[2 * S :][:, None] * v_p
            s_p, v_p = sv_linear(p["linear1"], s_p, v_p)
            gate = s_p[S:]
            s_p = silu(s_p[:S])
            v_p = sigmoid(gate)[:, None] * v_p

            ss = s_p
            vv = np.sum(v_p * u, axis=-1)
            sv = s_p[:, None] * u
            vs = v_p
            s_p = np.concatenate([ss, vv])
            v_p = np.concatenate([sv, vs], axis=0)
            w = radial2(p["radial_nn2"], dist)
            s_p = w[: 2 * S] * s_p
            v_p = w[2 * S :][:, None] * v_p
            s_p, v_p = sv_linear(p["linear2"], s_p, v_p)
            gate = s_p[S:]
            s_p = silu(s_p[:S])
            v_p = sigmoid(gate)[:, None] * v_p

            agg_s[i] += s_p
            agg_v[i] += v_p

    agg_s /= div
    agg_v /= div
    s_r, v_r = sv_linear(p["linear3"], agg_s, agg_v)
    s_sk, v_sk = sv_linear(p["linear_self"], sn, vn)
    want_s = s_sk + s_r
    want_v = v_sk + v_r

    np.testing.assert_allclose(np.asarray(s_out[0]), want_s, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v_out[0]), want_v, rtol=1e-4, atol=1e-4)


def test_equiformer_attention_rows_normalize():
    """Attention weights over each dst's valid srcs sum to 1 (masked softmax
    semantics of the reference's scatter_softmax)."""
    from jamun_tpu.ops.contrib.equifold import _masked_softmax_over_src

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3, 5))  # [G, Ni, H, Nj]
    mask = jnp.asarray(
        np.random.default_rng(0).random((2, 5, 1, 5)) > 0.4
    ) | jnp.zeros((2, 5, 3, 5), dtype=bool)
    a = _masked_softmax_over_src(z, mask)
    sums = np.asarray(jnp.sum(a, axis=-1))
    has_any = np.asarray(mask.any(axis=-1))
    np.testing.assert_allclose(sums[has_any], 1.0, rtol=1e-5)
    assert np.all(np.asarray(a)[~np.asarray(mask)] == 0.0)
    # empty rows -> all zeros, no NaN
    assert np.all(np.isfinite(np.asarray(a)))


def test_sv_layer_norm_moments():
    s = jax.random.normal(jax.random.PRNGKey(0), (7, 16)) * 3.0 + 2.0
    v = jax.random.normal(jax.random.PRNGKey(1), (7, 5, 3)) * 4.0
    ln = SVLayerNorm(16, 5)
    params = ln.init(jax.random.PRNGKey(2), s, v)
    s_o, v_o = ln.apply(params, s, v)
    np.testing.assert_allclose(np.asarray(jnp.mean(s_o, axis=-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.mean(s_o**2, axis=-1)), 1.0, rtol=1e-2)
    rms = np.asarray(jnp.sum(v_o**2, axis=(-1, -2)) / 5)
    np.testing.assert_allclose(rms, 1.0, rtol=1e-2)


def test_radial_bases():
    r = jnp.linspace(0.05, 1.1, 13)
    bb = BesselBasis(rc=1.2, radial_num_basis=6)
    params = bb.init(jax.random.PRNGKey(0), r)
    out = bb.apply(params, r)
    assert out.shape == (13, 6)
    want = (2.0 / 1.2) * np.sin(np.arange(1, 7) * math.pi * np.asarray(r)[:, None] / 1.2)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)

    sb = SinusoidalBasis(xmax=2.0, d=8)
    out = sb.apply({}, r)
    assert out.shape == (13, 8)
    arg = np.arange(1, 5) * math.pi * np.asarray(r)[:, None] / 2.0
    want = np.concatenate([np.sin(arg), np.cos(arg)], axis=-1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)


@pytest.mark.kernelheavy
def test_equiformer_jit_and_grad():
    key = jax.random.PRNGKey(8)
    pos, s, v, node_mask, pair_mask = _make_inputs(key, G=1, N=8, S=4, n_valid=(8,))
    r, rvec = _pair_geometry(pos)
    mod = Equiformer(nc_s=4, nc_v=4, radial_nn=_radial_factory(), num_heads=2)
    params = mod.init(jax.random.PRNGKey(9), s, v, pair_mask, r, rvec)

    @jax.jit
    def loss(p, s, v):
        s_o, v_o = mod.apply(p, s, v, pair_mask, r, rvec)
        return jnp.sum(s_o**2) + jnp.sum(v_o**2)

    g = jax.grad(loss)(params, s, v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in leaves)
