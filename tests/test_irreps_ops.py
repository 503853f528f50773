"""Property tests for the irreps engine: algebra, equivariance, normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.ops.cg import real_wigner_3j
from jamun_tpu.ops.gate import Gate
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.layer_norm import equivariant_layer_norm
from jamun_tpu.ops.linear import IrrepsLinear
from jamun_tpu.ops.sh import spherical_harmonics
from jamun_tpu.ops.tensor_product import fully_connected_tp, depthwise_tp, scale_irreps
from jamun_tpu.ops.wigner import random_rotation, wigner_D_from_matrix


def test_irreps_parsing():
    ir = Irreps("120x0e + 32x1e")
    assert ir.dim == 120 + 96
    assert ir.num_irreps == 152
    assert ir.lmax == 1
    assert repr(ir) == "120x0e + 32x1e"
    assert Irreps("1x1o")[0].ir.p == -1


def test_w3j_l1_conventions():
    # (1,1,0): dot product / sqrt(3); (1,1,1): Levi-Civita / sqrt(6).
    c = real_wigner_3j(1, 1, 0)[:, :, 0]
    np.testing.assert_allclose(c, np.eye(3) / np.sqrt(3), atol=1e-12)
    eps = real_wigner_3j(1, 1, 1) * np.sqrt(6)
    assert abs(abs(eps[0, 1, 2]) - 1) < 1e-12
    np.testing.assert_allclose(eps, -np.transpose(eps, (1, 0, 2)), atol=1e-12)


@pytest.mark.parametrize("l", [1, 2, 3])
def test_sh_equivariance(l):
    rng = np.random.default_rng(l)
    v = rng.standard_normal((7, 3)).astype(np.float32)
    R = random_rotation(rng)
    D = wigner_D_from_matrix(l, R).astype(np.float32)
    Y = np.asarray(spherical_harmonics(f"1x{l}e", jnp.asarray(v)))
    YR = np.asarray(spherical_harmonics(f"1x{l}e", jnp.asarray(v @ R.T.astype(np.float32))))
    np.testing.assert_allclose(YR, Y @ D.T, atol=2e-5)
    np.testing.assert_allclose((Y**2).sum(-1), 2 * l + 1, rtol=1e-5)


def _equivariance_check(fn, irreps_in, irreps_out, seed=0, atol=2e-4):
    rng = np.random.default_rng(seed)
    irreps_in, irreps_out = Irreps(irreps_in), Irreps(irreps_out)
    x = rng.standard_normal((5, irreps_in.dim)).astype(np.float32)
    R = random_rotation(rng)
    Din = irreps_in.rotation_matrix(R).astype(np.float32)
    Dout = irreps_out.rotation_matrix(R).astype(np.float32)
    fn = jax.jit(fn)  # eager dispatch is pathologically slow in this env
    y = np.asarray(fn(jnp.asarray(x)))
    y_rot = np.asarray(fn(jnp.asarray(x @ Din.T)))
    np.testing.assert_allclose(y_rot, y @ Dout.T, atol=atol)


def test_linear_equivariance():
    irreps_in, irreps_out = Irreps("4x0e + 3x1e + 2x2e"), Irreps("5x0e + 2x1e + 1x2e")
    mod = IrrepsLinear(irreps_in, irreps_out)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, irreps_in.dim)))
    _equivariance_check(lambda x: mod.apply(params, x), irreps_in, irreps_out)


def test_linear_variance():
    # N(0,1) inputs -> ~unit output variance (component normalization).
    irreps = Irreps("64x0e + 64x1e")
    mod = IrrepsLinear(irreps, irreps)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, irreps.dim)))
    x = jax.random.normal(jax.random.PRNGKey(1), (512, irreps.dim))
    y = jax.jit(mod.apply)(params, x)
    assert 0.5 < float(jnp.var(y)) < 2.0


def test_fully_connected_tp_equivariance():
    irreps1, irreps2, irreps3 = Irreps("3x0e + 2x1e"), Irreps("1x0e + 1x1e"), Irreps("4x0e + 3x1e + 1x2e")
    tp = fully_connected_tp(irreps1, irreps2, irreps3)
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((6, irreps1.dim)).astype(np.float32)
    x2 = rng.standard_normal((6, irreps2.dim)).astype(np.float32)
    w = rng.standard_normal((6, tp.weight_numel)).astype(np.float32)
    R = random_rotation(rng)
    D1 = irreps1.rotation_matrix(R).astype(np.float32)
    D2 = irreps2.rotation_matrix(R).astype(np.float32)
    D3 = irreps3.rotation_matrix(R).astype(np.float32)
    tp_j = jax.jit(tp)
    out = np.asarray(tp_j(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)))
    out_rot = np.asarray(tp_j(jnp.asarray(x1 @ D1.T), jnp.asarray(x2 @ D2.T), jnp.asarray(w)))
    np.testing.assert_allclose(out_rot, out @ D3.T, atol=2e-4)


def test_fully_connected_tp_variance():
    irreps1, irreps2, irreps3 = Irreps("64x0e + 32x1e"), Irreps("1x0e + 1x1e"), Irreps("64x0e + 32x1e")
    tp = fully_connected_tp(irreps1, irreps2, irreps3)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x1 = jax.random.normal(k1, (256, irreps1.dim))
    x2 = jax.random.normal(k2, (256, irreps2.dim))
    w = jax.random.normal(k3, (256, tp.weight_numel))
    y = jax.jit(tp)(x1, x2, w)
    v = float(jnp.var(y))
    assert 0.3 < v < 3.0, v


def test_depthwise_tp_equivariance():
    irreps1, irreps2 = Irreps("3x0e + 2x1e"), Irreps("1x0e + 1x1e")
    tp, irreps_dtp = depthwise_tp(irreps1, irreps2, Irreps("1x0e + 1x1e"))
    rng = np.random.default_rng(1)
    x1 = rng.standard_normal((4, irreps1.dim)).astype(np.float32)
    x2 = rng.standard_normal((4, irreps2.dim)).astype(np.float32)
    w = rng.standard_normal((4, tp.weight_numel)).astype(np.float32)
    R = random_rotation(rng)
    D1, D2, D3 = (i.rotation_matrix(R).astype(np.float32) for i in (irreps1, irreps2, irreps_dtp))
    tp_j = jax.jit(tp)
    out = np.asarray(tp_j(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)))
    out_rot = np.asarray(tp_j(jnp.asarray(x1 @ D1.T), jnp.asarray(x2 @ D2.T), jnp.asarray(w)))
    np.testing.assert_allclose(out_rot, out @ D3.T, atol=2e-4)


def test_gate_equivariance():
    irreps_out = Irreps("8x0e + 4x1e")
    gate = Gate(irreps_out)
    _equivariance_check(gate, gate.irreps_in, gate.irreps_out, atol=1e-4)


def test_layer_norm_equivariance():
    irreps = Irreps("8x0e + 4x1e + 2x2e")
    _equivariance_check(
        lambda x: equivariant_layer_norm(x, irreps), irreps, irreps, atol=1e-4
    )


def test_scale_irreps():
    irreps = Irreps("2x0e + 1x1e")
    x = jnp.arange(5.0)[None]
    s = jnp.asarray([[2.0, 3.0, 4.0]])
    out = scale_irreps(x, s, irreps)
    np.testing.assert_allclose(np.asarray(out)[0], [0, 3, 8, 12, 16])
