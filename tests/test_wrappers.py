"""Tests for wrapper modules and pack/unpack helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.pack_unpack import axis_to_mul, mul_to_axis
from jamun_tpu.ops.wrappers import GateWrapper, LearnableSkipConnection


def test_mul_to_axis_roundtrip():
    irreps = Irreps("8x0e + 4x1e")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, irreps.dim)).astype(np.float32))
    factored, irreps_f = mul_to_axis(x, irreps, factor=4)
    assert factored.shape == (3, 4, irreps_f.dim)
    assert irreps_f.dim == 2 + 3
    back, irreps_b = axis_to_mul(factored, irreps_f)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)
    assert irreps_b.dim == irreps.dim


def test_gate_wrapper_equivariance():
    from jamun_tpu.ops.wigner import random_rotation

    irreps = Irreps("4x0e + 2x1e")
    mod = GateWrapper(irreps, irreps)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, irreps.dim)).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), x)
    f = jax.jit(mod.apply)
    R = random_rotation(rng)
    D = irreps.rotation_matrix(R).astype(np.float32)
    out = np.asarray(f(params, x))
    out_rot = np.asarray(f(params, x @ jnp.asarray(D.T)))
    np.testing.assert_allclose(out_rot, out @ D.T, atol=2e-4)


def test_learnable_skip():
    mod = LearnableSkipConnection()
    x1, x2 = jnp.ones((2, 3)), jnp.zeros((2, 3))
    params = mod.init(jax.random.PRNGKey(0), x1, x2)
    out = mod.apply(params, x1, x2)
    w = float(jax.nn.sigmoid(1.0))
    np.testing.assert_allclose(np.asarray(out), w, rtol=1e-5)
