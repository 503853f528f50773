"""ExperimentalTensorProduct equivariance + shape tests."""

import jax
import jax.numpy as jnp
import numpy as np

from jamun_tpu.ops.experimental_tp import ExperimentalTensorProduct, full_tensor_product
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.wigner import random_rotation


def test_full_tp_irreps():
    irreps1, irreps2 = Irreps("2x0e + 1x1e"), Irreps("1x0e + 1x1e")
    x1 = jnp.zeros((1, irreps1.dim))
    x2 = jnp.zeros((1, irreps2.dim))
    out, irreps_out = full_tensor_product(x1, x2, irreps1, irreps2)
    # (0e x 0e -> 0e)x2, (0e x 1e -> 1e)x2, (1e x 0e -> 1e), (1e x 1e -> 0e+1e+2e)
    assert out.shape[-1] == irreps_out.dim
    assert irreps_out.dim == 2 + 6 + 3 + 1 + 3 + 5


def test_experimental_tp_equivariance():
    irreps1, irreps2, irreps3 = Irreps("3x0e + 2x1e"), Irreps("1x0e + 1x1e"), Irreps("4x0e + 2x1e")
    tp = ExperimentalTensorProduct(irreps1, irreps2, irreps3)
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal((5, irreps1.dim)).astype(np.float32)
    x2 = rng.standard_normal((5, irreps2.dim)).astype(np.float32)
    w = rng.standard_normal((5, tp.weight_numel)).astype(np.float32)
    R = random_rotation(rng)
    D1, D2, D3 = (i.rotation_matrix(R).astype(np.float32) for i in (irreps1, irreps2, irreps3))
    f = jax.jit(tp)
    out = np.asarray(f(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(w)))
    out_rot = np.asarray(f(jnp.asarray(x1 @ D1.T), jnp.asarray(x2 @ D2.T), jnp.asarray(w)))
    np.testing.assert_allclose(out_rot, out @ D3.T, atol=3e-4)
