"""Runtime equivariance self-test util + Gate custom activation maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.utils.equivariance import assert_arch_equivariant, equivariance_error
from jamun_tpu.utils.testing import make_test_batch


def _arch_and_batch():
    from jamun_tpu.models.e3conv import E3Conv

    arch = E3Conv(
        irreps_hidden="8x0e + 4x1e", n_layers=2, edge_attr_dim=8,
        atom_type_embedding_dim=4, atom_code_embedding_dim=4,
        residue_code_embedding_dim=4, residue_index_embedding_dim=4,
        tensor_product="uvu",
    )
    batch = make_test_batch(num_graphs=2, max_nodes=10, scale=0.3)
    c_noise = jnp.asarray([jnp.log(0.04) / 4.0])
    cutoff = jnp.asarray(1.0)
    params = jax.jit(arch.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    return arch, params, batch, c_noise, cutoff


@pytest.mark.slow
def test_equivariance_check_rejects_vacuous_zero_output():
    """Fresh arch (zero output gain) must raise, not silently pass."""
    arch, params, batch, c_noise, cutoff = _arch_and_batch()
    with pytest.raises(ValueError, match="vacuous"):
        equivariance_error(jax.jit(lambda b: arch.apply(params, b, c_noise, cutoff)), batch)


@pytest.mark.slow
def test_equivariance_check_nonvacuous_passes():
    arch, params, batch, c_noise, cutoff = _arch_and_batch()
    params = jax.tree.map(lambda p: p + 0.5 if p.ndim == 0 else p, params)
    err = assert_arch_equivariant(
        jax.jit(lambda b: arch.apply(params, b, c_noise, cutoff)), batch, atol=1e-3
    )
    assert err < 1e-3


def test_equivariance_check_catches_broken_arch():
    """A non-equivariant function must fail the check."""
    batch = make_test_batch(num_graphs=2, max_nodes=10, scale=0.3)

    def broken(b):  # depends on absolute coordinates — not equivariant
        return b.pos * b.pos

    with pytest.raises(AssertionError, match="not equivariant"):
        assert_arch_equivariant(broken, batch, atol=1e-3)


def test_gate_custom_activation_maps():
    """act / act_gates overrides are applied (reference _gate.py:36-48)."""
    from jamun_tpu.ops.gate import Gate

    rng = np.random.default_rng(0)
    g_default = Gate("4x0e + 2x1e")
    g_custom = Gate("4x0e + 2x1e", act={1: jnp.tanh}, act_gates={1: jnp.tanh})
    x = jnp.asarray(rng.standard_normal((3, g_default.irreps_in.dim)).astype(np.float32))

    out_d = np.asarray(g_default(x))
    out_c = np.asarray(g_custom(x))
    # scalars: tanh vs leaky-relu
    scal = np.asarray(x[..., :4])
    np.testing.assert_allclose(out_c[..., :4], np.tanh(scal), rtol=1e-6)
    assert not np.allclose(out_d[..., :4], out_c[..., :4])
    # gated block: gates squashed by tanh vs sigmoid
    gates = np.asarray(x[..., 4:6])
    gated = np.asarray(x[..., 6:]).reshape(3, 2, 3)
    expect = (gated * np.tanh(gates)[..., None]).reshape(3, 6)
    np.testing.assert_allclose(out_c[..., 4:], expect, rtol=1e-5, atol=1e-6)
