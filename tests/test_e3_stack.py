"""Whole-model stack kernel (ops/pallas/e3_stack.py): parity with the
layer-by-layer fused path on identical params (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.models.e3conv import E3Conv
from jamun_tpu.utils.testing import make_test_batch

ARCH = dict(
    tensor_product="uvu",
    n_layers=2,
    irreps_hidden="32x0e + 16x1e",
    use_pallas=True,
)


def _setup(dtype=None):
    base = E3Conv(**ARCH, dtype=dtype)
    stack = E3Conv(**ARCH, dtype=dtype, fused_stack=True)
    batch = make_test_batch(num_graphs=2, max_nodes=16, nodes_per_graph=[14, 16], scale=0.3)
    c_noise = jnp.asarray([jnp.log(0.04) / 4.0])
    cutoff = jnp.asarray(1.0)
    params = base.init(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    # nonzero output gain so the comparison is non-vacuous
    params = jax.tree.map(lambda p: p + 0.7 if p.ndim == 0 else p, params)
    return base, stack, params, batch, c_noise, cutoff


@pytest.mark.kernelheavy
def test_fused_stack_matches_layerwise():
    base, stack, params, batch, c_noise, cutoff = _setup()
    out_ref = np.asarray(jax.jit(base.apply)(params, batch, c_noise, cutoff))
    out_stk = np.asarray(jax.jit(stack.apply)(params, batch, c_noise, cutoff))
    assert np.abs(out_ref).max() > 1e-4  # non-vacuous
    np.testing.assert_allclose(out_stk, out_ref, atol=2e-5, rtol=1e-4)


# NOTE: no bf16 variant here — the CPU backend cannot execute BF16xBF16->F32
# dots (DotThunk UNIMPLEMENTED), same as every other kernel test in this
# suite; bf16 stack parity is exercised on the TPU by scripts/bench_sizes.py
# (--stack vs default) and the sample CLI.


@pytest.mark.kernelheavy
def test_fused_stack_denoiser_score():
    """The stack path drives the full Denoiser.score (the walk's hot call)."""
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig

    _, stack, params, batch, _, _ = _setup()
    den_ref = Denoiser(
        E3Conv(**ARCH), DenoiserConfig(max_radius=1.0, average_squared_distance=0.5)
    )
    den_stk = Denoiser(
        E3Conv(**ARCH, fused_stack=True),
        DenoiserConfig(max_radius=1.0, average_squared_distance=0.5),
    )
    dp = den_ref.init(jax.random.PRNGKey(1), batch)
    dp = jax.tree.map(lambda p: p + 0.7 if p.ndim == 0 else p, dp)
    s_ref = np.asarray(jax.jit(lambda p, b: den_ref.score(p, b, 0.05))(dp, batch))
    s_stk = np.asarray(jax.jit(lambda p, b: den_stk.score(p, b, 0.05))(dp, batch))
    assert np.abs(s_ref).max() > 1e-3
    np.testing.assert_allclose(s_stk, s_ref, atol=2e-4, rtol=1e-4)


@pytest.mark.kernelheavy
def test_stack_gate_rejects_unsupported():
    """scan_layers / multi-sigma c_noise fall back to the layerwise path."""
    stack_scan = E3Conv(**{**ARCH, "n_layers": 2}, fused_stack=True, scan_layers=True)
    batch = make_test_batch(num_graphs=1, max_nodes=16, scale=0.3)
    c_noise = jnp.asarray([0.1])
    cutoff = jnp.asarray(1.0)
    params = stack_scan.init(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    out = stack_scan.apply(params, batch, c_noise, cutoff)  # must not raise
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.kernelheavy
def test_stack_non_tile_aligned_head_widths():
    """Head packing pads BOTH dims: S=40 is not a 16-multiple, so the l=0
    final-head rows [mul, 40] need column padding to Sp=48. Regression for
    the stackpad column-pad crash."""
    arch = dict(
        tensor_product="uvu", n_layers=1, irreps_hidden="40x0e + 16x1e",
        use_pallas=True,
    )
    base = E3Conv(**arch, irreps_out="1x0e + 1x1e")
    stack = E3Conv(**arch, irreps_out="1x0e + 1x1e", fused_stack=True)
    batch = make_test_batch(num_graphs=1, max_nodes=16, scale=0.3)
    c_noise = jnp.asarray([0.1])
    cutoff = jnp.asarray(1.0)
    params = base.init(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    params = jax.tree.map(lambda p: p + 0.7 if p.ndim == 0 else p, params)
    out_ref = np.asarray(jax.jit(base.apply)(params, batch, c_noise, cutoff))
    out_stk = np.asarray(jax.jit(stack.apply)(params, batch, c_noise, cutoff))
    assert np.abs(out_ref).max() > 1e-5
    np.testing.assert_allclose(out_stk, out_ref, atol=2e-5, rtol=1e-4)


def test_stack_gate_rejects_odd_parity_output():
    """1x1o output has no head params (parity mismatch in IrrepsLinear) —
    the stack gate must fall back to the layerwise path, not KeyError."""
    stack = E3Conv(
        tensor_product="uvu", n_layers=1, irreps_hidden="32x0e + 16x1e",
        use_pallas=True, fused_stack=True, irreps_out="1x1o",
    )
    batch = make_test_batch(num_graphs=1, max_nodes=16, scale=0.3)
    c_noise = jnp.asarray([0.1])
    cutoff = jnp.asarray(1.0)
    params = stack.init(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    out = stack.apply(params, batch, c_noise, cutoff)  # must not raise
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.kernelheavy
def test_stack_odd_unaligned_n():
    """Odd N (17) — the exact-N padding regime bench.py now defaults to
    (N=44/19); guards the iota/eye-row/pair-index logic off 8-multiples."""
    arch = dict(tensor_product="uvu", n_layers=1, irreps_hidden="32x0e + 16x1e",
                use_pallas=True)
    base = E3Conv(**arch)
    stack = E3Conv(**arch, fused_stack=True)
    batch = make_test_batch(num_graphs=1, max_nodes=17, nodes_per_graph=[17], scale=0.3)
    c_noise = jnp.asarray([0.1])
    cutoff = jnp.asarray(1.0)
    params = base.init(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    params = jax.tree.map(lambda p: p + 0.7 if p.ndim == 0 else p, params)
    out_ref = np.asarray(jax.jit(base.apply)(params, batch, c_noise, cutoff))
    out_stk = np.asarray(jax.jit(stack.apply)(params, batch, c_noise, cutoff))
    assert np.abs(out_ref).max() > 1e-5
    np.testing.assert_allclose(out_stk, out_ref, atol=2e-5, rtol=1e-4)
