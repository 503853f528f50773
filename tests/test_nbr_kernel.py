"""Fused sparse-conv Pallas kernel (ops/pallas/nbr_conv.py) — parity and
dispatch tests (CPU interpret mode).

The kernel replaces `radial_nn + fast_uvu_messages_nbr` in the capped-neighbor
execution path (the TPU stand-in for torch_cluster + torch_scatter at
`/root/reference/src/jamun/model/denoiser.py:149`,
`/root/reference/src/jamun/e3tools/nn/_conv.py:116-117`).
"""

import jax
import jax.numpy as jnp
import pytest

from jamun_tpu.models.e3conv import E3Conv
from jamun_tpu.ops.fast_uvu import fast_uvu_messages_nbr
from jamun_tpu.ops.pallas.nbr_conv import nbr_uvu_conv, supports_nbr_conv
from jamun_tpu.utils.testing import make_test_batch


def _radial_mlp(attr, w1, b1, w2, b2):
    h = jax.nn.silu(attr @ w1 + b1)
    return h @ w2 + b2


@pytest.mark.parametrize(
    "G,N,K,S,V",
    [
        (2, 40, 8, 16, 4),     # generic small shape
        (1, 130, 16, 24, 8),   # N not a tile multiple — exercises dst padding
        (2, 32, 8, 12, 0),     # V == 0 (embedding projector shape)
    ],
)
def test_kernel_parity_vs_fast_uvu(G, N, K, S, V):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 9)
    C = S + 3 * V
    W = 2 * S + 3 * V
    x = jax.random.normal(ks[0], (G, N, C))
    sh = jax.random.normal(ks[1], (G, N, K, 4))
    attr = jax.random.normal(ks[2], (G, N, K, 64))
    idx = jax.random.randint(ks[3], (G, N, K), 0, N)
    mask = (jax.random.uniform(ks[4], (G, N, K)) > 0.3).astype(jnp.float32)
    w1 = jax.random.normal(ks[5], (64, 64)) * 0.2
    b1 = jax.random.normal(ks[6], (64,)) * 0.1
    w2 = jax.random.normal(ks[7], (64, W)) * 0.2
    b2 = jax.random.normal(ks[8], (W,)) * 0.1

    ref, dref = fast_uvu_messages_nbr(
        x, sh, _radial_mlp(attr, w1, b1, w2, b2), idx, mask, S=S, V=V
    )
    out, deg = nbr_uvu_conv(
        x, sh, attr, idx, mask, w1, b1, w2, b2, S=S, V=V, interpret=True
    )
    assert out.shape == ref.shape
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-4
    assert float(jnp.max(jnp.abs(dref - deg))) < 1e-5


def test_kernel_masked_rows_zero():
    """Fully masked dst rows (padding atoms) must aggregate to exactly zero."""
    G, N, K, S, V = 1, 16, 8, 8, 4
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (G, N, S + 3 * V))
    sh = jax.random.normal(ks[1], (G, N, K, 4))
    attr = jax.random.normal(ks[2], (G, N, K, 64))
    idx = jax.random.randint(ks[3], (G, N, K), 0, N)
    mask = jnp.ones((G, N, K)).at[:, N // 2 :, :].set(0.0)
    w1 = jax.random.normal(ks[4], (64, 64)) * 0.2
    w2 = jax.random.normal(ks[5], (64, 2 * S + 3 * V)) * 0.2
    out, deg = nbr_uvu_conv(
        x, sh, attr, idx, mask, w1, jnp.zeros(64), w2,
        jnp.zeros(2 * S + 3 * V), S=S, V=V, interpret=True,
    )
    assert float(jnp.max(jnp.abs(out[:, N // 2 :]))) == 0.0
    assert float(jnp.max(jnp.abs(deg[:, N // 2 :]))) == 0.0


def test_supports_nbr_conv():
    assert supports_nbr_conv(120, 32, 4, 64, 64, 32)
    assert supports_nbr_conv(56, 0, 4, 64, 64, 32)
    assert not supports_nbr_conv(120, 32, 4, 64, 64, 12)  # K % 8 != 0
    assert not supports_nbr_conv(120, 32, 9, 64, 64, 32)  # l > 1 sh
    assert not supports_nbr_conv(120, 32, 4, 32, 32, 32)  # non-default attr


def _make_models(**overrides):
    kw = dict(
        irreps_hidden="24x0e + 8x1e",
        n_layers=2,
        tensor_product="uvu",
        neighbor_mode="nbr",
        neighbor_cap=8,
    )
    kw.update(overrides)
    return E3Conv(use_pallas=False, **kw), E3Conv(use_pallas=True, **kw)


def test_e3conv_nbr_kernel_parity():
    """Whole-model: sparse XLA path vs sparse kernel path, same params."""
    batch = make_test_batch(
        num_graphs=2, max_nodes=40, nodes_per_graph=[36, 40], max_bonds=48
    )
    m_xla, m_ker = _make_models()
    c_noise, cutoff = jnp.array(0.1), jnp.array(1.2)
    params = m_xla.init(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    o_xla = m_xla.apply(params, batch, c_noise, cutoff)
    o_ker = m_ker.apply(params, batch, c_noise, cutoff)
    assert float(jnp.max(jnp.abs(o_xla - o_ker))) < 1e-4


def test_e3conv_nbr_kernel_training_falls_back():
    """training=True keeps the (differentiable) XLA sparse path: gradients
    exist and match the use_pallas=False model exactly."""
    batch = make_test_batch(
        num_graphs=1, max_nodes=24, nodes_per_graph=[24], max_bonds=30
    )
    m_xla, m_ker = _make_models()
    c_noise, cutoff = jnp.array(0.1), jnp.array(1.2)
    params = m_xla.init(jax.random.PRNGKey(0), batch, c_noise, cutoff)

    def loss(m):
        def f(p):
            return jnp.sum(m.apply(p, batch, c_noise, cutoff, training=True) ** 2)

        return f

    g_xla = jax.grad(loss(m_xla))(params)
    g_ker = jax.grad(loss(m_ker))(params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g_xla, g_ker
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_e3conv_nbr_kernel_kill_switch(monkeypatch):
    """JAMUN_NBR_KERNEL=0 disables the kernel (outputs still match since the
    XLA path is the fallback — this asserts the env gate is honored by
    checking the kernel module is never invoked)."""
    import jamun_tpu.ops.pallas.nbr_conv as mod

    calls = []
    orig = mod.nbr_uvu_conv
    monkeypatch.setattr(
        mod, "nbr_uvu_conv", lambda *a, **k: calls.append(1) or orig(*a, **k)
    )
    monkeypatch.setenv("JAMUN_NBR_KERNEL", "0")
    batch = make_test_batch(
        num_graphs=1, max_nodes=24, nodes_per_graph=[24], max_bonds=30
    )
    _, m_ker = _make_models()
    c_noise, cutoff = jnp.array(0.1), jnp.array(1.2)
    params = m_ker.init(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    m_ker.apply(params, batch, c_noise, cutoff)
    assert calls == []
