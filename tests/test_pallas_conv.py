"""Fused Pallas conv kernels: numerical parity against the XLA path
(interpret mode on CPU), for both the lane-packed and plane variants."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _edges(batch, cutoff, bond0, bond1=None):
    if bond1 is None:
        bond1 = jnp.ones((32,))

    def attr_fn(dist, bonded):
        bond_part = jnp.broadcast_to(bond0 if not bonded else bond1, dist.shape + (32,))
        radial = soft_one_hot_linspace(dist, 0.0, cutoff, 32, basis="gaussian", cutoff=True)
        return jnp.concatenate([bond_part, radial], axis=-1)

    return dense_edge_data(
        batch.pos, batch.node_mask, batch.bond_src, batch.bond_dst, batch.bond_mask,
        cutoff, functools.partial(spherical_harmonics, IRREPS_SH), attr_fn,
        dense=True, bond0_embed=bond0, bond1_embed=bond1,
    )


@pytest.mark.parametrize("variant", ["packed", "plane"])
def test_pallas_conv_matches_xla(variant):
    rng = np.random.default_rng(0)
    batch = make_test_batch(num_graphs=2, max_nodes=16, nodes_per_graph=[14, 16], scale=0.3)
    cutoff = jnp.asarray(0.8)
    bond0 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    edges = _edges(batch, cutoff, bond0)
    x = jnp.asarray(rng.standard_normal((2, 16, IRREPS_IN.dim)).astype(np.float32))

    conv_ref = Conv(
        irreps_in=IRREPS_IN, irreps_out=IRREPS_OUT, irreps_sh=IRREPS_SH,
        edge_attr_dim=64, tensor_product="uvu", use_pallas=False,
    )
    conv_pal = Conv(
        irreps_in=IRREPS_IN, irreps_out=IRREPS_OUT, irreps_sh=IRREPS_SH,
        edge_attr_dim=64, tensor_product="uvu", use_pallas=True, pallas_variant=variant,
    )
    params = conv_ref.init(jax.random.PRNGKey(0), x, edges)

    out_ref = np.asarray(jax.jit(conv_ref.apply)(params, x, edges))
    out_pal = np.asarray(jax.jit(conv_pal.apply)(params, x, edges))
    np.testing.assert_allclose(out_pal, out_ref, atol=2e-4, rtol=1e-3)


def test_packed_conv_scalar_only_matches_xla():
    """V = 0 (the embedding projector shape) — lane-packed kernel only."""
    rng = np.random.default_rng(1)
    batch = make_test_batch(num_graphs=2, max_nodes=16, nodes_per_graph=[14, 16], scale=0.3)
    cutoff = jnp.asarray(0.8)
    bond0 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    edges = _edges(batch, cutoff, bond0)
    irreps_in = Irreps("24x0e")
    x = jnp.asarray(rng.standard_normal((2, 16, irreps_in.dim)).astype(np.float32))

    kwargs = dict(
        irreps_in=irreps_in, irreps_out=IRREPS_OUT, irreps_sh=IRREPS_SH,
        edge_attr_dim=64, tensor_product="uvu",
    )
    conv_ref = Conv(**kwargs, use_pallas=False, fast_path=False)  # generic einsum path
    conv_fast = Conv(**kwargs, use_pallas=False, fast_path=True)  # SoA V=0 fast path
    conv_pal = Conv(**kwargs, use_pallas=True, pallas_variant="packed")
    params = conv_ref.init(jax.random.PRNGKey(0), x, edges)

    out_ref = np.asarray(jax.jit(conv_ref.apply)(params, x, edges))
    out_fast = np.asarray(jax.jit(conv_fast.apply)(params, x, edges))
    out_pal = np.asarray(jax.jit(conv_pal.apply)(params, x, edges))
    np.testing.assert_allclose(out_fast, out_ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out_pal, out_ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "variant",
    ["packed", pytest.param("plane", marks=pytest.mark.slow)],
)
@pytest.mark.kernelheavy
def test_pallas_e3conv_matches_xla(variant):
    from jamun_tpu.models.e3conv import E3Conv

    batch = make_test_batch(num_graphs=2, max_nodes=16, scale=0.3)
    c_noise = jnp.asarray([jnp.log(0.04) / 4.0])
    cutoff = jnp.asarray(1.0)
    kwargs = dict(
        irreps_hidden=f"{S}x0e + {V}x1e", n_layers=2, edge_attr_dim=64,
        atom_type_embedding_dim=4, atom_code_embedding_dim=4,
        residue_code_embedding_dim=4, residue_index_embedding_dim=4,
        tensor_product="uvu",
    )
    ref = E3Conv(**kwargs, use_pallas=False)
    pal = E3Conv(**kwargs, use_pallas=True, pallas_variant=variant)
    params = jax.jit(ref.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    # nonzero output gain so the comparison is nontrivial
    params = jax.tree.map(lambda p: p + 0.5 if p.ndim == 0 else p, params)
    out_ref = np.asarray(jax.jit(ref.apply)(params, batch, c_noise, cutoff))
    out_pal = np.asarray(jax.jit(pal.apply)(params, batch, c_noise, cutoff))
    np.testing.assert_allclose(out_pal, out_ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_pallas_e3conv_equivariance():
    """The fused kernel path preserves E(3)-equivariance of the full model."""
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.utils.equivariance import assert_arch_equivariant

    batch = make_test_batch(num_graphs=2, max_nodes=16, scale=0.3)
    c_noise = jnp.asarray([jnp.log(0.04) / 4.0])
    cutoff = jnp.asarray(1.0)
    arch = E3Conv(
        irreps_hidden=f"{S}x0e + {V}x1e", n_layers=2, edge_attr_dim=64,
        atom_type_embedding_dim=4, atom_code_embedding_dim=4,
        residue_code_embedding_dim=4, residue_index_embedding_dim=4,
        tensor_product="uvu", use_pallas=True,
    )
    params = jax.jit(arch.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    params = jax.tree.map(lambda p: p + 0.5 if p.ndim == 0 else p, params)
    apply = jax.jit(lambda b: arch.apply(params, b, c_noise, cutoff))
    assert_arch_equivariant(apply, batch, atol=1e-3)


@pytest.mark.slow
def test_checkpoint_cross_path_sampling_consistency():
    """A checkpoint trained on the XLA path samples consistently when loaded
    into the kernel path (the sample CLI's default behavior)."""
    import optax

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.sampling.walkjump import SingleMeasurementSampler
    from jamun_tpu.train.distributions import ConstantSigma
    from jamun_tpu.train.state import create_train_state, make_train_step

    kwargs = dict(
        irreps_hidden=f"{S}x0e + {V}x1e", n_layers=2, edge_attr_dim=64,
        atom_type_embedding_dim=4, atom_code_embedding_dim=4,
        residue_code_embedding_dim=4, residue_index_embedding_dim=4,
        tensor_product="uvu",
    )
    batch = make_test_batch(num_graphs=4, max_nodes=16, scale=0.3)
    den_train = Denoiser(
        E3Conv(**kwargs, use_pallas=False),
        DenoiserConfig(max_radius=1.0, average_squared_distance=0.3),
    )
    opt = optax.adam(2e-3)
    state = create_train_state(den_train, opt, batch, seed=0)
    step = jax.jit(make_train_step(den_train, opt, ConstantSigma(0.05)))
    for _ in range(5):
        state, _ = step(state, batch)

    cfg = MCMCConfig(delta=0.05, steps=21, save_every_n_steps=5, score_fn_clip=100.0)
    bs = SingleMeasurementSampler(mcmc=BAOAB(cfg), sigma=0.05)
    mask = batch.node_mask[..., None].astype(batch.pos.dtype)
    y0 = batch.pos + 0.05 * jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape) * mask

    outs = {}
    for pallas in (False, True):
        den = Denoiser(
            E3Conv(**kwargs, use_pallas=pallas),
            DenoiserConfig(max_radius=1.0, average_squared_distance=0.3),
        )
        outs[pallas] = jax.jit(
            lambda key, y, den=den: den.score(state.ema_params, batch.replace_pos(y), 0.05)
        )(jax.random.PRNGKey(2), y0)
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(outs[False]), atol=5e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_pallas_with_scan_layers():
    """nn.scan over the hidden layers slices per-layer params correctly into
    the fused kernel path."""
    from jamun_tpu.models.e3conv import E3Conv

    batch = make_test_batch(num_graphs=2, max_nodes=16, scale=0.3)
    c_noise = jnp.asarray([jnp.log(0.04) / 4.0])
    cutoff = jnp.asarray(1.0)
    kwargs = dict(
        irreps_hidden=f"{S}x0e + {V}x1e", n_layers=2, edge_attr_dim=64,
        atom_type_embedding_dim=4, atom_code_embedding_dim=4,
        residue_code_embedding_dim=4, residue_index_embedding_dim=4,
        tensor_product="uvu", scan_layers=True,
    )
    ref = E3Conv(**kwargs, use_pallas=False)
    pal = E3Conv(**kwargs, use_pallas=True)
    params = jax.jit(ref.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    params = jax.tree.map(lambda p: p + 0.5 if p.ndim == 0 else p, params)
    out_ref = np.asarray(jax.jit(ref.apply)(params, batch, c_noise, cutoff))
    out_pal = np.asarray(jax.jit(pal.apply)(params, batch, c_noise, cutoff))
    np.testing.assert_allclose(out_pal, out_ref, atol=5e-4, rtol=1e-3)


@pytest.mark.kernelheavy
def test_kernel_path_trainable_grad_parity():
    """The hand-written backward kernel (custom VJP) matches XLA autodiff of
    the reference ConvBlock path for every parameter and the input.

    Deliberately in the FAST tier: it is the only backward-kernel coverage
    there (the train-step integration and chained-layout variants are slow),
    and the backward kernel is the training default on the performance arch."""
    import jax.tree_util as jtu

    from jamun_tpu.ops.conv import ConvBlock

    rng = np.random.default_rng(0)
    batch = make_test_batch(num_graphs=2, max_nodes=16, nodes_per_graph=[14, 16], scale=0.3)
    cutoff = jnp.asarray(0.8)
    bond0 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bond1 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    edges = _edges(batch, cutoff, bond0, bond1)
    x = jnp.asarray(rng.standard_normal((2, 16, IRREPS_IN.dim)).astype(np.float32))

    kwargs = dict(
        irreps_in=IRREPS_IN, irreps_out=IRREPS_OUT, irreps_sh=IRREPS_SH,
        edge_attr_dim=64, tensor_product="uvu",
    )
    blk_ref = ConvBlock(**kwargs, use_pallas=False)
    blk_pal = ConvBlock(**kwargs, use_pallas=True)
    params = blk_ref.init(jax.random.PRNGKey(0), x, edges)
    cot = jnp.asarray(rng.standard_normal((2, 16, IRREPS_OUT.dim)).astype(np.float32))

    gr = jax.grad(lambda p, xx: jnp.sum(blk_ref.apply(p, xx, edges) * cot), argnums=(0, 1))(params, x)
    gp = jax.grad(lambda p, xx: jnp.sum(blk_pal.apply(p, xx, edges) * cot), argnums=(0, 1))(params, x)
    errs = jtu.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) / (1e-6 + jnp.max(jnp.abs(a)))), gr, gp
    )
    worst = max(jtu.tree_leaves(errs))
    assert worst < 1e-4, f"worst relative grad error {worst}"


@pytest.mark.slow
def test_kernel_path_train_step():
    """A full train step runs on the kernel path (forward kernel + backward
    kernel) and matches the XLA-path loss. Slow tier: the fast tier already
    covers backward-kernel grad parity (test_kernel_path_trainable_grad_parity);
    this adds the optimizer-integration compile on top (~70 s CPU)."""
    import optax

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.train.distributions import ConstantSigma
    from jamun_tpu.train.state import create_train_state, make_train_step

    kwargs = dict(
        irreps_hidden=f"{S}x0e + {V}x1e", n_layers=1, edge_attr_dim=64,
        atom_type_embedding_dim=4, atom_code_embedding_dim=4,
        residue_code_embedding_dim=4, residue_index_embedding_dim=4,
        tensor_product="uvu",
    )
    batch = make_test_batch(num_graphs=2, max_nodes=16)
    opt = optax.adam(1e-3)
    losses = {}
    for pallas in (False, True):
        den = Denoiser(
            E3Conv(**kwargs, use_pallas=pallas),
            DenoiserConfig(max_radius=1.0, average_squared_distance=0.3),
        )
        state = create_train_state(den, opt, batch, seed=0)
        step = jax.jit(make_train_step(den, opt, ConstantSigma(0.05)))
        for _ in range(3):
            state, aux = step(state, batch)
        losses[pallas] = float(aux["loss"])
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-3)


@pytest.mark.slow
def test_chained_transposed_grad_parity():
    """The zero-transpose chained kernel mode (transposed scaling/skip + head,
    round 3) matches XLA autodiff at the full-E3Conv level for params AND the
    forward value."""
    import jax.tree_util as jtu

    from jamun_tpu.models.e3conv import E3Conv

    batch = make_test_batch(num_graphs=2, max_nodes=16, scale=0.3)
    c_noise = jnp.asarray([jnp.log(0.04) / 4.0])
    cutoff = jnp.asarray(1.0)
    kwargs = dict(
        irreps_hidden=f"{S}x0e + {V}x1e", n_layers=2, edge_attr_dim=64,
        atom_type_embedding_dim=4, atom_code_embedding_dim=4,
        residue_code_embedding_dim=4, residue_index_embedding_dim=4,
        tensor_product="uvu",
    )
    ref = E3Conv(**kwargs, use_pallas=False)
    pal = E3Conv(**kwargs, use_pallas=True)
    params = jax.jit(ref.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    params = jax.tree.map(lambda p: p + 0.5 if p.ndim == 0 else p, params)

    rng = np.random.default_rng(7)
    cot = jnp.asarray(rng.standard_normal(
        (2, batch.pos.shape[1], Irreps("1x1e").dim)
    ).astype(np.float32))

    out_ref = np.asarray(jax.jit(ref.apply)(params, batch, c_noise, cutoff))
    out_pal = np.asarray(jax.jit(pal.apply)(params, batch, c_noise, cutoff))
    np.testing.assert_allclose(out_pal, out_ref, atol=5e-4, rtol=1e-3)

    gr = jax.grad(lambda p: jnp.sum(ref.apply(p, batch, c_noise, cutoff) * cot))(params)
    gp = jax.grad(lambda p: jnp.sum(pal.apply(p, batch, c_noise, cutoff) * cot))(params)
    errs = jtu.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) / (1e-6 + jnp.max(jnp.abs(a)))), gr, gp
    )
    worst = max(jtu.tree_leaves(errs))
    assert worst < 5e-4, f"worst relative grad error {worst}"


def _tiled_e3conv_pair(N):
    from jamun_tpu.models.e3conv import E3Conv

    kwargs = dict(
        irreps_hidden=f"{S}x0e + {V}x1e", n_layers=2, edge_attr_dim=64,
        atom_type_embedding_dim=4, atom_code_embedding_dim=4,
        residue_code_embedding_dim=4, residue_index_embedding_dim=4,
        tensor_product="uvu",
    )
    ref = E3Conv(**kwargs, use_pallas=False)
    pal = E3Conv(**kwargs, use_pallas=True)
    batch = make_test_batch(
        num_graphs=2, max_nodes=N, nodes_per_graph=[N - 6, N], max_bonds=2 * N, scale=0.6
    )
    c_noise = jnp.asarray([jnp.log(0.04) / 4.0])
    cutoff = jnp.asarray(0.9)
    params = jax.jit(ref.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    params = jax.tree.map(lambda p: p + 0.5 if p.ndim == 0 else p, params)
    return ref, pal, params, batch, c_noise, cutoff


@pytest.mark.slow
def test_tiled_kernel_forward_parity_beyond_128():
    """The gen-4 dst-block-tiled kernel (N = 160 > the old N <= 128 VMEM
    ceiling, 2 dst blocks) matches the XLA path at the full-E3Conv level."""
    from jamun_tpu.ops.pallas.packed_conv import _auto_dst_block

    assert _auto_dst_block(160) == 80  # 2 dst blocks: the tiling is exercised
    ref, pal, params, batch, c_noise, cutoff = _tiled_e3conv_pair(160)
    out_ref = np.asarray(jax.jit(ref.apply)(params, batch, c_noise, cutoff))
    out_pal = np.asarray(jax.jit(pal.apply)(params, batch, c_noise, cutoff))
    np.testing.assert_allclose(out_pal, out_ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_tiled_kernel_grad_parity_beyond_128():
    """jax.grad through the tiled regime (N > 128) takes the XLA-reference
    VJP fallback and matches XLA autodiff of the module path."""
    import jax.tree_util as jtu

    ref, pal, params, batch, c_noise, cutoff = _tiled_e3conv_pair(160)
    rng = np.random.default_rng(3)
    cot = jnp.asarray(
        rng.standard_normal((2, batch.pos.shape[1], Irreps("1x1e").dim)).astype(np.float32)
    )
    gr = jax.grad(lambda p: jnp.sum(ref.apply(p, batch, c_noise, cutoff) * cot))(params)
    gp = jax.grad(lambda p: jnp.sum(pal.apply(p, batch, c_noise, cutoff) * cot))(params)
    errs = jtu.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b)) / (1e-6 + jnp.max(jnp.abs(a)))), gr, gp
    )
    worst = max(jtu.tree_leaves(errs))
    assert worst < 5e-4, f"worst relative grad error {worst}"


@pytest.mark.kernelheavy
def test_v2_xla_reference_matches_kernel():
    """The shared-body XLA reference (`xla_reference=True`) agrees with the
    interpret-mode kernel bit-for-bit-close — the compile-anywhere oracle."""
    from jamun_tpu.ops.pallas.packed_conv import (
        packed_fused_block_v2,
        packed_geometry_inputs,
    )

    rng = np.random.default_rng(5)
    N = 32
    batch = make_test_batch(
        num_graphs=2, max_nodes=N, nodes_per_graph=[N - 3, N], max_bonds=2 * N, scale=0.5
    )
    cutoff = jnp.asarray(0.9)
    n_radial = 32
    posm, bf, ebsT, ebd = packed_geometry_inputs(
        batch.pos, batch.node_mask, batch.bond_src, batch.bond_dst,
        batch.bond_mask, cutoff, n_radial=n_radial,
    )
    x = jnp.asarray(rng.standard_normal((2, N, S + 3 * V)).astype(np.float32))
    Sc, Gt, Vg = 16, 8, 8
    out_blocks = ((Sc, 0), (Gt, 0), (Vg, 1))
    w1 = jnp.asarray(rng.standard_normal((32 + n_radial, 64)).astype(np.float32)) * 0.2
    b1 = jnp.asarray(rng.standard_normal(64).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.standard_normal((64, 2 * S + 3 * V)).astype(np.float32)) * 0.2
    b2 = jnp.asarray(rng.standard_normal(2 * S + 3 * V).astype(np.float32)) * 0.1
    bond0 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bond1 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    plp = {
        "w_0_0": jnp.asarray(rng.standard_normal((S, Sc)).astype(np.float32)),
        "w_3_0": jnp.asarray(rng.standard_normal((V, Sc)).astype(np.float32)),
        "w_0_1": jnp.asarray(rng.standard_normal((S, Gt)).astype(np.float32)),
        "w_3_1": jnp.asarray(rng.standard_normal((V, Gt)).astype(np.float32)),
        "w_1_2": jnp.asarray(rng.standard_normal((S, Vg)).astype(np.float32)),
        "w_2_2": jnp.asarray(rng.standard_normal((V, Vg)).astype(np.float32)),
        "w_4_2": jnp.asarray(rng.standard_normal((V, Vg)).astype(np.float32)),
    }
    l2p = {
        "w_0_0": jnp.asarray(rng.standard_normal((Sc, Sc)).astype(np.float32)),
        "w_1_1": jnp.asarray(rng.standard_normal((Vg, Vg)).astype(np.float32)),
    }
    skp = {
        "w_0_0": jnp.asarray(rng.standard_normal((S, Sc)).astype(np.float32)),
        "w_1_1": jnp.asarray(rng.standard_normal((V, Vg)).astype(np.float32)),
    }
    kw = dict(S=S, V=V, out_blocks=out_blocks, n_radial=n_radial, interpret=True)
    args = (x, posm, bf, ebsT, ebd, w1, b1, w2, b2, bond0, bond1, plp, l2p, skp, cutoff)
    out_k = np.asarray(packed_fused_block_v2(*args, **kw))
    out_r = np.asarray(packed_fused_block_v2(*args, **kw, xla_reference=True))
    np.testing.assert_allclose(out_k, out_r, atol=1e-5, rtol=1e-5)


def test_bundled_agg_parity_and_grouping():
    """_bundled_agg returns per-block aggregates identical to per-block dots,
    and bundles narrow blocks only in the narrow-lane regime (<= 4096)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from jamun_tpu.ops.pallas.packed_conv import _bundled_agg

    rng = np.random.default_rng(0)
    P, N = 24 * 24, 24
    rhs = jnp.asarray(rng.normal(size=(P, N)).astype(np.float32))
    rows = [128, 128, 32, 32, 32, 32, 32, 32, 32, 1]
    msgs = [jnp.asarray(rng.normal(size=(r, P)).astype(np.float32)) for r in rows]
    prec = jax.lax.Precision.HIGHEST
    outs = _bundled_agg(msgs, rhs, prec)
    assert [o.shape[0] for o in outs] == rows
    for o, m in zip(outs, msgs):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(m) @ np.asarray(rhs), rtol=1e-4, atol=5e-4
        )

    # wide-lane regime: no concatenation (singleton bundles keep traces
    # identical to the pre-bundling kernel; Mosaic pathology guard)
    wideP = 112 * 112
    wrhs = jnp.zeros((wideP, 8), jnp.float32)
    wmsgs = [jnp.zeros((32, wideP), jnp.float32) for _ in range(3)]
    jaxpr = jax.make_jaxpr(lambda ms: _bundled_agg(ms, wrhs, prec))(wmsgs)
    assert "concatenate" not in str(jaxpr)


@pytest.mark.kernelheavy
def test_transposed_flags_degrade_gracefully():
    """transposed_in/out on a config the fused-block kernel does NOT support
    (uvw tensor product here) must fall back to the standard path with layout
    adapters, not raise — guards against E3Conv._chained_ok drifting from
    ConvBlock._fused_block_supported."""
    from jamun_tpu.ops.conv import ConvBlock
    from jamun_tpu.ops.pallas.packed_conv import (
        pack_features_transposed,
        unpack_features_transposed,
    )

    rng = np.random.default_rng(0)
    batch = make_test_batch(num_graphs=2, max_nodes=16, nodes_per_graph=[14, 16], scale=0.3)
    cutoff = jnp.asarray(0.8)
    bond0 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    edges = _edges(batch, cutoff, bond0)
    # uvw tensor product: _pallas_supported is False by construction, so the
    # transposed call exercises the degradation branch on every backend
    kwargs = dict(
        irreps_in=IRREPS_IN, irreps_out=IRREPS_OUT, irreps_sh=IRREPS_SH,
        edge_attr_dim=64, tensor_product="uvw", use_pallas=True,
    )
    blk = ConvBlock(**kwargs)
    x = jnp.asarray(rng.standard_normal((2, 16, IRREPS_IN.dim)).astype(np.float32))
    params = blk.init(jax.random.PRNGKey(0), x, edges)
    out_plain = blk.apply(params, x, edges)

    xT = pack_features_transposed(x, S, V, jnp.float32)
    outT = blk.apply(params, xT, edges, transposed_in=True, transposed_out=True)
    out_rt = unpack_features_transposed(outT, 16, 8)
    np.testing.assert_allclose(
        np.asarray(out_rt), np.asarray(out_plain), atol=1e-5, rtol=1e-5
    )


def test_bwd_residual_mode_grad_equivalence(monkeypatch):
    """Residual-forward training mode (the backward kernel streams in the
    forward's h32/aggsum residuals instead of recomputing the forward,
    `packed_conv.bwd_residuals_enabled`) produces the same gradients as
    recompute mode — the two are the same math with reassociated storage."""
    import jax.tree_util as jtu

    from jamun_tpu.ops.conv import ConvBlock
    from jamun_tpu.ops.pallas import packed_conv as pc

    rng = np.random.default_rng(3)
    batch = make_test_batch(num_graphs=2, max_nodes=16, nodes_per_graph=[14, 16], scale=0.3)
    cutoff = jnp.asarray(0.8)
    bond0 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bond1 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    edges = _edges(batch, cutoff, bond0, bond1)
    x = jnp.asarray(rng.standard_normal((2, 16, IRREPS_IN.dim)).astype(np.float32))

    blk = ConvBlock(
        irreps_in=IRREPS_IN, irreps_out=IRREPS_OUT, irreps_sh=IRREPS_SH,
        edge_attr_dim=64, tensor_product="uvu", use_pallas=True,
    )
    params = blk.init(jax.random.PRNGKey(0), x, edges)
    cot = jnp.asarray(rng.standard_normal((2, 16, IRREPS_OUT.dim)).astype(np.float32))

    grads = {}
    for mode in ("1", "light", "0"):
        monkeypatch.setattr(pc, "_RESID_ENV_SEEN", [])
        monkeypatch.setenv("JAMUN_BWD_RESID", mode)
        grads[mode] = jax.grad(
            lambda p, xx: jnp.sum(blk.apply(p, xx, edges) * cot), argnums=(0, 1)
        )(params, x)
    for mode in ("1", "light"):
        errs = jtu.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b)) / (1e-6 + jnp.max(jnp.abs(a)))),
            grads[mode], grads["0"],
        )
        worst = max(jtu.tree_leaves(errs))
        assert worst < 1e-6, f"{mode} vs recompute worst relative grad diff {worst}"


def test_bwd_residuals_policy(monkeypatch):
    from jamun_tpu.ops.pallas import packed_conv as pc

    monkeypatch.setattr(pc, "_RESID_ENV_SEEN", [])
    monkeypatch.delenv("JAMUN_BWD_RESID", raising=False)
    assert pc.bwd_residuals_enabled(48) is True      # 4AA bucket
    assert pc.bwd_residuals_enabled(64) is True
    assert pc.bwd_residuals_enabled(112) == "light"  # 5AA: O(N) residuals
    # (paired with K_bwd=8 — K=16 light misses the 128 MiB part, round 4c)
    assert pc._default_k_bwd(112) == 8 and pc._default_k_bwd(48) == 16
    assert pc.bwd_residuals_enabled(256) is False    # tiled path never reads this

    # process-constant guard: flipping the env mid-process raises
    monkeypatch.setenv("JAMUN_BWD_RESID", "0")
    with pytest.raises(RuntimeError):
        pc.bwd_residuals_enabled(48)

    monkeypatch.setattr(pc, "_RESID_ENV_SEEN", [])
    monkeypatch.setenv("JAMUN_BWD_RESID", "1")
    assert pc.bwd_residuals_enabled(112) is True


def test_fwd_pair_split_parity(monkeypatch):
    """JAMUN_FWD_SPLIT chunked dense-pair execution (the MXU/VPU-overlap
    lever, `packed_conv._fwd_pair_split`) is an exact K-dimension split of
    the aggregation contraction: forward outputs and gradients match the
    unsplit kernel, including the residual-forward training mode whose h32
    residuals are lane-concatenated across chunks."""
    import jax.tree_util as jtu

    from jamun_tpu.ops.conv import ConvBlock
    from jamun_tpu.ops.pallas import packed_conv as pc

    rng = np.random.default_rng(11)
    batch = make_test_batch(num_graphs=2, max_nodes=16, nodes_per_graph=[14, 16], scale=0.3)
    cutoff = jnp.asarray(0.8)
    bond0 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    bond1 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    edges = _edges(batch, cutoff, bond0, bond1)
    x = jnp.asarray(rng.standard_normal((2, 16, IRREPS_IN.dim)).astype(np.float32))

    blk = ConvBlock(
        irreps_in=IRREPS_IN, irreps_out=IRREPS_OUT, irreps_sh=IRREPS_SH,
        edge_attr_dim=64, tensor_product="uvu", use_pallas=True,
    )
    params = blk.init(jax.random.PRNGKey(0), x, edges)
    cot = jnp.asarray(rng.standard_normal((2, 16, IRREPS_OUT.dim)).astype(np.float32))

    outs, grads = {}, {}
    for split in (1, 2):  # N=16: split=4 gives 64-lane chunks, gated off
        monkeypatch.setattr(pc, "_FWD_SPLIT_OVERRIDE", [split])
        # residual mode on: the split path's chunked-h32 concat feeds the bwd
        monkeypatch.setattr(pc, "_RESID_ENV_SEEN", [])
        monkeypatch.setenv("JAMUN_BWD_RESID", "1")
        outs[split] = np.asarray(jax.jit(blk.apply)(params, x, edges))
        grads[split] = jax.grad(
            lambda p, xx: jnp.sum(blk.apply(p, xx, edges) * cot), argnums=(0, 1)
        )(params, x)

    for split in (2,):
        np.testing.assert_allclose(outs[split], outs[1], atol=1e-5, rtol=1e-5)
        errs = jtu.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b)) / (1e-6 + jnp.max(jnp.abs(a)))),
            grads[split], grads[1],
        )
        worst = max(jtu.tree_leaves(errs))
        assert worst < 1e-5, f"split={split} worst relative grad diff {worst}"


def test_fwd_pair_split_policy(monkeypatch):
    from jamun_tpu.ops.pallas import packed_conv as pc

    monkeypatch.setattr(pc, "_K_ENV_SEEN", {})
    monkeypatch.delenv("JAMUN_FWD_SPLIT", raising=False)
    assert pc._fwd_pair_split(112) == 1          # default: off

    monkeypatch.setattr(pc, "_K_ENV_SEEN", {})
    monkeypatch.setenv("JAMUN_FWD_SPLIT", "2")
    assert pc._fwd_pair_split(112) == 2          # Lc = 6272 = 49x128: aligned
    assert pc._fwd_pair_split(15) == 1           # N not divisible -> off

    monkeypatch.setattr(pc, "_FWD_SPLIT_OVERRIDE", [4])
    # N=112 s=4 -> Lc=3136, a 64-lane offset Mosaic's concat rejects -> off
    assert pc._fwd_pair_split(112) == 1
    assert pc._fwd_pair_split(128) == 4          # Lc = 4096: aligned
