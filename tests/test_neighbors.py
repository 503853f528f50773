"""Sparse capped-neighbor path (ops/neighbors.py) — the large-N execution
format. TPU replacement for torch_cluster's radius_graph cap
(`/root/reference/src/jamun/model/denoiser.py:149`, max_num_neighbors=32).

Parity contract: with cap >= max in-cutoff degree the sparse path computes the
SAME edge set as the dense masked-adjacency path, so E3Conv outputs (and
gradients) must match the dense path to float tolerance.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.models.e3conv import E3Conv, neighbor_mode_auto
from jamun_tpu.ops.graph import dense_edge_data
from jamun_tpu.ops.neighbors import capped_neighbor_lists, neighbor_edge_data
from jamun_tpu.utils.testing import make_test_batch

CUTOFF = jnp.asarray(1.0)


def _dense_adj(batch, cutoff=CUTOFF):
    pos, mask = jnp.asarray(batch.pos), jnp.asarray(batch.node_mask)
    d = jnp.linalg.norm(pos[:, None, :, :] - pos[:, :, None, :] + 1e-12, axis=-1)
    eye = jnp.eye(pos.shape[1], dtype=bool)[None]
    return np.asarray((d < cutoff) & mask[:, :, None] & mask[:, None, :] & ~eye)


def test_capped_lists_match_dense_edges():
    """cap >= N: the kept edge set equals the dense adjacency; overflow = 0."""
    batch = make_test_batch(num_graphs=3, max_nodes=12, seed=1)
    adj = _dense_adj(batch)
    G, N = adj.shape[:2]
    nbr_idx, nbr_mask, overflow = jax.jit(
        functools.partial(capped_neighbor_lists, radial_cutoff=CUTOFF, cap=N)
    )(jnp.asarray(batch.pos), jnp.asarray(batch.node_mask))
    nbr_idx, nbr_mask = np.asarray(nbr_idx), np.asarray(nbr_mask)
    assert np.all(np.asarray(overflow) == 0)
    got = np.zeros_like(adj)
    for g in range(G):
        for i in range(N):
            got[g, i, nbr_idx[g, i][nbr_mask[g, i]]] = True
    np.testing.assert_array_equal(got, adj)


def test_capped_lists_keep_nearest_and_count_overflow():
    """cap < degree: the K kept sources are the K nearest in-cutoff ones and
    overflow counts exactly the dropped edges."""
    batch = make_test_batch(num_graphs=2, max_nodes=16, seed=2, scale=0.15)
    adj = _dense_adj(batch)
    pos = np.asarray(batch.pos)
    cap = 4
    nbr_idx, nbr_mask, overflow = capped_neighbor_lists(
        jnp.asarray(batch.pos), jnp.asarray(batch.node_mask), CUTOFF, cap
    )
    nbr_idx, nbr_mask = np.asarray(nbr_idx), np.asarray(nbr_mask)
    deg = adj.sum(-1)
    np.testing.assert_array_equal(
        np.asarray(overflow), np.maximum(deg - cap, 0).sum(-1).astype(np.int32)
    )
    for g in range(adj.shape[0]):
        for i in range(adj.shape[1]):
            kept = set(nbr_idx[g, i][nbr_mask[g, i]].tolist())
            assert len(kept) == min(deg[g, i], cap)
            d = np.linalg.norm(pos[g] - pos[g, i], axis=-1)
            d[~adj[g, i]] = np.inf
            nearest = set(np.argsort(d)[: len(kept)].tolist())
            assert kept == nearest


def test_neighbor_edge_data_features_match_dense():
    """Per-edge sh/attr features gathered by the sparse path equal the dense
    panel's features at the same (dst, src) slots."""
    batch = make_test_batch(num_graphs=2, max_nodes=10, seed=3)

    def sh_fn(v):
        n = jnp.linalg.norm(v + 1e-12, axis=-1, keepdims=True)
        return jnp.concatenate([jnp.ones_like(n), v / jnp.maximum(n, 1e-9)], axis=-1)

    def attr_fn(d, bonded):
        return jnp.stack([d, d**2 + float(bonded)], axis=-1)

    common = dict(
        bond_src=jnp.asarray(batch.bond_src),
        bond_dst=jnp.asarray(batch.bond_dst),
        bond_mask=jnp.asarray(batch.bond_mask),
        radial_cutoff=CUTOFF,
        sh_fn=sh_fn,
        attr_fn=attr_fn,
    )
    dense = dense_edge_data(
        jnp.asarray(batch.pos), jnp.asarray(batch.node_mask), dense=True, **common
    )
    sparse, overflow = neighbor_edge_data(
        jnp.asarray(batch.pos), jnp.asarray(batch.node_mask), cap=batch.pos.shape[1], **common
    )
    assert np.all(np.asarray(overflow) == 0)
    idx, msk = np.asarray(sparse.nbr_idx), np.asarray(sparse.nbr_mask) > 0
    sh_d, at_d = np.asarray(dense.sh_dense), np.asarray(dense.attr_dense)
    sh_s, at_s = np.asarray(sparse.sh_nbr), np.asarray(sparse.attr_nbr)
    for g in range(idx.shape[0]):
        for i in range(idx.shape[1]):
            for k in np.nonzero(msk[g, i])[0]:
                j = idx[g, i, k]
                np.testing.assert_allclose(sh_s[g, i, k], sh_d[g, i, j], atol=1e-6)
                np.testing.assert_allclose(at_s[g, i, k], at_d[g, i, j], atol=1e-6)
    # bonded edge features are identical objects in both paths
    np.testing.assert_allclose(np.asarray(sparse.sh_bond), np.asarray(dense.sh_bond))


def _make_model(tensor_product):
    return dict(
        irreps_hidden="8x0e + 4x1e",
        n_layers=2,
        edge_attr_dim=8,
        atom_type_embedding_dim=4,
        atom_code_embedding_dim=4,
        residue_code_embedding_dim=4,
        residue_index_embedding_dim=4,
        tensor_product=tensor_product,
    )


@pytest.mark.parametrize("tensor_product", ["uvu", "uvw"])
def test_e3conv_nbr_parity_with_dense(tensor_product):
    """Uncapped sparse mode == dense mode, fwd AND grads. 'uvu' exercises the
    fast_uvu_messages_nbr SoA path, 'uvw' the generic gathered-TP fallback."""
    batch = make_test_batch(num_graphs=2, max_nodes=10, seed=4)
    c_noise = jnp.asarray([jnp.log(0.04) / 4])
    kw = _make_model(tensor_product)
    dense_arch = E3Conv(neighbor_mode="dense", **kw)
    nbr_arch = E3Conv(neighbor_mode="nbr", neighbor_cap=batch.pos.shape[1], **kw)
    params = jax.jit(dense_arch.init)(jax.random.PRNGKey(0), batch, c_noise, CUTOFF)
    params = jax.tree.map(lambda p: p + 0.3 if p.ndim == 0 else p, params)

    ref = np.asarray(jax.jit(dense_arch.apply)(params, batch, c_noise, CUTOFF))
    out = np.asarray(jax.jit(nbr_arch.apply)(params, batch, c_noise, CUTOFF))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)

    def loss(arch):
        def f(p, pos):
            o = arch.apply(p, batch.replace(pos=pos), c_noise, CUTOFF, training=True)
            return jnp.sum(o**2)
        return f

    gd_p, gd_x = jax.jit(jax.grad(loss(dense_arch), argnums=(0, 1)))(params, batch.pos)
    gn_p, gn_x = jax.jit(jax.grad(loss(nbr_arch), argnums=(0, 1)))(params, batch.pos)
    for a, b in zip(jax.tree.leaves(gd_p), jax.tree.leaves(gn_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gn_x), np.asarray(gd_x), atol=2e-4, rtol=1e-3)


def test_e3conv_nbr_equivariance():
    """Rotation equivariance holds with a BINDING cap (the kept-K-nearest edge
    set is rotation invariant, so equivariance survives capping)."""
    from jamun_tpu.ops.wigner import random_rotation

    batch = make_test_batch(num_graphs=2, max_nodes=12, seed=5, scale=0.15)
    c_noise = jnp.asarray([jnp.log(0.04) / 4])
    arch = E3Conv(neighbor_mode="nbr", neighbor_cap=4, **_make_model("uvu"))
    params = jax.jit(arch.init)(jax.random.PRNGKey(0), batch, c_noise, CUTOFF)
    params = jax.tree.map(lambda p: p + 0.1 if p.ndim == 0 else p, params)
    apply_fn = jax.jit(arch.apply)

    rng = np.random.default_rng(0)
    R = random_rotation(rng).astype(np.float32)
    out = np.asarray(apply_fn(params, batch, c_noise, CUTOFF))
    batch_rot = batch.replace(pos=jnp.einsum("ij,gnj->gni", R, batch.pos))
    out_rot = np.asarray(apply_fn(params, batch_rot, c_noise, CUTOFF))
    perm = [1, 2, 0]
    D1 = R[np.ix_(perm, perm)]
    np.testing.assert_allclose(out_rot, out @ D1.T, atol=5e-4)


def test_overflow_telemetry_sown():
    batch = make_test_batch(num_graphs=2, max_nodes=16, seed=2, scale=0.15)
    c_noise = jnp.asarray([jnp.log(0.04) / 4])
    arch = E3Conv(neighbor_mode="nbr", neighbor_cap=4, **_make_model("uvu"))
    params = jax.jit(arch.init)(jax.random.PRNGKey(0), batch, c_noise, CUTOFF)
    _, state = arch.apply(
        params, batch, c_noise, CUTOFF, mutable=["intermediates"]
    )
    (ovf,) = state["intermediates"]["neighbor_overflow"]
    adj = _dense_adj(batch)
    np.testing.assert_array_equal(
        np.asarray(ovf), np.maximum(adj.sum(-1) - 4, 0).sum(-1).astype(np.int32)
    )


def test_auto_mode_resolution():
    # sampling flips at 512, training at 256 (measured crossovers)
    assert not neighbor_mode_auto(128, training=False)
    assert not neighbor_mode_auto(511, training=False)
    assert neighbor_mode_auto(512, training=False)
    assert not neighbor_mode_auto(255, training=True)
    assert neighbor_mode_auto(256, training=True)
    # "auto" at peptide scale == the dense path bit-for-bit
    batch = make_test_batch(num_graphs=2, max_nodes=10, seed=4)
    c_noise = jnp.asarray([jnp.log(0.04) / 4])
    kw = _make_model("uvu")
    dense_arch = E3Conv(neighbor_mode="dense", **kw)
    auto_arch = E3Conv(neighbor_mode="auto", **kw)
    params = jax.jit(dense_arch.init)(jax.random.PRNGKey(0), batch, c_noise, CUTOFF)
    params = jax.tree.map(lambda p: p + 0.3 if p.ndim == 0 else p, params)
    ref = np.asarray(jax.jit(dense_arch.apply)(params, batch, c_noise, CUTOFF))
    out = np.asarray(jax.jit(auto_arch.apply)(params, batch, c_noise, CUTOFF))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_nbr_atom_sharded_exact():
    """Sparse mode composes with atom-sharding: the sharded sparse forward
    matches the single-device sparse forward."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from jamun_tpu.parallel.atom_sharded import atom_sharded_arch_apply
    from jamun_tpu.parallel.mesh import make_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    batch = make_test_batch(
        num_graphs=2, max_nodes=48, nodes_per_graph=[42, 48], max_bonds=96, scale=0.5
    )
    c_noise = jnp.asarray([jnp.log(0.04) / 4])
    cutoff = jnp.asarray(1.2)
    arch = E3Conv(
        neighbor_mode="nbr", neighbor_cap=16,
        irreps_hidden="8x0e + 4x1e", n_layers=2, edge_attr_dim=8,
        atom_type_embedding_dim=2, atom_code_embedding_dim=2,
        residue_code_embedding_dim=2, residue_index_embedding_dim=2,
        tensor_product="uvu",
    )
    params = jax.jit(arch.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    params = jax.tree.map(lambda p: p + 0.5 if p.ndim == 0 else p, params)
    ref = np.asarray(jax.jit(arch.apply)(params, batch, c_noise, cutoff))
    out = np.asarray(atom_sharded_arch_apply(arch, mesh, params, batch, c_noise, cutoff))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)
