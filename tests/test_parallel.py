"""Parallelism: atom-sharded pair op exactness on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.parallel.atom_sharded import atom_sharded_pair_op, shard_atoms
from jamun_tpu.parallel.mesh import make_mesh


def _dense_reference(x, pos):
    d2 = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    w = jnp.exp(-d2)
    return w @ x


def _pair_fn(x_full, pos_full, dst_start, n_local):
    pos_dst = jax.lax.dynamic_slice_in_dim(pos_full, dst_start, n_local, axis=0)
    d2 = jnp.sum((pos_dst[:, None, :] - pos_full[None, :, :]) ** 2, axis=-1)
    w = jnp.exp(-d2)
    return w @ x_full


def test_atom_sharded_pair_op_exact():
    """Sharded dst-slice computation == dense single-device result."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(0)
    N, D = 8 * n_dev, 16
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    pos = jnp.asarray(rng.standard_normal((N, 3)).astype(np.float32))

    ref = np.asarray(jax.jit(_dense_reference)(x, pos))

    xs = shard_atoms(x, mesh)
    ps = shard_atoms(pos, mesh)
    with mesh:
        out = np.asarray(atom_sharded_pair_op(mesh, _pair_fn)(xs, ps))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_shard_atoms_places_on_all_devices():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = make_mesh(len(jax.devices()))
    x = jnp.zeros((8 * len(jax.devices()), 4))
    xs = shard_atoms(x, mesh)
    assert len(xs.sharding.device_set) == len(jax.devices())


def _atom_sharded_e3conv_exact(N, nodes_per_graph):
    """The REAL E3Conv forward with atoms sharded over the 8-device mesh
    matches the dense single-device forward."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.parallel.atom_sharded import atom_sharded_arch_apply
    from jamun_tpu.utils.testing import make_test_batch

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    batch = make_test_batch(
        num_graphs=2, max_nodes=N, nodes_per_graph=nodes_per_graph, max_bonds=2 * N, scale=0.5
    )
    arch = E3Conv(
        irreps_hidden="8x0e + 4x1e", n_layers=2, edge_attr_dim=8,
        atom_type_embedding_dim=2, atom_code_embedding_dim=2,
        residue_code_embedding_dim=2, residue_index_embedding_dim=2,
        tensor_product="uvu",
    )
    c_noise = jnp.asarray([jnp.log(0.04) / 4.0])
    cutoff = jnp.asarray(1.2)
    params = jax.jit(arch.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    # nonzero output gain so the comparison is nontrivial
    params = jax.tree.map(lambda p: p + 0.5 if p.ndim == 0 else p, params)

    ref = np.asarray(jax.jit(arch.apply)(params, batch, c_noise, cutoff))
    out = np.asarray(atom_sharded_arch_apply(arch, mesh, params, batch, c_noise, cutoff))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_atom_sharded_e3conv_exact():
    # N=48 keeps the fast tier quick (6 local atoms/device still exercises the
    # per-layer halo + ragged masks); chignolin scale runs in the slow tier.
    _atom_sharded_e3conv_exact(48, [42, 48])


@pytest.mark.slow
def test_atom_sharded_e3conv_exact_chignolin_scale():
    _atom_sharded_e3conv_exact(96, [90, 96])


@pytest.mark.slow
def test_dp_train_step_parity():
    """The same global batch trained on 1 device vs sharded over the 8-device
    mesh produces identical losses and step counts (the compiler inserts the
    gradient psum) — the DP-correctness half of SURVEY 5.8."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    import optax

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.parallel.mesh import make_mesh, shard_batch
    from jamun_tpu.train.distributions import ConstantSigma
    from jamun_tpu.train.state import create_train_state, make_train_step
    from jamun_tpu.utils.testing import make_test_batch

    mesh = make_mesh(len(jax.devices()))
    arch = E3Conv(
        irreps_hidden="8x0e + 4x1e", n_layers=2, edge_attr_dim=8,
        atom_type_embedding_dim=2, atom_code_embedding_dim=2,
        residue_code_embedding_dim=2, residue_index_embedding_dim=2,
        tensor_product="uvu",
    )
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.3))
    batch = make_test_batch(num_graphs=8, max_nodes=16, scale=0.4)
    opt = optax.sgd(1e-3)
    step = jax.jit(make_train_step(den, opt, ConstantSigma(0.05)))

    s1 = create_train_state(den, opt, batch, seed=0)
    s8 = jax.device_put(s1, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    for i in range(3):
        s1, aux1 = step(s1, batch)
        s8, aux8 = step(s8, shard_batch(batch, mesh))
        np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]), rtol=2e-5)
    assert int(s1.step) == int(s8.step) == 3
