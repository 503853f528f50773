"""Ophiuchus architecture tests: forward shape, equivariance, tensor square."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.data.batching import BucketSpec, collate
from jamun_tpu.data.topology import Atom, Topology, preprocess_topology
from jamun_tpu.models.ophiuchus import Ophiuchus, tensor_square
from jamun_tpu.ops.irreps import Irreps
from jamun_tpu.ops.wigner import random_rotation, wigner_D_from_matrix


def _peptide_batch(n_res=3, num_graphs=2):
    atoms, pos = [], []
    names = ["N", "CA", "C", "O"]
    elements = ["N", "C", "C", "O"]
    rng = np.random.default_rng(0)
    for r in range(n_res):
        for nm, el in zip(names, elements):
            atoms.append(
                Atom(index=len(atoms), name=nm, element=el, residue_name="ALA",
                     residue_index=r, residue_seq=r + 1)
            )
            pos.append([0.12 * len(pos), 0.05 * r, 0.02 * len(pos) % 0.3])
    top = Topology(atoms=atoms, bonds=[])
    pos = np.asarray(pos, np.float32) + rng.standard_normal((len(pos), 3)).astype(np.float32) * 0.01
    template, _, _ = preprocess_topology(top, pos)
    return collate([(template, pos)] * num_graphs, BucketSpec(node_buckets=(16,)))


def test_tensor_square_equivariance():
    irreps = Irreps("1x0e + 1x1e")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, irreps.dim)).astype(np.float32)
    out, irreps_out = tensor_square(jnp.asarray(x), irreps)
    R = random_rotation(rng)
    Din = irreps.rotation_matrix(R).astype(np.float32)
    Dout = irreps_out.rotation_matrix(R).astype(np.float32)
    out_rot, _ = tensor_square(jnp.asarray(x @ Din.T), irreps)
    np.testing.assert_allclose(np.asarray(out_rot), np.asarray(out) @ Dout.T, atol=1e-4)
    # symmetric square of 1x0e+1x1e: 0e(0x0), 1e(0x1), 0e+2e(1x1 sym)
    assert irreps_out.dim == 1 + 3 + 1 + 5


@pytest.fixture(scope="module")
def tiny_ophiuchus():
    batch = _peptide_batch()
    arch = Ophiuchus(
        irreps_hidden="8x0e + 8x1e",
        n_layers=2,
        mul_factor=8,
        edge_attr_dim=8,
        residue_code_embedding_dim=8,
    )
    c_noise = jnp.asarray([jnp.log(0.04) / 4])
    cutoff = jnp.asarray(1.0)
    params = jax.jit(arch.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)
    return arch, jax.jit(arch.apply), params, batch, c_noise, cutoff


def test_ophiuchus_forward(tiny_ophiuchus):
    arch, apply_fn, params, batch, c_noise, cutoff = tiny_ophiuchus
    out = apply_fn(params, batch, c_noise, cutoff)
    assert out.shape == batch.pos.shape
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.allclose(np.asarray(out)[~np.asarray(batch.node_mask)], 0.0)


def test_ophiuchus_equivariance(tiny_ophiuchus):
    arch, apply_fn, params, batch, c_noise, cutoff = tiny_ophiuchus
    rng = np.random.default_rng(1)
    R = random_rotation(rng).astype(np.float32)
    out = np.asarray(apply_fn(params, batch, c_noise, cutoff))
    batch_rot = batch.replace(pos=jnp.einsum("ij,gnj->gni", R, batch.pos))
    out_rot = np.asarray(apply_fn(params, batch_rot, c_noise, cutoff))
    perm = [1, 2, 0]
    D1 = R[np.ix_(perm, perm)]
    np.testing.assert_allclose(out_rot, out @ D1.T, atol=3e-3)
