"""Product wiring of atom-sharded (context-parallel) mode — VERDICT r3 #3.

The capability (`parallel/atom_sharded.py`, exactness pinned by
tests/test_parallel.py) must be reachable from the product surfaces: the
`parallel.atom_sharded` config knob routes Trainer and Sampler through the
shard_map'd atom-sharded forward. Reference-side role: Lightning device
placement (`/root/reference/scripts/slurm/train.sh:31-37`).
"""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
from jamun_tpu.models.e3conv import E3Conv
from jamun_tpu.parallel.atom_sharded import (
    denoiser_with_atom_sharding,
    pad_atoms_to_multiple,
    prepare_atom_sharded_batch,
    resolve_atom_sharded,
)
from jamun_tpu.parallel.mesh import make_mesh
from jamun_tpu.train.distributions import ConstantSigma
from jamun_tpu.train.state import create_train_state, make_train_step
from jamun_tpu.utils.testing import make_test_batch

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_denoiser(**arch_kw):
    arch = E3Conv(
        irreps_hidden="8x0e + 4x1e", n_layers=2, edge_attr_dim=8,
        atom_type_embedding_dim=2, atom_code_embedding_dim=2,
        residue_code_embedding_dim=2, residue_index_embedding_dim=2,
        tensor_product="uvu", **arch_kw,
    )
    return Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))


def test_resolve_atom_sharded():
    assert resolve_atom_sharded(True, 8, 1024, 8)
    assert not resolve_atom_sharded(True, 8, 1024, 1)  # single device: no-op
    assert not resolve_atom_sharded(False, 4096, 1024, 8)
    assert resolve_atom_sharded("auto", 1024, 1024, 8)
    assert not resolve_atom_sharded("auto", 1023, 1024, 8)
    assert resolve_atom_sharded("true", 8, 1024, 8)
    with pytest.raises(ValueError):
        resolve_atom_sharded("banana", 8, 1024, 8)


def test_pad_atoms_to_multiple():
    batch = make_test_batch(num_graphs=2, max_nodes=10)
    padded = pad_atoms_to_multiple(batch, 8)
    assert padded.pos.shape == (2, 16, 3)
    assert padded.node_mask.shape == (2, 16)
    assert not bool(jnp.any(padded.node_mask[:, 10:]))
    np.testing.assert_array_equal(np.asarray(padded.pos[:, :10]), np.asarray(batch.pos))
    # bond lists index original rows: unchanged
    np.testing.assert_array_equal(np.asarray(padded.bond_src), np.asarray(batch.bond_src))
    assert pad_atoms_to_multiple(batch, 5) .pos.shape[1] == 10  # already a multiple


@pytest.mark.slow
def test_atom_sharded_train_step_parity():
    """One FULL train step through the wrapped (shard_map'd) denoiser ==
    the plain single-device step: same loss, same updated params (gradients
    flow through the halo all_gathers)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    N = 6 * n_dev  # divisible: no padding, so RNG draws are shape-identical
    batch = make_test_batch(
        num_graphs=2, max_nodes=N, nodes_per_graph=[N - 3, N], max_bonds=2 * N, scale=0.5
    )
    den = _tiny_denoiser()
    opt = optax.adam(1e-3)
    step = jax.jit(make_train_step(den, opt, ConstantSigma(0.04), 0.999))
    state = create_train_state(den, opt, batch, seed=0)
    s1, aux1 = step(state, batch)

    den_s = denoiser_with_atom_sharding(den, mesh)
    step_s = jax.jit(make_train_step(den_s, opt, ConstantSigma(0.04), 0.999))
    state_s = create_train_state(den_s, opt, batch, seed=0)
    prepared = prepare_atom_sharded_batch(pad_atoms_to_multiple(batch, n_dev), mesh)
    s2, aux2 = step_s(state_s, prepared)

    np.testing.assert_allclose(float(aux2["loss"]), float(aux1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_atom_sharded_sampler_parity():
    """Sampler(atom_sharded=True) walks the same trajectory as the plain
    Sampler (short walk; the sharded forward is numerically identical)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.sampling.sampler import Sampler
    from jamun_tpu.sampling.walkjump import SingleMeasurementSampler

    n_dev = len(jax.devices())
    N = 6 * n_dev
    batch = make_test_batch(
        num_graphs=2, max_nodes=N, nodes_per_graph=[N, N], max_bonds=2 * N, scale=0.5
    )
    den = _tiny_denoiser()
    params = den.init(jax.random.PRNGKey(0), batch)
    bs = SingleMeasurementSampler(
        mcmc=BAOAB(MCMCConfig(delta=0.04, friction=1.0, M=1.0, steps=5,
                              save_every_n_steps=1, score_fn_clip=100.0)),
        sigma=0.04,
    )
    out_plain = Sampler().sample(den, params, bs, 1, batch, seed=0)
    out_shard = Sampler(atom_sharded=True, num_devices=n_dev).sample(
        den, params, bs, 1, batch, seed=0
    )
    a, b = out_plain[0][0], out_shard[0][0]
    assert a["num_atoms"] == b["num_atoms"]
    for k in a:
        if isinstance(a[k], np.ndarray):
            np.testing.assert_allclose(b[k], a[k], atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_atom_sharded_train_cli_end_to_end(tmp_path, monkeypatch, caplog):
    """`jamun-tpu-train experiment=train_test parallel.atom_sharded=true`
    runs end-to-end on the virtual mesh (VERDICT r3 #3 done criterion,
    stood in for train_idrome whose dataset needs real IDRome files)."""
    from jamun_tpu.cmdline import train as train_cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("JAMUN_DATA_PATH", os.path.join(REPO_ROOT, "data"))
    caplog.set_level(logging.INFO, logger="jamun_tpu")
    train_cli.main(
        [
            "--experiment-dir", os.path.join(REPO_ROOT, "configs", "experiment"),
            "experiment=train_test",
            "parallel.atom_sharded=true",
            "trainer.max_steps=4",
            "trainer.val_every_n_steps=2",
            "trainer.val_max_batches=1",
            "trainer.log_every_n_steps=2",
        ]
    )
    assert os.path.exists(tmp_path / "runs" / "test" / "checkpoints" / "last.ckpt")
    assert any("atom-sharded mode" in rec.getMessage() for rec in caplog.records)


def test_auto_dispatch_cli_end_to_end(tmp_path, monkeypatch, caplog):
    """VERDICT r4 #7: `neighbor_mode=auto` + `parallel.atom_sharded=auto`
    flip TOGETHER at their configured size thresholds through the train CLI
    (thresholds shrunk to the synthetic molecule's size so the auto logic —
    not a forced `=true` — engages on the CPU mesh)."""
    import jamun_tpu.models.e3conv as e3conv_mod
    from jamun_tpu.cmdline import train as train_cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("JAMUN_DATA_PATH", os.path.join(REPO_ROOT, "data"))
    # the synthetic molecule is ~12-20 heavy atoms; put both auto thresholds
    # below it so the idrome-style dispatch engages
    monkeypatch.setattr(e3conv_mod, "_NBR_AUTO_TRAIN_N", 8)
    monkeypatch.setattr(e3conv_mod, "_NBR_AUTO_SAMPLE_N", 8)
    caplog.set_level(logging.INFO, logger="jamun_tpu")
    train_cli.main(
        [
            "--experiment-dir", os.path.join(REPO_ROOT, "configs", "experiment"),
            "experiment=train_test",
            "parallel.atom_sharded=auto",
            "parallel.atom_shard_threshold=8",
            "trainer.max_steps=4",
            "trainer.val_every_n_steps=2",
            "trainer.val_max_batches=1",
            "trainer.log_every_n_steps=2",
        ]
    )
    msgs = [rec.getMessage() for rec in caplog.records]
    assert any("sparse capped-neighbor path active" in m for m in msgs)
    assert any("atom-sharded mode" in m for m in msgs)
    assert os.path.exists(tmp_path / "runs" / "test" / "checkpoints" / "last.ckpt")


def test_auto_dispatch_cli_overflow_column(tmp_path, monkeypatch, caplog):
    """With auto-sparse engaged but atom-sharding below threshold (plain DP),
    the dropped-edge telemetry reaches metrics.csv
    (train/neighbor_overflow_mean — VERDICT r4 #6 done criterion)."""
    import csv

    import jamun_tpu.models.e3conv as e3conv_mod
    from jamun_tpu.cmdline import train as train_cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("JAMUN_DATA_PATH", os.path.join(REPO_ROOT, "data"))
    monkeypatch.setattr(e3conv_mod, "_NBR_AUTO_TRAIN_N", 8)
    caplog.set_level(logging.INFO, logger="jamun_tpu")
    train_cli.main(
        [
            "--experiment-dir", os.path.join(REPO_ROOT, "configs", "experiment"),
            "experiment=train_test",
            "model.arch.neighbor_cap=2",
            "trainer.max_steps=4",
            "trainer.val_every_n_steps=2",
            "trainer.val_max_batches=1",
            "trainer.log_every_n_steps=2",
        ]
    )
    metrics_csv = tmp_path / "runs" / "test" / "metrics.csv"
    assert os.path.exists(metrics_csv)
    with open(metrics_csv) as f:
        rows = [r for r in csv.DictReader(f) if r.get("train/neighbor_overflow_mean")]
    assert rows, "no train/neighbor_overflow_mean column in metrics.csv"
    assert all(float(r["train/neighbor_overflow_mean"]) >= 0 for r in rows)
    assert any(float(r["train/neighbor_overflow_max"]) > 0 for r in rows)
