"""End-to-end Trainer integration on CPU: synthetic data -> fit -> checkpoint
-> resume -> sample -> metrics. The CI twin of the TPU smoke flow."""

import os

import numpy as np
import optax
import pytest

from jamun_tpu.data.datamodule import DataModule
from jamun_tpu.data.datasets import TrajectoryDataset
from jamun_tpu.data.topology import save_pdb
from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
from jamun_tpu.models.e3conv import E3Conv
from jamun_tpu.train.distributions import ConstantSigma
from jamun_tpu.train.loop import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_synthetic_data import make_molecule, make_trajectory

    root = str(tmp_path_factory.mktemp("data"))
    top, pos0 = make_molecule(2, seed=0)
    traj = make_trajectory(pos0, 64, seed=1)
    save_pdb(os.path.join(root, "AG-traj-state0.pdb"), top, pos0)
    np.savez(os.path.join(root, "AG-traj-arrays.npz"), positions=traj)
    return TrajectoryDataset(
        root=root,
        trajfiles=("AG-traj-arrays.npz",),
        pdbfile="AG-traj-state0.pdb",
        label="AG",
    )


def _tiny_denoiser():
    arch = E3Conv(
        irreps_hidden="8x0e + 4x1e",
        n_layers=1,
        edge_attr_dim=8,
        atom_type_embedding_dim=4,
        atom_code_embedding_dim=4,
        residue_code_embedding_dim=4,
        residue_index_embedding_dim=4,
    )
    return Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.15))


@pytest.mark.slow
def test_fit_checkpoint_resume(synthetic_dataset, tmp_path):
    den = _tiny_denoiser()
    dm = DataModule(datasets=[synthetic_dataset], batch_size=8, prefetch=0)
    cfg = TrainerConfig(
        max_epochs=1,
        max_steps=6,
        val_every_n_steps=3,
        val_max_batches=2,
        log_every_n_steps=2,
        checkpoint_dir=str(tmp_path / "ckpts"),
        checkpoint_top_k=2,
        collect_sigma_diagnostics=False,
    )
    trainer = Trainer(cfg)
    state = trainer.fit(den, optax.adam(1e-3), ConstantSigma(0.04), dm)
    assert int(state.step) == 6
    assert os.path.exists(tmp_path / "ckpts" / "last.ckpt")
    assert os.path.exists(tmp_path / "ckpts" / "manifest.json")

    # resume continues from step 6
    cfg2 = TrainerConfig(
        max_epochs=1, max_steps=8, log_every_n_steps=2,
        checkpoint_dir=str(tmp_path / "ckpts2"), collect_sigma_diagnostics=False,
    )
    state2 = Trainer(cfg2).fit(
        den, optax.adam(1e-3), ConstantSigma(0.04), dm,
        resume_from=str(tmp_path / "ckpts" / "last.ckpt"),
    )
    assert int(state2.step) >= 8


@pytest.mark.slow
def test_walkjump_sampling_end_to_end(synthetic_dataset):
    import jax

    from jamun_tpu.data.batching import template_to_batch
    from jamun_tpu.metrics.base import MeasureSamplingTimeCallback
    from jamun_tpu.metrics.ramachandran import RamachandranMetrics
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.sampling.sampler import Sampler
    from jamun_tpu.sampling.walkjump import SingleMeasurementSampler

    den = _tiny_denoiser()
    template, frame = synthetic_dataset[0]
    init_graphs = template_to_batch(template, frame, num_copies=2)
    params = den.init(jax.random.PRNGKey(0), init_graphs)

    bs = SingleMeasurementSampler(
        mcmc=BAOAB(MCMCConfig(delta=0.04, steps=11, save_every_n_steps=2, score_fn_clip=100.0)),
        sigma=0.04,
    )
    metric = RamachandranMetrics(synthetic_dataset, compare_with_reference=True)

    class CB:
        def on_after_sample_batch(self, sample, sampler, **kw):
            for s in sample:
                metric.update(s)

    out = Sampler(callbacks=[CB(), MeasureSamplingTimeCallback()]).sample(
        den, params, bs, num_batches=2, init_graphs=init_graphs, continue_chain=True
    )
    assert len(out) == 2 and len(out[0]) == 2
    assert out[0][0]["xhat_traj"].shape[0] == template.num_atoms
    res = metric.compute()
    assert res["num_chains"] == 4
    assert np.isfinite(res.get("ramachandran_jsd", 0.0))
