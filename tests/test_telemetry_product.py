"""Product surfacing of sparse-cap telemetry + sampling-time accounting.

VERDICT r4 #6: the `neighbor_overflow` intermediate sown by E3Conv
(models/e3conv.py) must reach the Trainer's metrics.csv and the sampler's
sampling_times.csv so raising `neighbor_cap` is a data-driven decision.
ADVICE r4: per-label sampling rates must separate the warm (steady-state)
rate from the compile-inflated first batch, and the speed-matched analysis
must refuse the degenerate saturated-budget comparison.

Reference-side roles: torch_cluster's silent `max_num_neighbors=32` cap
(`/root/reference/src/jamun/model/denoiser.py:149`) and the per-peptide
`analysis/sampling_times/*.csv` + `analysis/run_analysis.py:130-143` budget.
"""

import csv
import json
import os

import jax
import numpy as np
import pytest

from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
from jamun_tpu.models.e3conv import E3Conv
from jamun_tpu.utils.testing import make_test_batch

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_denoiser(**arch_kw):
    arch = E3Conv(
        irreps_hidden="8x0e + 4x1e", n_layers=1, edge_attr_dim=8,
        atom_type_embedding_dim=2, atom_code_embedding_dim=2,
        residue_code_embedding_dim=2, residue_index_embedding_dim=2,
        tensor_product="uvu", **arch_kw,
    )
    return Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))


def test_training_loss_surfaces_overflow_sparse():
    """neighbor_mode=nbr with a tight cap: aux carries mean/max dropped-edge
    counts; the dense path carries neither key."""
    batch = make_test_batch(num_graphs=3, max_nodes=14, seed=3, scale=0.12)
    den = _tiny_denoiser(neighbor_mode="nbr", neighbor_cap=2)
    params = den.init(jax.random.PRNGKey(0), batch)
    loss, aux = jax.jit(den.training_loss)(params, jax.random.PRNGKey(1), batch, 0.04)
    assert np.isfinite(float(loss))
    assert float(aux["neighbor_overflow_mean"]) > 0
    assert float(aux["neighbor_overflow_max"]) >= float(aux["neighbor_overflow_mean"])

    den_dense = _tiny_denoiser(neighbor_mode="dense")
    params_d = den_dense.init(jax.random.PRNGKey(0), batch)
    _, aux_d = jax.jit(den_dense.training_loss)(params_d, jax.random.PRNGKey(1), batch, 0.04)
    assert "neighbor_overflow_mean" not in aux_d


def test_train_step_aux_carries_overflow():
    """The jitted train step (value_and_grad around training_loss) must not
    break on the mutable-intermediates capture and must expose the stat."""
    import optax

    from jamun_tpu.train.state import create_train_state, make_train_step
    from jamun_tpu.train.distributions import ConstantSigma

    batch = make_test_batch(num_graphs=2, max_nodes=12, seed=4, scale=0.12)
    den = _tiny_denoiser(neighbor_mode="nbr", neighbor_cap=2)
    state = create_train_state(den, optax.adam(1e-3), batch)
    step = jax.jit(make_train_step(den, optax.adam(1e-3), ConstantSigma(0.04)))
    state, aux = step(state, batch)
    assert "neighbor_overflow_mean" in aux
    assert np.isfinite(float(aux["loss"]))


def test_sampler_reports_overflow_per_batch():
    from jamun_tpu.data.batching import collate
    from jamun_tpu.metrics.base import MeasureSamplingTimeCallback
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.sampling.sampler import Sampler
    from jamun_tpu.sampling.walkjump import SingleMeasurementSampler

    batch = make_test_batch(num_graphs=2, max_nodes=12, seed=5, scale=0.12)
    den = _tiny_denoiser(neighbor_mode="nbr", neighbor_cap=2)
    params = den.init(jax.random.PRNGKey(0), batch)
    bs = SingleMeasurementSampler(
        mcmc=BAOAB(MCMCConfig(delta=0.04, steps=5, save_every_n_steps=2, score_fn_clip=100.0)),
        sigma=0.04,
    )
    cb = MeasureSamplingTimeCallback()
    Sampler(callbacks=[cb]).sample(den, params, bs, num_batches=2, init_graphs=batch)
    assert len(cb.per_batch) == 2
    for entry in cb.per_batch:
        assert entry["neighbor_overflow_mean"] > 0
        assert entry["neighbor_overflow_max"] >= entry["neighbor_overflow_mean"]
    assert cb.last_neighbor_overflow is not None
    del collate


def test_sampler_skips_overflow_on_dense_path():
    from jamun_tpu.metrics.base import MeasureSamplingTimeCallback
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.sampling.sampler import Sampler
    from jamun_tpu.sampling.walkjump import SingleMeasurementSampler

    batch = make_test_batch(num_graphs=2, max_nodes=12, seed=5)
    den = _tiny_denoiser()  # neighbor_mode=auto at N=12 -> dense
    params = den.init(jax.random.PRNGKey(0), batch)
    bs = SingleMeasurementSampler(
        mcmc=BAOAB(MCMCConfig(delta=0.04, steps=5, save_every_n_steps=2, score_fn_clip=100.0)),
        sigma=0.04,
    )
    cb = MeasureSamplingTimeCallback()
    Sampler(callbacks=[cb]).sample(den, params, bs, num_batches=1, init_graphs=batch)
    assert "neighbor_overflow_mean" not in cb.per_batch[0]


def test_timing_rates_warm_vs_compile_and_labels():
    """rates(): batch 0 (compile-inflated) excluded from the warm rate when
    more batches ran; per-label rows carry their own sample counts."""
    from jamun_tpu.metrics.base import MeasureSamplingTimeCallback

    def fake_sample(graph_index, frames):
        return {"graph_index": graph_index, "xhat_traj": np.zeros((3, frames, 3))}

    cb = MeasureSamplingTimeCallback(label_for_graph=["AG", "SV"])
    # batch 0: 10 s for 20 samples (compile) — 0.5 s/sample
    cb.on_after_sample_batch(
        [fake_sample(0, 10), fake_sample(1, 10)], None, elapsed_seconds=10.0
    )
    # batches 1-2: 1 s for 20 samples each — 0.05 s/sample warm
    for _ in range(2):
        cb.on_after_sample_batch(
            [fake_sample(0, 10), fake_sample(1, 10)], None, elapsed_seconds=1.0
        )
    rates = cb.rates()
    assert set(rates) == {"AG", "SV"}
    for r in rates.values():
        assert r["time_per_sample_seconds"] == pytest.approx(0.05)
        assert r["time_per_sample_seconds_incl_compile"] == pytest.approx(12.0 / 60.0)
        assert r["samples"] == 30

    # single batch: nothing to exclude — warm falls back to the pooled rate
    cb1 = MeasureSamplingTimeCallback(label_for_graph=["AG"])
    cb1.on_after_sample_batch([fake_sample(0, 10)], None, elapsed_seconds=2.0)
    assert cb1.rates()["AG"]["time_per_sample_seconds"] == pytest.approx(0.2)


def test_sampling_times_csv_dict_rows(tmp_path):
    from jamun_tpu.analysis.load_trajectory import get_sampling_rate, write_sampling_times_csv

    path = str(tmp_path / "sampling_times.csv")
    write_sampling_times_csv(
        path,
        {
            "AG": {
                "time_per_sample_seconds": 0.004,
                "time_per_sample_seconds_incl_compile": 0.04,
                "samples": 100,
                "neighbor_overflow_mean": 3.5,
            },
            "SV": 0.005,  # float form still accepted
        },
    )
    assert get_sampling_rate(path, "AG") == pytest.approx(0.004)
    assert get_sampling_rate(path, "SV") == pytest.approx(0.005)
    with open(path) as f:
        rows = list(csv.DictReader(f))
    ag = next(r for r in rows if r["label"] == "AG")
    assert float(ag["time_per_sample_seconds_incl_compile"]) == pytest.approx(0.04)
    assert float(ag["neighbor_overflow_mean"]) == pytest.approx(3.5)


def test_speed_matched_saturation_is_skipped(tmp_path):
    """ADVICE r4 (medium): when the sampled wall-clock budget covers the whole
    reference ensemble, the benchmark rerun would compare the reference with
    itself (all JSDs exactly 0); run_analysis must record the saturation
    instead of the degenerate artifact."""
    from jamun_tpu.analysis import run_analysis

    # tiny real topology via the synthetic data builder
    import sys

    sys.path.insert(0, os.path.join(REPO_ROOT, "scripts"))
    from make_synthetic_data import make_molecule, make_trajectory

    from jamun_tpu.data.topology import save_pdb

    top, pos0 = make_molecule(2, seed=0)
    pdb = str(tmp_path / "AG.pdb")
    save_pdb(pdb, top, pos0)
    pred = make_trajectory(pos0, 50, seed=1)
    ref = make_trajectory(pos0, 40, seed=2)
    np.save(tmp_path / "pred.npy", pred)
    np.save(tmp_path / "ref.npy", ref)
    out = str(tmp_path / "analysis.json")

    # pred budget 50 x 1.0 s >> ref budget 40 x 0.01 s -> factor saturates
    run_analysis.main([
        "--pdb", pdb, "--pred", str(tmp_path / "pred.npy"),
        "--ref", str(tmp_path / "ref.npy"), "--out", out,
        "--tica-lag", "5",
        "--pred-seconds-per-sample", "1.0",
        "--ref-seconds-per-sample", "0.01",
    ])
    with open(str(tmp_path / "analysis_benchmark.json")) as f:
        bench = json.load(f)
    assert "skipped" in bench["speed_matched"]
    assert "saturated" in bench["speed_matched"]["skipped"]
    assert bench["speed_matched"]["ref_subset_frames"] == 40

    # unsaturated rates still produce a real rerun
    run_analysis.main([
        "--pdb", pdb, "--pred", str(tmp_path / "pred.npy"),
        "--ref", str(tmp_path / "ref.npy"), "--out", out,
        "--tica-lag", "5",
        "--pred-seconds-per-sample", "0.01",
        "--ref-seconds-per-sample", "0.1",
    ])
    with open(str(tmp_path / "analysis_benchmark.json")) as f:
        bench = json.load(f)
    sm = bench["speed_matched"]
    assert "skipped" not in sm
    assert 2 <= sm["ref_subset_frames"] < 40
