"""Tests for auxiliary components: attention, extract/scale irreps, sampler
parameter callbacks, LR schedules, diagnostics, analysis pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.ops.irreps import Irreps


def test_extract_irreps():
    from jamun_tpu.ops.extract import ExtractIrreps

    irreps = Irreps("2x0e + 1x1e + 1x0e")
    x = jnp.arange(float(irreps.dim))[None]
    ex = ExtractIrreps(irreps, "0e")
    out = np.asarray(ex(x))[0]
    np.testing.assert_allclose(out, [0, 1, 5])
    assert ex.irreps_out.dim == 3


@pytest.mark.slow
def test_attention_equivariance():
    from jamun_tpu.ops.attention import MultiheadAttention
    from jamun_tpu.ops.graph import dense_edge_data
    from jamun_tpu.ops.sh import spherical_harmonics
    from jamun_tpu.ops.wigner import random_rotation
    from jamun_tpu.utils.testing import make_test_batch

    irreps = Irreps("8x0e + 4x1e")
    irreps_sh = Irreps("1x0e + 1x1e")
    batch = make_test_batch(num_graphs=2, max_nodes=6)
    attn = MultiheadAttention(
        irreps_in=irreps, irreps_out=irreps, irreps_sh=irreps_sh,
        irreps_query=irreps, irreps_key=irreps, edge_attr_dim=8, n_head=2,
    )

    def make_edges(pos):
        import functools

        return dense_edge_data(
            pos, batch.node_mask, batch.bond_src, batch.bond_dst, batch.bond_mask,
            jnp.asarray(2.0),
            sh_fn=functools.partial(spherical_harmonics, irreps_sh),
            attr_fn=lambda d, bonded: jnp.stack([d] * 8, axis=-1),
        )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, irreps.dim)).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(0), x, make_edges(batch.pos))
    apply_fn = jax.jit(lambda p, x, pos: attn.apply(p, x, make_edges(pos)))

    R = random_rotation(rng).astype(np.float32)
    Din = irreps.rotation_matrix(R).astype(np.float32)
    out = np.asarray(apply_fn(params, x, batch.pos))
    out_rot = np.asarray(
        apply_fn(params, x @ jnp.asarray(Din.T), jnp.einsum("ij,gnj->gni", R, batch.pos))
    )
    np.testing.assert_allclose(out_rot, out @ Din.T, atol=3e-4)


def test_sampler_param_callbacks():
    from jamun_tpu.sampling.callbacks import DeltaSqrtDecayCallback, InterpolateParametersCallback
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.sampling.walkjump import SingleMeasurementSampler

    bs = SingleMeasurementSampler(mcmc=BAOAB(MCMCConfig(delta=0.1, steps=5)), sigma=0.04)
    cb = DeltaSqrtDecayCallback(delta_0=0.1)
    bs2 = cb.update_sampler(bs, 3)
    assert np.isclose(bs2.mcmc.config.delta, 0.1 / 2.0)
    assert bs.mcmc.config.delta == 0.1  # original untouched

    cb2 = InterpolateParametersCallback({"delta": 0.1}, {"delta": 0.0}, num_batches=3)
    assert np.isclose(cb2.update_sampler(bs, 0).mcmc.config.delta, 0.1)
    assert np.isclose(cb2.update_sampler(bs, 2).mcmc.config.delta, 0.0)


def test_lr_schedules():
    from jamun_tpu.train.lr_schedules import linear, linear_warmup_linear_decay, linear_warmup_plateau

    f = linear_warmup_linear_decay(10, 100)
    assert float(f(0)) == 0.0
    assert np.isclose(float(f(10)), 1.0)
    assert np.isclose(float(f(100)), 0.0)
    assert np.isclose(float(linear_warmup_plateau(10)(50)), 1.0)
    assert np.isclose(float(linear(100)(50)), 0.5)


def test_sigma_distributions():
    from jamun_tpu.train.distributions import (
        ClippedLogNormalSigma, ConstantSigma, ExponentialSigma, UniformMeasurement,
    )

    key = jax.random.PRNGKey(0)
    assert float(ConstantSigma(0.04).sample(key)) == pytest.approx(0.04)
    s = ExponentialSigma(sigma_max=1.0, sigma_min=0.01).sample(key, (1000,))
    assert 0.01 <= float(jnp.min(s)) and float(jnp.max(s)) <= 1.0
    s = ClippedLogNormalSigma(-1.0, 0.5, sigma_max=0.5).sample(key, (100,))
    assert float(jnp.max(s)) <= 0.5
    um = UniformMeasurement(0.1, 4)
    vals = np.asarray(um.sample(key, (500,)))
    expected = {0.1 * k**-0.5 for k in range(1, 5)}
    assert all(any(np.isclose(v, e, atol=1e-6) for e in expected) for v in vals[:20])


def test_analysis_pipeline():
    from jamun_tpu.analysis.run_analysis import analyze_trajectories
    from jamun_tpu.data.topology import Atom, Topology, preprocess_topology

    atoms, pos = [], []
    rng = np.random.default_rng(0)
    for r in range(3):
        for nm, el in zip(["N", "CA", "C", "O"], ["N", "C", "C", "O"]):
            atoms.append(Atom(index=len(atoms), name=nm, element=el,
                              residue_name="ALA", residue_index=r, residue_seq=r + 1))
            pos.append([0.13 * len(pos), 0.07 * (len(pos) % 3), 0.05 * (len(pos) % 2)])
    top = Topology(atoms=atoms, bonds=[])
    pos = np.asarray(pos, np.float32)
    template, heavy_top, _ = preprocess_topology(top, pos)
    traj_ref = pos[None] + rng.standard_normal((300, len(pos), 3)).astype(np.float32) * 0.01
    traj_pred = pos[None] + rng.standard_normal((100, len(pos), 3)).astype(np.float32) * 0.012
    res = analyze_trajectories(heavy_top, traj_pred, traj_ref, tica_lag=10, n_clusters=5, msm_lag=2)
    assert "ramachandran_jsd" in res and np.isfinite(res["ramachandran_jsd"])
    assert "tica0_jsd" in res and np.isfinite(res["tica0_jsd"])
    assert "msm_state_jsd" in res
    assert "autocorrelation" in res and len(res["autocorrelation"]["ref"]) > 1


def test_subset_reference_trajectory():
    from jamun_tpu.analysis.run_analysis import subset_reference_trajectory

    pred = np.zeros((100, 4, 3))
    ref = np.zeros((1000, 4, 3))
    # pred budget = 100 x 0.002 s = 0.2 s; ref = 1000 x 0.01 = 10 s -> 2%
    sub = subset_reference_trajectory(pred, ref, 0.002, 0.01)
    assert len(sub) == 20
    # never longer than the reference itself (factor capped at 1)
    sub = subset_reference_trajectory(pred, ref, 10.0, 0.001)
    assert len(sub) == 1000
    # base_factor scales the budget
    sub = subset_reference_trajectory(pred, ref, 0.002, 0.01, base_factor=10.0)
    assert len(sub) == 200


def test_autocovariance_matches_definition():
    from jamun_tpu.analysis.run_analysis import autocovariance

    rng = np.random.default_rng(3)
    x = rng.standard_normal(200)
    acov = autocovariance(x, nlag=5)
    n = len(x)
    for k in range(6):
        expected = float(np.sum(x[: n - k] * x[k:]) / (n - k))
        assert acov[k] == pytest.approx(expected)
    # statsmodels parity when available (adjusted=True, demean=False)
    try:
        from statsmodels.tsa.stattools import acovf
    except ImportError:
        return
    np.testing.assert_allclose(acov, acovf(x, nlag=5, adjusted=True, demean=False))


def test_run_analysis_cli_speed_matched(tmp_path):
    """End-to-end CLI: both the plain and the speed-matched `_benchmark`
    JSONs are written when rates are supplied."""
    import json
    import os
    import sys

    from jamun_tpu.analysis.run_analysis import main as analysis_main
    from jamun_tpu.data.topology import save_pdb

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_synthetic_data import make_molecule, make_trajectory

    top, pos0 = make_molecule(3, seed=0)
    ref = make_trajectory(pos0, 400, seed=1)
    pred = make_trajectory(pos0, 120, seed=2)
    pdb = str(tmp_path / "top.pdb")
    save_pdb(pdb, top, pos0)
    np.save(tmp_path / "pred.npy", pred)
    np.save(tmp_path / "ref.npy", ref)
    out = str(tmp_path / "res.json")
    analysis_main([
        "--pdb", pdb, "--pred", str(tmp_path / "pred.npy"), "--ref", str(tmp_path / "ref.npy"),
        "--out", out, "--tica-lag", "10",
        "--pred-seconds-per-sample", "0.005", "--ref-seconds-per-sample", "0.05",
    ])
    plain = json.load(open(out))
    bench = json.load(open(str(tmp_path / "res_benchmark.json")))
    assert np.isfinite(plain["ramachandran_jsd"])
    assert np.isfinite(bench["ramachandran_jsd"])
    # matched-budget subset: 120*0.005 / (400*0.05) = 3% of 400 frames
    assert bench["speed_matched"]["ref_subset_frames"] == 12
    assert bench["num_pred_frames"] == 12


def test_tica_recovers_slow_mode():
    from jamun_tpu.analysis.tica import TICA

    rng = np.random.default_rng(0)
    n = 5000
    slow = np.zeros(n)
    for i in range(1, n):  # AR(1) with long memory
        slow[i] = 0.99 * slow[i - 1] + 0.1 * rng.standard_normal()
    fast = rng.standard_normal(n)
    X = np.stack([slow + 0.1 * fast, fast], axis=1)
    tica = TICA(lag=10).fit([X])
    proj = tica.eigenvectors_[:, 0]
    # dominant component should weight the slow coordinate
    assert abs(proj[0]) > abs(proj[1])
    assert tica.timescales()[0] > tica.timescales()[-1]


@pytest.mark.slow
def test_visualize_denoise_metrics():
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.train.diagnostics import visualize_denoise_metrics
    from jamun_tpu.utils.testing import make_test_batch

    arch = E3Conv(irreps_hidden="4x0e + 2x1e", n_layers=1, edge_attr_dim=4,
                  atom_type_embedding_dim=2, atom_code_embedding_dim=2,
                  residue_code_embedding_dim=2, residue_index_embedding_dim=2)
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.3))
    batch = make_test_batch(num_graphs=2, max_nodes=6)
    params = den.init(jax.random.PRNGKey(0), batch)
    out = visualize_denoise_metrics(den, params, batch, sigmas=(0.02, 0.08))
    assert set(out) == {0.02, 0.08}
    assert all(np.isfinite(v["scaled_rmsd"]) for v in out.values())
