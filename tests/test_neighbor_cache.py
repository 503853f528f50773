"""Verlet-cached neighbor lists for the sparse walk (sampling/mcmc.py
`NeighborCachedScore` + denoiser.make_neighbor_cached_score + E3Conv
`nbr_cache`).

The MD-native amortization of the reference's per-forward radius_graph
(`/root/reference/src/jamun/model/denoiser.py:149`): the walk carries a
(cutoff + skin) capped list and rebuilds it only on the skin/2 displacement
trigger.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
from jamun_tpu.models.e3conv import E3Conv
from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig, NeighborCachedScore
from jamun_tpu.sampling.walkjump import SingleMeasurementSampler
from jamun_tpu.utils.testing import make_test_batch

SIGMA = 0.05


def test_cached_machinery_matches_plain_walk():
    """A cached score whose score ignores the cache must reproduce the plain
    walk bitwise (same RNG stream, same math)."""
    key = jax.random.PRNGKey(0)
    y0 = jax.random.normal(key, (2, 8, 3))
    score_fn = lambda y: -y
    mcmc = BAOAB(MCMCConfig(delta=0.1, friction=1.0, steps=20, save_every_n_steps=5))
    ref = mcmc(jax.random.PRNGKey(1), y0, score_fn, v_init="gaussian")
    cached = NeighborCachedScore(
        rebuild=lambda y: jnp.zeros(()), score=lambda y, c: -y, threshold=0.05
    )
    out = mcmc(jax.random.PRNGKey(1), y0, score_fn, v_init="gaussian", cached_score=cached)
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rebuild_trigger():
    """threshold=inf freezes the cache at the initial rebuild; threshold=0
    rebuilds every step. Use score(y, cache) = cache - y (a spring anchored at
    the cached positions) to distinguish."""
    y0 = jnp.ones((1, 4, 3))
    cfg = MCMCConfig(delta=0.05, friction=1.0, steps=30, save_every_n_steps=29)

    def run(threshold):
        cached = NeighborCachedScore(
            rebuild=lambda y: y, score=lambda y, c: c - y, threshold=threshold
        )
        y, v, _, _ = BAOAB(cfg)(
            jax.random.PRNGKey(2), y0, lambda y: -y, v_init="zero", cached_score=cached
        )
        return np.asarray(y)

    frozen = run(1e9)   # anchor stays at y0 -> pulled back toward ones
    fresh = run(0.0)    # anchor follows y -> zero force, pure OU drift
    assert not np.allclose(frozen, fresh)


def _nbr_models(cap, mean_center=True):
    arch = E3Conv(
        irreps_hidden="16x0e + 8x1e",
        n_layers=2,
        tensor_product="uvu",
        neighbor_mode="nbr",
        neighbor_cap=cap,
    )
    den = Denoiser(
        arch,
        DenoiserConfig(max_radius=1.0, average_squared_distance=0.5, mean_center=mean_center),
    )
    return den


def test_e3conv_nbr_cache_parity():
    """A cache built at the same positions with skin=0 must reproduce the
    uncached sparse forward (same edge set; K-slot order may differ, so sums
    differ only by rounding)."""
    batch = make_test_batch(num_graphs=2, max_nodes=24, nodes_per_graph=[20, 24], max_bonds=30)
    den = _nbr_models(cap=8)
    params = den.init(jax.random.PRNGKey(0), batch)
    ref = den.xhat(params, batch, SIGMA)
    cached = den.make_neighbor_cached_score(params, batch, SIGMA, skin=1e-6)
    assert cached is not None
    cache = cached.rebuild(batch.pos)
    out = den.xhat(params, batch, SIGMA, nbr_cache=cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_factory_gates():
    batch = make_test_batch(num_graphs=1, max_nodes=16, nodes_per_graph=[16], max_bonds=20)
    den = _nbr_models(cap=8)
    params = den.init(jax.random.PRNGKey(0), batch)
    assert den.make_neighbor_cached_score(params, batch, SIGMA, skin=0.0) is None
    # dense-mode arch: nothing to cache
    arch_d = E3Conv(irreps_hidden="16x0e + 8x1e", n_layers=1, tensor_product="uvu",
                    neighbor_mode="dense")
    den_d = Denoiser(arch_d, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
    assert den_d.make_neighbor_cached_score(params, batch, SIGMA, skin=0.3) is None


@pytest.mark.slow
def test_cached_walk_matches_uncached_with_uncapped_list():
    """With cap >= any possible degree, the (cutoff + skin) cached list is a
    strict superset of every per-step in-cutoff edge set, and the per-step
    true-cutoff mask recovers EXACTLY the edges the uncached walk builds —
    the two walks must agree to rounding (K-slot summation order differs)."""
    batch = make_test_batch(num_graphs=1, max_nodes=16, nodes_per_graph=[16], max_bonds=20)
    den = _nbr_models(cap=15)
    params = den.init(jax.random.PRNGKey(0), batch)
    cfg = MCMCConfig(delta=0.02, friction=1.0, steps=12, save_every_n_steps=4,
                     score_fn_clip=100.0)
    smp_plain = SingleMeasurementSampler(mcmc=BAOAB(cfg), sigma=SIGMA)
    smp_cache = SingleMeasurementSampler(mcmc=BAOAB(cfg), sigma=SIGMA, neighbor_skin=3.0)
    y0 = batch.pos + SIGMA * jax.random.normal(jax.random.PRNGKey(3), batch.pos.shape)
    a = smp_plain.walk(den, params, batch, jax.random.PRNGKey(4), y0, v_init="gaussian")
    b = smp_cache.walk(den, params, batch, jax.random.PRNGKey(4), y0, v_init="gaussian")
    np.testing.assert_allclose(np.asarray(a["y"]), np.asarray(b["y"]), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(a["y_traj"]), np.asarray(b["y_traj"]), atol=2e-4
    )


def test_cached_kernel_geom_parity(monkeypatch):
    """Cached mode with the edge-features + conv kernels (use_pallas=True,
    interpret on CPU) must match the cached XLA path: same list membership,
    geometry recomputed in-kernel. (The geom kernel is off by default — a
    measured negative on v5e at N=1024, BENCH_NOTES round 5a — but must stay
    correct behind its flag.)"""
    monkeypatch.setenv("JAMUN_NBR_GEOM_KERNEL", "1")
    batch = make_test_batch(num_graphs=2, max_nodes=24, nodes_per_graph=[20, 24], max_bonds=30)
    arch_kw = dict(
        irreps_hidden="16x0e + 8x1e", n_layers=2, tensor_product="uvu",
        neighbor_mode="nbr", neighbor_cap=8,
    )
    den_x = Denoiser(
        E3Conv(use_pallas=False, **arch_kw),
        DenoiserConfig(max_radius=1.0, average_squared_distance=0.5),
    )
    den_k = Denoiser(
        E3Conv(use_pallas=True, **arch_kw),
        DenoiserConfig(max_radius=1.0, average_squared_distance=0.5),
    )
    params = den_x.init(jax.random.PRNGKey(0), batch)
    cached = den_x.make_neighbor_cached_score(params, batch, SIGMA, skin=0.4)
    cache = cached.rebuild(batch.pos)
    ref = den_x.xhat(params, batch, SIGMA, nbr_cache=cache)
    out = den_k.xhat(params, batch, SIGMA, nbr_cache=cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_neighbor_skin_config_plumbing():
    """The neighbor_skin knob flows from the sample config tree into the
    instantiated SingleMeasurementSampler (sample_idrome sets 1.0; the base
    default is 0.0 = off)."""
    import os

    from jamun_tpu.config.compose import compose
    from jamun_tpu.config.instantiate import instantiate

    defaults = os.path.join(os.path.dirname(__file__), "..", "jamun_tpu", "config", "defaults")
    cfg = compose(defaults, "sample", ["neighbor_skin=0.7"])
    smp = instantiate(cfg["batch_sampler"])
    assert isinstance(smp, SingleMeasurementSampler)
    assert smp.neighbor_skin == 0.7
    cfg0 = compose(defaults, "sample", [])
    assert instantiate(cfg0["batch_sampler"]).neighbor_skin == 0.0
