"""Quantitative ensemble-correctness gates on analytically known distributions.

The framework's north star (BASELINE.md) is ensemble quality: walk-jump samples
must reproduce the Boltzmann measure of the data. No real Timewarp/MDGen data
exists in this sandbox, so these tests gate correctness on systems whose
ensembles are known in closed form:

1. `test_walkjump_gaussian_mixture_analytic_score` — the SAMPLER alone.
   For a 1D Gaussian mixture p(x) = sum_k w_k N(mu_k, s^2), the sigma-smoothed
   density p_sigma = p * N(0, sigma^2) is again a mixture with variances
   s^2 + sigma^2, so its score and basin occupancies are exact. BAOAB walks
   p_sigma; the jump xhat = y + sigma^2 * score(y) is Tweedie's formula
   (= E[x|y], exactly what the denoiser identity implements — see
   `sampling/walkjump.py` fused_jump). Asserts basin occupancy and the
   Kolmogorov-Smirnov distance of the walk marginal against exact sampling.

2. `test_e2e_train_walkjump_bimodal_bond` (slow) — the FULL pipeline.
   A 2-atom "molecule" whose bond length is drawn from a known bimodal
   mixture; train the real E3Conv denoiser on exact samples, walk-jump, and
   assert the sampled bond-length basin occupancies and basin means match the
   ground truth. This is the strongest available stand-in for the reference's
   Ramachandran-JSD-vs-MD gate (`/root/reference/analysis/run_analysis.py:145-240`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig

# ---------------------------------------------------------------------------
# 1. Sampler-only gate: exact score of a smoothed Gaussian mixture
# ---------------------------------------------------------------------------

W = np.array([0.7, 0.3])
MU = np.array([-1.0, 1.0])
S_DATA = 0.5
SIGMA = 0.5


def _smoothed_logpdf_terms(y, var):
    # y: [..., 1] -> per-component weighted densities [..., K]
    d = y - MU[None, :]
    return W[None, :] * np.exp(-0.5 * d * d / var) / math.sqrt(2 * math.pi * var)


def _smoothed_score(y: jnp.ndarray) -> jnp.ndarray:
    """Exact score of p * N(0, SIGMA^2) for the mixture above. y: [..., 1]."""
    var = S_DATA**2 + SIGMA**2
    mu = jnp.asarray(MU)
    w = jnp.asarray(W)
    d = y - mu  # [..., K] via broadcast of trailing dim
    dens = w * jnp.exp(-0.5 * d * d / var)
    num = jnp.sum(dens * (-d / var), axis=-1, keepdims=True)
    den = jnp.sum(dens, axis=-1, keepdims=True)
    return num / jnp.maximum(den, 1e-30)


def _exact_smoothed_samples(rng, n):
    var = S_DATA**2 + SIGMA**2
    comp = rng.choice(2, size=n, p=W)
    return MU[comp] + math.sqrt(var) * rng.standard_normal(n)


def _occupancy_smoothed_neg():
    """P(y < 0) under the smoothed mixture (exact, via the normal CDF)."""
    from math import erf, sqrt

    var = S_DATA**2 + SIGMA**2
    phi = lambda z: 0.5 * (1 + erf(z / sqrt(2)))
    return float(sum(w * phi((0.0 - m) / math.sqrt(var)) for w, m in zip(W, MU)))


def test_walkjump_gaussian_mixture_analytic_score():
    chains = 512
    cfg = MCMCConfig(delta=0.25, friction=1.0, M=1.0, steps=2001, save_every_n_steps=10)
    mcmc = BAOAB(cfg)

    rng = np.random.default_rng(0)
    # init from the exact smoothed density (as walk-jump inits from data+noise)
    y0 = jnp.asarray(_exact_smoothed_samples(rng, chains).reshape(chains, 1))

    def score_fn(y):
        return _smoothed_score(y)

    y, v, y_traj, score_traj = jax.jit(
        lambda key, y0: mcmc(key, y0, score_fn, v_init="gaussian")
    )(jax.random.PRNGKey(1), y0)
    # drop an initial transient, pool chains x frames
    ys = np.asarray(y_traj)[5:].reshape(-1)
    xhat = np.asarray(y_traj + SIGMA**2 * score_traj)[5:].reshape(-1)

    # (a) walk marginal: basin occupancy matches the exact smoothed mixture
    occ_exact = _occupancy_smoothed_neg()
    occ_walk = float(np.mean(ys < 0))
    assert abs(occ_walk - occ_exact) < 0.02, (occ_walk, occ_exact)

    # (b) walk marginal: two-sample KS distance against exact sampling
    exact = np.sort(_exact_smoothed_samples(rng, ys.size))
    qs = np.searchsorted(exact, np.sort(ys)) / exact.size
    ks = float(np.max(np.abs(qs - np.arange(1, ys.size + 1) / ys.size)))
    assert ks < 0.03, ks  # BAOAB O(delta^2) bias + finite sampling

    # (c) jumped samples: basin occupancy of E[x|y] matches the occupancy of
    # the same functional applied to exact smoothed samples
    xhat_exact = np.asarray(_smoothed_score(jnp.asarray(exact[:, None])))
    xhat_exact = exact + SIGMA**2 * xhat_exact[:, 0]
    occ_jump = float(np.mean(xhat < 0))
    occ_jump_exact = float(np.mean(xhat_exact < 0))
    assert abs(occ_jump - occ_jump_exact) < 0.02, (occ_jump, occ_jump_exact)

    # (d) basin means of the jumped distribution (sharper than the walk's)
    m_neg = float(np.mean(xhat[xhat < 0]))
    m_neg_exact = float(np.mean(xhat_exact[xhat_exact < 0]))
    assert abs(m_neg - m_neg_exact) < 0.05, (m_neg, m_neg_exact)


# ---------------------------------------------------------------------------
# 2. End-to-end gate: train the real denoiser on a bimodal-bond molecule
# ---------------------------------------------------------------------------

BOND_W = (0.65, 0.35)
BOND_MU = (0.35, 0.50)  # nm
BOND_S = 0.03
E2E_SIGMA = 0.06


def _bimodal_bond_batch(rng: np.random.Generator, num_graphs: int):
    """2-atom molecules: bond length from the bimodal mixture, random
    orientation, mean-centered."""
    from jamun_tpu.ops.graph import GraphBatch

    G = num_graphs
    comp = rng.choice(2, size=G, p=BOND_W)
    r = np.asarray(BOND_MU)[comp] + BOND_S * rng.standard_normal(G)
    u = rng.standard_normal((G, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    pos = np.zeros((G, 2, 3), np.float32)
    pos[:, 0] = +0.5 * r[:, None] * u
    pos[:, 1] = -0.5 * r[:, None] * u
    ones = np.ones((G, 2), dtype=np.int32)
    return GraphBatch(
        pos=jnp.asarray(pos),
        node_mask=jnp.ones((G, 2), bool),
        atom_type_index=jnp.asarray(ones * 1),
        atom_code_index=jnp.asarray(ones * 1),
        residue_code_index=jnp.asarray(ones * 1),
        residue_sequence_index=jnp.asarray(ones * 0),
        bond_src=jnp.asarray(np.tile(np.array([[0, 1]], np.int32), (G, 1))),
        bond_dst=jnp.asarray(np.tile(np.array([[1, 0]], np.int32), (G, 1))),
        bond_mask=jnp.ones((G, 2), bool),
        loss_weight=jnp.ones((G,)),
        graph_mask=jnp.ones((G,), bool),
    )


@pytest.mark.slow
def test_e2e_train_walkjump_bimodal_bond():
    import optax

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.sampling.walkjump import SingleMeasurementSampler
    from jamun_tpu.train.distributions import ConstantSigma
    from jamun_tpu.train.state import create_train_state, make_train_step

    rng = np.random.default_rng(0)

    # average squared (pairwise) distance of the data = E[r^2]
    asd = float(
        sum(w * (m**2 + BOND_S**2) for w, m in zip(BOND_W, BOND_MU))
    )
    arch = E3Conv(
        irreps_hidden="32x0e + 8x1e",
        n_layers=2,
        edge_attr_dim=64,
        tensor_product="uvu",
        atom_type_embedding_dim=4,
        atom_code_embedding_dim=4,
        residue_code_embedding_dim=4,
        residue_index_embedding_dim=4,
    )
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=asd))

    batch0 = _bimodal_bond_batch(rng, 256)
    opt = optax.adam(2e-3)
    state = create_train_state(den, opt, batch0, seed=0)
    step = jax.jit(make_train_step(den, opt, ConstantSigma(E2E_SIGMA)))

    losses = []
    for i in range(800):
        batch = _bimodal_bond_batch(rng, 256)
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    # The EDM loss has an irreducible noise floor (posterior variance /
    # c_out^2): measured ~0.068 from a 0.086 c_skip-baseline start for this
    # system, so assert the gap to the floor closed rather than a large drop.
    assert np.mean(losses[-50:]) < 0.9 * np.mean(losses[:20]), "training did not converge"

    # walk-jump off training-data inits
    chains = 64
    init = _bimodal_bond_batch(rng, chains)
    cfg = MCMCConfig(
        delta=E2E_SIGMA, friction=1.0, M=1.0, steps=2001,
        save_every_n_steps=10, score_fn_clip=1000.0,
    )
    sampler = SingleMeasurementSampler(mcmc=BAOAB(cfg), sigma=E2E_SIGMA)
    key = jax.random.PRNGKey(7)
    mask = init.node_mask[..., None].astype(init.pos.dtype)
    y0 = init.pos + E2E_SIGMA * jax.random.normal(key, init.pos.shape) * mask
    out = jax.jit(
        lambda key, y0: sampler.walk_jump(den, state.ema_params, init, key, y0)
    )(jax.random.PRNGKey(8), y0)

    xh = np.asarray(out["xhat_traj"])[5:]  # [F, G, 2, 3], drop transient
    r = np.linalg.norm(xh[..., 0, :] - xh[..., 1, :], axis=-1).reshape(-1)

    # headline gate: basin occupancy (measured 0.635 vs 0.65 on this recipe)
    thresh = 0.5 * (BOND_MU[0] + BOND_MU[1])
    occ = float(np.mean(r < thresh))
    assert abs(occ - BOND_W[0]) < 0.10, f"basin occupancy {occ} vs {BOND_W[0]}"
    # within-basin means: the 2-layer toy denoiser leaves the jumped marginal
    # broader than the data (std ~0.09 vs 0.03), and conditioning on the
    # threshold shifts the basin means by ~0.05 — gate at 0.08.
    m0 = float(np.mean(r[r < thresh]))
    m1 = float(np.mean(r[r >= thresh]))
    assert abs(m0 - BOND_MU[0]) < 0.08, (m0, BOND_MU[0])
    assert abs(m1 - BOND_MU[1]) < 0.08, (m1, BOND_MU[1])
