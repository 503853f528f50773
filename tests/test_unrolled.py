"""Host-chunked unrolled BAOAB: stationary distribution + shape semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamun_tpu.sampling.mcmc import MCMCConfig
from jamun_tpu.sampling.unrolled import UnrolledBAOAB


@pytest.mark.slow
def test_unrolled_baoab_stationary():
    k = 4.0
    cfg = MCMCConfig(delta=0.05, friction=1.0, steps=2001, save_every_n_steps=1)
    walk = UnrolledBAOAB(cfg, chunk_steps=50)
    y0 = jnp.zeros((64, 3))
    y, v, traj, _ = walk(jax.random.PRNGKey(0), y0, lambda x: -k * x, v_init="gaussian")
    samples = np.asarray(traj[10:]).reshape(-1)
    var = samples.var()
    assert abs(var - 1.0 / k) < 0.3 / k, var
    assert traj.shape[0] == 1 + 2000


@pytest.mark.slow
def test_unrolled_matches_frame_count_with_save_every():
    cfg = MCMCConfig(delta=0.01, steps=101, save_every_n_steps=10)
    walk = UnrolledBAOAB(cfg, chunk_steps=20)
    y0 = jnp.ones((4, 3))
    y, v, traj, _ = walk(jax.random.PRNGKey(0), y0, lambda x: -x)
    assert traj.shape[0] == (1 + 100 + 9) // 10 or traj.shape[0] == 11
