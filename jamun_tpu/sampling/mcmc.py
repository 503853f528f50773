"""Underdamped Langevin MCMC integrators (BAOAB / ABOBA splitting schemes) as
single fused `lax.scan` programs.

Reference: `/root/reference/src/jamun/sampling/mcmc/functional/_splitting.py:44-180`
runs a Python loop with one CUDA launch sequence per step (the #1 hot loop of
the system, 10k-20k steps per batch). Here the whole walk — including every
denoiser forward — is one XLA program: zero host sync until the batch ends,
which is where the TPU wall-clock win comes from.

Semantics parity notes (vs the reference loops):
  - the reference iterates `for i in range(1, steps)`, i.e. steps-1 updates;
    we match that: `steps` means the same config value.
  - saved frames are those with i % save_every == 0 and i >= burn_in, plus the
    initial state (the reference appends y at i=0 when burn_in == 0).
  - BAOAB evaluates the score once before the loop and reuses it across the
    step boundary; we carry it identically.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

__all__ = [
    "MCMCConfig",
    "BAOAB",
    "ABOBA",
    "NeighborCachedScore",
    "make_processed_score_fn",
    "initialize_velocity",
]


@dataclasses.dataclass(frozen=True)
class NeighborCachedScore:
    """Verlet-list-style cached-neighbor score for the sparse execution path.

    The MD-native amortization of graph construction (the role torch_cluster's
    per-forward `radius_graph` plays in the reference, `denoiser.py:149`):
    `rebuild(y)` builds a capped neighbor list within (cutoff + skin);
    `score(y, cache)` evaluates the denoiser score against the CACHED list
    (edge geometry from current positions, list membership from the cache,
    true-cutoff masking per step). The list stays a superset of all in-cutoff
    pairs as long as no atom moved more than skin/2 since the rebuild — the
    walk rebuilds exactly when `max_i ||y_i - y_i^ref|| > threshold`
    (threshold = skin/2, the classic Verlet criterion), so per-step cost drops
    from O(N^2)+top_k to O(N*K) with cutoff-exact semantics (modulo the K cap
    that both paths share)."""

    rebuild: Callable  # y [G, N, 3] -> cache pytree
    score: Callable    # (y, cache) -> score [G, N, 3]
    threshold: float   # rebuild when max per-atom displacement exceeds this


def make_processed_score_fn(
    score_fn: Callable,
    inverse_temperature: float = 1.0,
    score_fn_clip: Optional[float] = None,
    cached: Optional[NeighborCachedScore] = None,
):
    """Clip the score by per-atom norm and scale by inverse temperature,
    threading the neighbor-cache state when `cached` is given.
    Returns processed(y, aux) -> (processed_score, original_score, aux).
    Reference `_splitting.py:26-41` (the aux plumbing has no reference
    counterpart — the reference rebuilds its graph every forward)."""

    def clip_scale(orig):
        score = orig
        if score_fn_clip is not None:
            norm = jnp.linalg.norm(score, axis=-1, keepdims=True)
            clip = jnp.minimum(norm, score_fn_clip)
            score = score / jnp.maximum(norm, 1e-20) * clip
        return score * inverse_temperature

    if cached is None:

        def processed(y, aux=None):
            orig = score_fn(y)
            return clip_scale(orig), orig, aux

        return processed

    thr2 = float(cached.threshold) ** 2

    def processed_cached(y, aux):
        cache, y_ref = aux
        disp2 = jnp.max(jnp.sum((y - y_ref) ** 2, axis=-1))
        cache, y_ref = jax.lax.cond(
            disp2 > thr2,
            lambda: (cached.rebuild(y), y),
            lambda: (cache, y_ref),
        )
        orig = cached.score(y, cache)
        return clip_scale(orig), orig, (cache, y_ref)

    return processed_cached


def initialize_velocity(v_init, y: jnp.ndarray, u: float, key) -> jnp.ndarray:
    if isinstance(v_init, str):
        if v_init == "gaussian":
            return math.sqrt(u) * jax.random.normal(key, y.shape, y.dtype)
        if v_init == "zero":
            return jnp.zeros_like(y)
        raise ValueError(f"{v_init} not in (gaussian, zero)")
    return v_init


@dataclasses.dataclass(frozen=True)
class MCMCConfig:
    delta: float = 1.0
    friction: float = 1.0
    M: float = 1.0  # mass
    steps: int = 128
    save_every_n_steps: int = 1
    burn_in_steps: int = 0
    inverse_temperature: float = 1.0
    score_fn_clip: Optional[float] = None

    @property
    def u(self) -> float:
        return 1.0 / self.M

    @property
    def first_save_step(self) -> int:
        """First absolute step index saved: the smallest multiple of
        save_every_n_steps that is >= burn_in_steps (reference saves at
        absolute i with i % save_every == 0 and i >= burn_in)."""
        s = self.save_every_n_steps
        return ((self.burn_in_steps + s - 1) // s) * s

    @property
    def num_saved_frames(self) -> int:
        total = max(self.steps - 1, 0)
        if self.first_save_step > total:
            return 0
        return 1 + (total - self.first_save_step) // self.save_every_n_steps


class _SplittingSampler:
    """Shared scan machinery for BAOAB/ABOBA."""

    def __init__(self, config: MCMCConfig):
        self.config = config

    def __call__(
        self,
        key,
        y: jnp.ndarray,
        score_fn: Callable,
        v_init: Union[str, jnp.ndarray] = "zero",
        mask: Optional[jnp.ndarray] = None,
        cached_score: Optional[NeighborCachedScore] = None,
    ):
        """Run the walk. y: positions [..., 3]; score_fn: y -> score (same shape);
        mask: optional multiplicative noise mask (e.g. node padding);
        cached_score: Verlet-cached neighbor lists for the sparse path — the
        walk then carries (cache, y_ref) and rebuilds on the displacement
        trigger instead of rebuilding the graph every score call.

        Returns (y, v, y_traj, score_traj) with trajectories stacked on axis 0
        ([n_saves, ...]), mirroring `baoab(...)`'s return signature.
        """
        cfg = self.config
        processed = make_processed_score_fn(
            score_fn, cfg.inverse_temperature, cfg.score_fn_clip, cached=cached_score
        )
        aux0 = (cached_score.rebuild(y), y) if cached_score is not None else None
        key, vkey = jax.random.split(key)
        v = initialize_velocity(v_init, y, cfg.u, vkey)
        if mask is not None:
            v = v * mask

        zeta2 = math.sqrt(1.0 - math.exp(-2.0 * cfg.friction))
        damp = math.exp(-cfg.friction)
        sqrt_u = math.sqrt(cfg.u)

        def noise(key, shape, dtype):
            r = jax.random.normal(key, shape, dtype)
            return r * mask if mask is not None else r

        carry = self._init_carry(y, v, processed, aux0)

        def one_step(carry, key):
            return self._step(carry, key, processed, cfg, damp, zeta2, sqrt_u, noise), None

        def run_steps(carry, key, n):
            if n <= 0:
                return carry
            keys = jax.random.split(key, n)
            carry, _ = jax.lax.scan(lambda c, k: one_step(c, k), carry, keys)
            return carry

        # Saves happen at absolute steps i with i % save_every == 0 and
        # i >= burn_in (reference `_splitting.py:137-171`); burn-in therefore
        # runs up to the save grid, not just burn_in_steps.
        total = max(cfg.steps - 1, 0)
        first_save = cfg.first_save_step
        if first_save > total:
            pre = total
            n_chunks = 0
            remainder = 0
        else:
            pre = first_save
            n_chunks = (total - first_save) // cfg.save_every_n_steps
            remainder = total - first_save - n_chunks * cfg.save_every_n_steps

        key, bkey = jax.random.split(key)
        carry = run_steps(carry, bkey, pre)
        carry0 = carry  # state at absolute step first_save (saved frame below)

        key, ckey = jax.random.split(key)
        if n_chunks > 0 and cfg.save_every_n_steps == 1:
            # flat scan with per-step outputs (no nested scan: faster compiles)
            def step_and_save(carry, k):
                carry, _ = one_step(carry, k)
                return carry, (self._get_y(carry), self._get_score(carry))

            carry, (y_traj, score_traj) = jax.lax.scan(
                step_and_save, carry, jax.random.split(ckey, n_chunks)
            )
        elif n_chunks > 0:

            def chunk(carry, key):
                carry = run_steps(carry, key, cfg.save_every_n_steps)
                return carry, (self._get_y(carry), self._get_score(carry))

            carry, (y_traj, score_traj) = jax.lax.scan(
                chunk, carry, jax.random.split(ckey, n_chunks)
            )
        else:
            y_traj = jnp.zeros((0,) + y.shape, y.dtype)
            score_traj = jnp.zeros((0,) + y.shape, y.dtype)

        if first_save <= total:
            # frame at absolute step first_save: initial state when burn_in==0,
            # else the post-burn-in carry (first on-grid step past burn-in)
            if first_save == 0:
                f0, s0 = y, self._initial_score(y, processed, aux0)
            else:
                f0, s0 = self._get_y(carry0), self._get_score(carry0)
            y_traj = jnp.concatenate([f0[None], y_traj], axis=0)
            score_traj = jnp.concatenate([s0[None], score_traj], axis=0)

        key, rkey = jax.random.split(key)
        carry = run_steps(carry, rkey, remainder)
        return self._get_y(carry), self._get_v(carry), y_traj, score_traj


class BAOAB(_SplittingSampler):
    """BAOAB splitting (Leimkuhler-Matthews §7.3); reference `_splitting.py:112-180`."""

    def _init_carry(self, y, v, processed, aux0=None):
        psi, orig, aux = processed(y, aux0)
        return (y, v, psi, orig, aux)

    def _initial_score(self, y, processed, aux0=None):
        return processed(y, aux0)[1]

    @staticmethod
    def _step(carry, key, processed, cfg, damp, zeta2, sqrt_u, noise):
        y, v, psi, _, aux = carry
        d2 = cfg.delta / 2.0
        v = v + cfg.u * d2 * psi  # B
        y = y + d2 * v  # A
        R = noise(key, y.shape, y.dtype)
        vhat = damp * v + zeta2 * sqrt_u * R  # O
        y = y + d2 * vhat  # A
        psi, orig, aux = processed(y, aux)
        v = vhat + d2 * psi  # B
        return (y, v, psi, orig, aux)

    @staticmethod
    def _get_y(carry):
        return carry[0]

    @staticmethod
    def _get_v(carry):
        return carry[1]

    @staticmethod
    def _get_score(carry):
        return carry[3]


class ABOBA(_SplittingSampler):
    """ABOBA splitting; reference `_splitting.py:44-109`."""

    def _init_carry(self, y, v, processed, aux0=None):
        return (y, v, jnp.zeros_like(y), aux0)

    def _initial_score(self, y, processed, aux0=None):
        return processed(y, aux0)[1]

    @staticmethod
    def _step(carry, key, processed, cfg, damp, zeta2, sqrt_u, noise):
        y, v, _, aux = carry
        d2 = cfg.delta / 2.0
        y = y + d2 * v  # A
        psi, orig, aux = processed(y, aux)
        v = v + cfg.u * d2 * psi  # B
        R = noise(key, y.shape, y.dtype)
        vhat = damp * v + zeta2 * sqrt_u * R  # O
        v = vhat + d2 * psi  # B
        y = y + d2 * v  # A
        return (y, v, orig, aux)

    @staticmethod
    def _get_y(carry):
        return carry[0]

    @staticmethod
    def _get_v(carry):
        return carry[1]

    @staticmethod
    def _get_score(carry):
        return carry[2]
