"""Denoiser core: EDM-style preconditioning around an equivariant architecture.

Pure-functional port of `/root/reference/src/jamun/model/denoiser.py:13-353`
(a PyTorch-Lightning module there): all methods take explicit params/rng and
are jit/vmap/scan-safe. Exact formula parity:

  A = average_squared_distance, B = 2*D*sigma^2
  c_in = 1/sqrt(A+B), c_skip = A/(A+B), c_out = sqrt(A*B/(A+B)), c_noise = log(sigma)/4
  effective_radial_cutoff = sqrt(max_radius^2 + 6 sigma^2)   (denoiser.py:134-136)
  xhat = c_skip*y + c_out*g(c_in*y, c_noise, cutoff/c_in)     (denoiser.py:168-201)
  score = (xhat - y)/sigma^2                                  (denoiser.py:111-114)
  loss  = mean_graph[ sum_D (xhat-x)^2 ] * loss_weight / c_out^2
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from jamun_tpu.models.e3conv import irreps_to_vector
from jamun_tpu.ops.geometry import kabsch_align, mean_center
from jamun_tpu.ops.graph import GraphBatch

__all__ = ["DenoiserConfig", "Denoiser", "normalization_factors"]


def normalization_factors(sigma, average_squared_distance, D: int = 3):
    A = jnp.asarray(average_squared_distance)
    B = 2.0 * D * jnp.asarray(sigma) ** 2
    c_in = 1.0 / jnp.sqrt(A + B)
    c_skip = A / (A + B)
    c_out = jnp.sqrt((A * B) / (A + B))
    c_noise = jnp.log(jnp.asarray(sigma)) / 4.0
    return c_in, c_skip, c_out, c_noise


def loss_weight(sigma, average_squared_distance, D: int = 3):
    _, _, c_out, _ = normalization_factors(sigma, average_squared_distance, D)
    return 1.0 / (c_out**2)


@dataclasses.dataclass(frozen=True)
class DenoiserConfig:
    max_radius: float
    average_squared_distance: float
    align_noisy_input_during_training: bool = True
    align_noisy_input_during_evaluation: bool = True
    mean_center: bool = True
    mirror_augmentation_rate: float = 0.0
    add_fixed_noise: bool = False  # debug determinism knob (denoiser.py:52-59)
    add_fixed_ones: bool = False
    # stored-but-unused in the reference too (denoiser.py:85 assigns, nothing
    # reads it in compute_loss); kept for constructor parity
    bond_loss_coefficient: float = 1.0


class Denoiser:
    """Wraps an equivariant arch (flax module mapping (batch, c_noise, cutoff)
    -> per-atom output irreps) with preconditioning, noising and loss."""

    def __init__(self, arch, config: DenoiserConfig):
        self.arch = arch
        self.config = config
        # whether the arch's __call__ accepts the `training` dispatch flag
        # (E3Conv does; Ophiuchus/contrib archs may not — then it isn't passed)
        import inspect

        try:
            arch_params = inspect.signature(type(arch).__call__).parameters
            self._arch_takes_training = "training" in arch_params
            self._arch_takes_nbr_cache = "nbr_cache" in arch_params
        except (TypeError, ValueError):
            self._arch_takes_training = False
            self._arch_takes_nbr_cache = False

    # ---- init ----

    def init(self, key, example_batch: GraphBatch):
        c_in, _, _, c_noise = normalization_factors(0.04, self.config.average_squared_distance)
        cutoff = self.effective_radial_cutoff(0.04) / c_in
        # jit: eager per-op dispatch is pathologically slow on remote TPU backends
        return jax.jit(self.arch.init)(key, example_batch, c_noise[None], cutoff)

    # ---- preconditioning ----

    def effective_radial_cutoff(self, sigma):
        return jnp.sqrt(self.config.max_radius**2 + 6.0 * jnp.asarray(sigma) ** 2)

    def xhat_normalized(
        self, params, y: GraphBatch, sigma, training: bool = False,
        with_telemetry: bool = False, nbr_cache=None,
    ):
        """`with_telemetry=True` additionally returns a dict of sown arch
        intermediates (today: "neighbor_overflow" [G] — edges dropped by the
        sparse path's K cap, empty when the arch ran dense)."""
        D = y.pos.shape[-1]
        c_in, c_skip, c_out, c_noise = normalization_factors(
            sigma, self.config.average_squared_distance, D
        )
        radial_cutoff = self.effective_radial_cutoff(sigma) / c_in
        y_scaled = y.replace_pos(y.pos * c_in)
        kw = {"training": True} if (training and self._arch_takes_training) else {}
        if nbr_cache is not None and self._arch_takes_nbr_cache:
            kw["nbr_cache"] = nbr_cache
        if with_telemetry:
            g_out, inter = self.arch.apply(
                params, y_scaled, c_noise.reshape(-1), radial_cutoff,
                mutable=["intermediates"], **kw,
            )
            sown = inter.get("intermediates", {})
            tel = {
                k: v[0] if isinstance(v, (tuple, list)) else v
                for k, v in sown.items()
            }
            g_pos = irreps_to_vector(g_out)
            return c_skip * y.pos + c_out * g_pos, tel
        g_out = self.arch.apply(params, y_scaled, c_noise.reshape(-1), radial_cutoff, **kw)
        g_pos = irreps_to_vector(g_out)
        return c_skip * y.pos + c_out * g_pos

    def xhat(
        self, params, y: GraphBatch, sigma, training: bool = False,
        with_telemetry: bool = False, nbr_cache=None,
    ):
        pos = y.pos
        if self.config.mean_center:
            pos = mean_center(pos, y.node_mask)
        tel = {}
        if with_telemetry:
            xhat_pos, tel = self.xhat_normalized(
                params, y.replace_pos(pos), sigma, training=training, with_telemetry=True
            )
        else:
            xhat_pos = self.xhat_normalized(
                params, y.replace_pos(pos), sigma, training=training, nbr_cache=nbr_cache
            )
        if self.config.mean_center:
            xhat_pos = mean_center(xhat_pos, y.node_mask)
        return (xhat_pos, tel) if with_telemetry else xhat_pos

    def score(self, params, y: GraphBatch, sigma) -> jnp.ndarray:
        """score(y, sigma) = (xhat(y) - y) / sigma^2 — consumed by the Langevin walk."""
        return (self.xhat(params, y, sigma) - y.pos) / (jnp.asarray(sigma) ** 2)

    # ---- sparse-cap telemetry (sampling side) ----

    def sparse_neighbors_active(self, n_atoms: int, training: bool = False) -> bool:
        """Static: True when the arch's neighbor_mode resolves to the sparse
        capped-K path at this molecule size (the only path that drops edges)."""
        mode = getattr(self.arch, "neighbor_mode", None)
        if mode is None:
            return False
        if mode == "nbr":
            return True
        if mode == "auto":
            from jamun_tpu.models.e3conv import neighbor_mode_auto

            return neighbor_mode_auto(n_atoms, training)
        return False

    def neighbor_overflow(self, y: GraphBatch, sigma) -> jnp.ndarray:
        """[G] int32: in-cutoff edges dropped by the sparse path's K cap at
        these positions — the same geometry the arch's graph build sees
        (mean-centered, c_in-scaled positions against cutoff/c_in, matching
        `xhat_normalized`). Callers should gate on `sparse_neighbors_active`;
        the dense path drops nothing by construction."""
        from jamun_tpu.ops.neighbors import capped_neighbor_lists

        c_in, _, _, _ = normalization_factors(
            sigma, self.config.average_squared_distance, y.pos.shape[-1]
        )
        pos = y.pos
        if self.config.mean_center:
            pos = mean_center(pos, y.node_mask)
        _, _, overflow = capped_neighbor_lists(
            pos * c_in,
            y.node_mask,
            self.effective_radial_cutoff(sigma) / c_in,
            int(getattr(self.arch, "neighbor_cap", 32)),
        )
        return overflow

    def make_neighbor_cached_score(self, params, batch: GraphBatch, sigma, skin: float):
        """Verlet-cached score for the walk (`sampling/mcmc.NeighborCachedScore`).

        `skin` is in model-space nm (the walk's y coordinates). The cached
        list is the capped-K nearest within (effective cutoff + skin) built on
        the same geometry the arch's graph build sees (c_in-scaled positions
        vs cutoff/c_in — matching `xhat_normalized`; pairwise distances are
        translation-invariant so mean-centering is irrelevant here). Returns
        None when the arch will not run the sparse path at this size (the
        dense path builds no per-step lists to amortize) or skin <= 0.

        This replaces the reference's per-forward `radius_graph`
        (`/root/reference/src/jamun/model/denoiser.py:149`) with the MD-native
        Verlet-list scheme: rebuild only when some atom moved > skin/2."""
        N = batch.pos.shape[1]
        if skin <= 0 or not self.sparse_neighbors_active(N):
            return None
        if not self._arch_takes_nbr_cache:
            return None
        from jamun_tpu.ops.neighbors import capped_neighbor_lists
        from jamun_tpu.sampling.mcmc import NeighborCachedScore

        cap = int(getattr(self.arch, "neighbor_cap", 32))
        c_in, _, _, _ = normalization_factors(
            sigma, self.config.average_squared_distance, batch.pos.shape[-1]
        )
        cutoff_s = self.effective_radial_cutoff(sigma) / c_in

        def rebuild(y):
            idx, sup_mask, _overflow = capped_neighbor_lists(
                y * c_in, batch.node_mask, cutoff_s + skin * c_in, cap
            )
            return (idx, sup_mask)

        def score(y, cache):
            yb = batch.replace_pos(y)
            return (self.xhat(params, yb, sigma, nbr_cache=cache) - y) / (
                jnp.asarray(sigma) ** 2
            )

        return NeighborCachedScore(rebuild=rebuild, score=score, threshold=skin / 2.0)

    # ---- training path ----

    def add_noise(self, key, x: GraphBatch, sigma) -> GraphBatch:
        if self.config.add_fixed_ones:
            noise = jnp.ones_like(x.pos)
        elif self.config.add_fixed_noise:
            noise = jax.random.normal(jax.random.PRNGKey(0), x.pos.shape[1:])[None]
            noise = jnp.broadcast_to(noise, x.pos.shape)
        else:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.pos.shape)
        pos = x.pos + jnp.asarray(sigma) * noise * x.node_mask[..., None]
        if self.config.mirror_augmentation_rate > 0:
            key, sub = jax.random.split(key)
            flip = jax.random.uniform(sub) < self.config.mirror_augmentation_rate
            pos = jnp.where(flip, -pos, pos)
        return x.replace_pos(pos)

    def noise_and_denoise(
        self, params, key, x: GraphBatch, sigma, align_noisy_input: bool,
        training: bool = False, with_telemetry: bool = False,
    ):
        if self.config.mean_center:
            x = x.replace_pos(mean_center(x.pos, x.node_mask))
        y = self.add_noise(key, x, sigma)
        if self.config.mean_center:
            y = y.replace_pos(mean_center(y.pos, y.node_mask))
        if align_noisy_input:
            y = y.replace_pos(kabsch_align(y.pos, x.pos, x.node_mask))
        if with_telemetry:
            xhat_pos, tel = self.xhat(params, y, sigma, training=training, with_telemetry=True)
            return xhat_pos, y, x, tel
        xhat_pos = self.xhat(params, y, sigma, training=training)
        return xhat_pos, y, x

    def compute_loss(
        self, x: GraphBatch, xhat_pos: jnp.ndarray, sigma
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Returns per-graph scaled loss [G] and aux dict of per-graph metrics."""
        pos = x.pos
        if self.config.mean_center:
            pos = mean_center(pos, x.node_mask)
        D = pos.shape[-1]
        m = x.node_mask.astype(pos.dtype)
        per_atom = jnp.sum((xhat_pos - pos) ** 2, axis=-1) * m  # [G, N]
        count = jnp.maximum(jnp.sum(m, axis=-1), 1.0)  # [G]
        raw_loss = jnp.sum(per_atom, axis=-1) / count  # per-graph mean
        scaled_rmsd = jnp.sum(jnp.sqrt(per_atom + 1e-20) * m, axis=-1) / count
        scaled_rmsd = scaled_rmsd / (jnp.asarray(sigma) * jnp.sqrt(1.0 * D))
        w = loss_weight(sigma, self.config.average_squared_distance, D)
        scaled_loss = raw_loss * x.loss_weight * w
        return scaled_loss, {
            "coordinate_loss": scaled_loss,
            "raw_coordinate_loss": raw_loss,
            "scaled_rmsd": scaled_rmsd,
        }

    def noise_and_compute_loss(
        self, params, key, x: GraphBatch, sigma, align_noisy_input: bool,
        training: bool = False, with_telemetry: bool = False,
    ):
        if with_telemetry:
            xhat_pos, _, x_centered, tel = self.noise_and_denoise(
                params, key, x, sigma, align_noisy_input, training=training,
                with_telemetry=True,
            )
            per_graph, aux = self.compute_loss(x_centered, xhat_pos, sigma)
            return per_graph, aux, tel
        xhat_pos, _, x_centered = self.noise_and_denoise(
            params, key, x, sigma, align_noisy_input, training=training
        )
        return self.compute_loss(x_centered, xhat_pos, sigma)

    def training_loss(self, params, key, x: GraphBatch, sigma) -> Tuple[jnp.ndarray, Dict]:
        """Scalar loss averaged over valid graphs (the pjit-differentiated fn).

        Passes training=True so the arch picks kernels with efficient
        backwards (at N > 128 the XLA path — BENCH_NOTES round 3e). Sown arch
        telemetry (neighbor_overflow on the sparse path) is surfaced in aux
        as mean/max over valid graphs so the Trainer's metrics.csv carries it
        (VERDICT r4 #6 — IDRome users raising `neighbor_cap` need a logged
        number to react to)."""
        per_graph, aux, tel = self.noise_and_compute_loss(
            params, key, x, sigma, self.config.align_noisy_input_during_training,
            training=True, with_telemetry=True,
        )
        gm = x.graph_mask.astype(per_graph.dtype)
        denom = jnp.maximum(jnp.sum(gm), 1.0)
        loss = jnp.sum(per_graph * gm) / denom
        aux = {k: jnp.sum(v * gm) / denom for k, v in aux.items()}
        ov = tel.get("neighbor_overflow")
        if ov is not None:
            ovf = ov.astype(loss.dtype)
            aux["neighbor_overflow_mean"] = jnp.sum(ovf * gm) / denom
            aux["neighbor_overflow_max"] = jnp.max(jnp.where(x.graph_mask, ovf, 0.0))
        aux["loss"] = loss
        return loss, aux
