"""Training driver: epochs, validation, checkpointing, throughput timing.

Replaces PyTorch Lightning's Trainer as configured by the reference
(`hydra_config/trainer/default.yaml`, callbacks in
`/root/reference/src/jamun/callbacks/`): EMA is inside the train step, the
Timing callback becomes samples/sec tracking here, EarlyStopping's
check_finite behavior (`hydra_config/callbacks/early_stopping.yaml`) aborts on
non-finite validation loss.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from jamun_tpu.data.datamodule import DataModule
from jamun_tpu.models.denoiser import Denoiser
from jamun_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from jamun_tpu.train.checkpoints import CheckpointManager, restore_checkpoint
from jamun_tpu.train.diagnostics import SigmaDistributionDiagnostics
from jamun_tpu.train.loggers import ConsoleLogger, MultiLogger
from jamun_tpu.train.state import TrainState, create_train_state, make_eval_step, make_train_step

log = logging.getLogger("jamun_tpu")

__all__ = ["TrainerConfig", "Trainer", "denoiser_without_kernels"]

_KERNEL_FLAGS = ("use_pallas", "fused_stack", "tiled_kernel_training")


def denoiser_without_kernels(denoiser: Denoiser) -> Optional[Denoiser]:
    """A copy of `denoiser` with every Pallas-kernel flag on its arch turned
    off, or None if no kernel flag is enabled (nothing to fall back from).

    Kernel flags do not change the parameter structure (the kernels are
    alternative execution paths for the same math, parity-tested in
    tests/test_pallas_conv.py), so the same TrainState runs on both."""
    arch = denoiser.arch
    updates = {k: False for k in _KERNEL_FLAGS if getattr(arch, k, False)}
    if not updates:
        return None
    return Denoiser(arch.clone(**updates), denoiser.config)


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 10
    max_steps: Optional[int] = None
    val_every_n_steps: Optional[int] = None  # None: validate at epoch end
    val_max_batches: int = 50
    log_every_n_steps: int = 50
    checkpoint_dir: str = "checkpoints"
    checkpoint_top_k: int = 5
    ema_decay: float = 0.999
    check_finite: bool = True  # abort on non-finite val loss
    num_devices: Optional[int] = None  # data-parallel devices (None: all)
    atom_sharded: object = "auto"  # false | true | "auto": shard the ATOM axis
    # of each molecule over the mesh instead of data-parallel graph sharding
    # (jamun_tpu/parallel/atom_sharded.py, SURVEY 5.7). "auto" engages when the
    # padded molecule reaches atom_shard_threshold atoms — the train_idrome
    # regime where one chip's pair work is better split than replicated.
    atom_shard_threshold: int = 1024
    seed: int = 0
    collect_sigma_diagnostics: bool = True  # sigma-vs-loss/grad-norm CSV+plots
    visualize_denoise_sigmas: tuple = ()  # e.g. (0.02, 0.04, 0.08): per-sigma val RMSD


class Trainer:
    def __init__(self, config: TrainerConfig, loggers=None):
        self.config = config
        self.logger = loggers or MultiLogger(ConsoleLogger(every_n=1))
        self.ckpt = CheckpointManager(config.checkpoint_dir, top_k=config.checkpoint_top_k)
        self.diagnostics = (
            SigmaDistributionDiagnostics(os.path.join(config.checkpoint_dir, "..", "diagnostics"))
            if config.collect_sigma_diagnostics
            else None
        )

    def fit(
        self,
        denoiser: Denoiser,
        optimizer,
        sigma_distribution,
        datamodule: DataModule,
        resume_from: Optional[str] = None,
    ) -> TrainState:
        cfg = self.config
        mesh = make_mesh(cfg.num_devices)
        n_dev = mesh.devices.size

        if getattr(datamodule, "streaming", False) and not cfg.max_steps:
            # streaming batches are epoch-less (`data/datamodule.py:_iter_batches`
            # yields forever), so a max_epochs-only budget would hang in epoch 0
            raise ValueError(
                "streaming datamodules are epoch-less: set trainer.max_steps "
                "(max_epochs alone never terminates a streaming epoch)"
            )

        example = next(iter(datamodule.train_batches(0)))

        if getattr(denoiser, "sparse_neighbors_active", None) and denoiser.sparse_neighbors_active(
            example.max_nodes, training=True
        ):
            # the sparse path drops in-cutoff edges beyond the cap; the
            # dropped-edge counts land in metrics.csv as
            # train/neighbor_overflow_{mean,max} (VERDICT r4 #6)
            log.info(
                "sparse capped-neighbor path active: N=%d at/above the training "
                "crossover (neighbor_cap=%d)",
                example.max_nodes, int(getattr(denoiser.arch, "neighbor_cap", 32)),
            )

        from jamun_tpu.parallel.atom_sharded import (
            denoiser_with_atom_sharding,
            pad_atoms_to_multiple,
            prepare_atom_sharded_batch,
            resolve_atom_sharded,
        )

        if resolve_atom_sharded(
            cfg.atom_sharded, example.max_nodes, cfg.atom_shard_threshold, n_dev
        ):
            # atom-sharded (context-parallel) mode: each molecule's atom axis
            # is split over the mesh; graphs stay replicated (no DP)
            log.info(
                "atom-sharded mode: N=%d atoms split over %d devices",
                example.max_nodes, n_dev,
            )
            denoiser = denoiser_with_atom_sharding(denoiser, mesh)

            def prep_batch(b):
                return prepare_atom_sharded_batch(pad_atoms_to_multiple(b, n_dev), mesh)
        else:
            def prep_batch(b):
                return shard_batch(b, mesh)

        self._prep_batch = prep_batch
        state = create_train_state(denoiser, optimizer, example, seed=cfg.seed)
        if resume_from:
            state = restore_checkpoint(resume_from, state)
            log.info("resumed from %s at step %d", resume_from, int(state.step))
        state = replicate(state, mesh)

        # NOTE: buffer donation is NOT used — the axon TPU backend rejects
        # donated buffers (INVALID_ARGUMENT); the state is small enough to copy.
        self._denoiser = denoiser
        train_step = jax.jit(
            make_train_step(denoiser, optimizer, sigma_distribution, cfg.ema_decay)
        )
        eval_step = jax.jit(make_eval_step(denoiser, sigma_distribution))

        def step_with_fallback(state, batch):
            """Run one train step; if it fails while Pallas kernels are
            enabled (e.g. a Mosaic compile failure — the N=112 backward
            kernel runs within ~8 MB of the 128 MiB VMEM budget, see
            BENCH_NOTES round 3e), degrade the whole run to the parity-tested
            XLA path with a warning instead of aborting the training run.
            Compiles happen per shape bucket, so this can trigger at any
            step, not just the first."""
            nonlocal train_step, eval_step, denoiser
            try:
                return train_step(state, batch)
            except Exception as e:  # noqa: BLE001 — fallback re-raises below
                fallback = denoiser_without_kernels(denoiser)
                if fallback is None:
                    raise
                log.warning(
                    "train step failed with Pallas kernels enabled (%s: %s); "
                    "retrying this batch on the XLA path with kernels disabled",
                    type(e).__name__, e,
                )
                denoiser = fallback
                self._denoiser = fallback
                train_step = jax.jit(
                    make_train_step(fallback, optimizer, sigma_distribution, cfg.ema_decay)
                )
                eval_step = jax.jit(make_eval_step(fallback, sigma_distribution))
                return train_step(state, batch)

        step = int(state.step)
        samples_seen = 0
        t_start = time.perf_counter()
        stop = False
        for epoch in range(cfg.max_epochs):
            if stop:
                break
            for batch in datamodule.train_batches(epoch):
                batch = prep_batch(batch)
                state, aux = step_with_fallback(state, batch)
                step += 1
                samples_seen += batch.num_graphs
                if step % cfg.log_every_n_steps == 0:
                    host_aux = jax.device_get(aux)
                    if self.diagnostics:
                        self.diagnostics.update(host_aux, step)
                    metrics = {f"train/{k}": float(v) for k, v in host_aux.items()}
                    elapsed = time.perf_counter() - t_start
                    metrics["train/samples_per_sec"] = samples_seen / elapsed
                    metrics["train/steps_per_sec"] = step / elapsed
                    metrics["epoch"] = epoch
                    self.logger.log_metrics(metrics, step)
                if cfg.val_every_n_steps and step % cfg.val_every_n_steps == 0:
                    stop = self._validate(state, eval_step, datamodule, step, mesh) or stop
                if cfg.max_steps and step >= cfg.max_steps:
                    stop = True
                if stop:
                    break
            if not cfg.val_every_n_steps:
                stop = self._validate(state, eval_step, datamodule, step, mesh) or stop
            if self.diagnostics:
                self.diagnostics.flush(epoch)
        self.logger.finalize()
        return jax.device_get(state)

    def _validate(self, state, eval_step, datamodule, step: int, mesh) -> bool:
        """Returns True if training should stop (non-finite loss)."""
        cfg = self.config
        totals: Dict[str, float] = {}
        n = 0
        key = jax.random.PRNGKey(cfg.seed + step)
        for i, batch in enumerate(datamodule.val_batches()):
            if i >= cfg.val_max_batches:
                break
            key, sub = jax.random.split(key)
            # validation batches ride the same prep as train batches (mesh
            # sharding, or atom-sharded bond repartition); host-placed batches
            # against mesh-replicated state would migrate (or fail) on a real
            # multi-chip mesh
            batch = self._prep_batch(batch)
            aux = jax.device_get(eval_step(state, batch, sub))
            for k, v in aux.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        if n == 0:
            return False
        metrics = {f"val/{k}": v / n for k, v in totals.items()}
        if cfg.visualize_denoise_sigmas:
            # per-sigma denoise visualization metrics (reference VisualizeDenoise)
            from jamun_tpu.train.diagnostics import visualize_denoise_metrics

            batch0 = shard_batch(next(iter(datamodule.val_batches())), mesh)
            per_sigma = visualize_denoise_metrics(
                self._denoiser, state.ema_params, batch0, sigmas=cfg.visualize_denoise_sigmas
            )
            for sig, aux2 in per_sigma.items():
                metrics[f"val/scaled_rmsd_sigma{sig}"] = aux2["scaled_rmsd"]
        self.logger.log_metrics(metrics, step)
        self.ckpt.save(jax.device_get(state), step, metrics)
        if self.config.check_finite and not np.isfinite(metrics.get("val/loss", 0.0)):
            log.error("non-finite validation loss at step %d; stopping", step)
            return True
        return False
