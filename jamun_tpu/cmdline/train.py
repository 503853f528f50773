"""`jamun-tpu-train`: config-driven training entry point.

Reference: `/root/reference/src/jamun/cmdline/train.py:37-113` (Hydra +
Lightning there). Flow: compose config -> datasets -> optional normalization
pre-pass -> Denoiser + optimizer -> Trainer.fit (+ checkpoint resume).
"""

from __future__ import annotations

import argparse
import logging
import os

from jamun_tpu.cmdline.common import build_denoiser, build_optimizer, setup_logging
from jamun_tpu.config.compose import compose
from jamun_tpu.config.instantiate import instantiate
from jamun_tpu.data.datamodule import DataModule
from jamun_tpu.train.loggers import ConsoleLogger, CSVLogger, MultiLogger, maybe_wandb_logger
from jamun_tpu.train.loop import Trainer, TrainerConfig
from jamun_tpu.utils.average_squared_distance import compute_average_squared_distance_from_datasets

log = logging.getLogger("jamun_tpu")

DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config", "defaults")


def run(cfg) -> None:
    import jax

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()

    datasets = instantiate(cfg["data"]["datasets"])
    val_cfg = cfg["data"].get("val_datasets")
    val_datasets = instantiate(val_cfg) if val_cfg else []

    dm_cfg = dict(cfg["data"]["datamodule"])
    dm_cfg.pop("_target_", None)
    datamodule = DataModule(datasets=datasets, val_datasets=val_datasets, **dm_cfg)

    asd = cfg["model"].get("average_squared_distance")
    if asd is None and cfg.get("compute_average_squared_distance", True):
        cutoff = float(cfg["model"].get("max_radius") or 1.0)
        asd = compute_average_squared_distance_from_datasets(datasets, cutoff)
        log.info("computed average_squared_distance=%.6f", asd)

    denoiser = build_denoiser(cfg["model"], asd)
    optimizer = build_optimizer(cfg["model"])
    sigma_distribution = instantiate(cfg["model"]["sigma"])

    trainer_cfg = dict(cfg["trainer"])
    trainer_cfg.pop("_target_", None)
    trainer_cfg["ema_decay"] = cfg["model"].get("ema_decay", trainer_cfg.get("ema_decay", 0.999))
    # parallel.{atom_sharded,atom_shard_threshold,num_devices}: atom-sharded
    # (context-parallel) large-molecule mode / DP device count (SURVEY 5.7)
    par = dict(cfg.get("parallel") or {})
    for k in ("atom_sharded", "atom_shard_threshold", "num_devices"):
        if par.get(k) is not None:
            trainer_cfg[k] = par[k]
    tconf = TrainerConfig(**trainer_cfg)

    run_dir = os.path.join("runs", str(cfg.get("run_key", "run")))
    os.makedirs(run_dir, exist_ok=True)
    tconf.checkpoint_dir = os.path.join(run_dir, "checkpoints")

    # Persist the resolved config (incl. computed normalization) next to the
    # checkpoints so sampling can fully reconstruct the model — the analog of
    # Lightning's save_hyperparameters (reference denoiser.py:35).
    import pickle

    import yaml

    resolved = dict(cfg)
    resolved.setdefault("model", {})
    resolved["model"] = dict(resolved["model"], average_squared_distance=float(asd))
    with open(os.path.join(run_dir, "config.pkl"), "wb") as f:
        pickle.dump(resolved, f)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump({k: v for k, v in resolved.items() if k != "__global_package__"}, f)
    loggers = MultiLogger(
        ConsoleLogger(),
        CSVLogger(run_dir),
        maybe_wandb_logger(cfg.get("wandb_project")),
    )

    if cfg["model"].get("test_equivariance"):
        # runtime equivariance self-test on the first batch (reference
        # e3conv.py:93-107 runs it on the first forward)
        from jamun_tpu.train.state import create_train_state
        from jamun_tpu.utils.equivariance import assert_arch_equivariant

        batch0 = next(iter(datamodule.train_batches(0)))
        state0 = create_train_state(denoiser, optimizer, batch0, seed=0)
        # zero-initialized output gains make a fresh arch output all zeros —
        # bump scalar params so the equivariance check is non-vacuous
        params0 = jax.tree.map(
            lambda p: p + 0.5 if p.ndim == 0 else p, state0.params
        )
        c_noise = jax.numpy.asarray([jax.numpy.log(0.04) / 4.0])
        cutoff = denoiser.effective_radial_cutoff(0.04)
        err = assert_arch_equivariant(
            jax.jit(lambda b: denoiser.arch.apply(params0, b, c_noise, cutoff)), batch0
        )
        log.info("equivariance self-test passed: max error %.2e", err)

    resume = cfg.get("resume_from_checkpoint")
    trainer = Trainer(tconf, loggers)
    log.info("devices: %s", jax.devices())
    trainer.fit(denoiser, optimizer, sigma_distribution, datamodule, resume_from=resume)


def main(argv=None):
    setup_logging()
    parser = argparse.ArgumentParser(description="Train a jamun_tpu denoiser")
    parser.add_argument("--config-dir", default=DEFAULT_CONFIG_DIR)
    parser.add_argument("--config-name", default="train")
    parser.add_argument("--experiment-dir", default="configs/experiment")
    parser.add_argument("overrides", nargs="*", help="key=value overrides / experiment=<name>")
    args = parser.parse_args(argv)
    cfg = compose(args.config_dir, args.config_name, args.overrides, args.experiment_dir)
    try:
        run(cfg)
    except Exception:
        log.exception("training failed")  # full traceback for batch-system visibility
        raise


if __name__ == "__main__":
    main()
