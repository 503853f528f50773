"""`jamun-tpu-sample`: walk-jump sampling entry point.

Reference: `/root/reference/src/jamun/cmdline/sample.py:41-138`. Flow: compose
config -> resolve checkpoint -> restore denoiser state -> init graphs from
datasets -> Sampler with metric callbacks -> sample.
"""

from __future__ import annotations

import argparse
import logging
import os
import pickle

import numpy as np

from jamun_tpu.cmdline.common import build_denoiser, build_optimizer, setup_logging
from jamun_tpu.config.compose import compose
from jamun_tpu.config.instantiate import instantiate
from jamun_tpu.data.batching import collate
from jamun_tpu.metrics.base import MeasureSamplingTimeCallback, TrajectoryMetricCallback
from jamun_tpu.metrics.chemical_validity import ChemicalValidityMetrics
from jamun_tpu.metrics.ramachandran import RamachandranMetrics
from jamun_tpu.metrics.save_trajectory import SaveTrajectory
from jamun_tpu.sampling.sampler import Sampler
from jamun_tpu.train.checkpoints import find_checkpoint, restore_checkpoint
from jamun_tpu.train.state import create_train_state

log = logging.getLogger("jamun_tpu")

DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config", "defaults")


def get_initial_graphs(datasets, num_init_samples: int, repeat: int, seed: int = 0):
    """Starting structures: `num_init_samples` frames per dataset, repeated
    `repeat` times (reference `cmdline/sample.py:27-38`)."""
    rng = np.random.default_rng(seed)
    items, graph_to_dataset = [], []
    for d_i, ds in enumerate(datasets):
        idx = rng.choice(len(ds), size=min(num_init_samples, len(ds)), replace=False)
        for i in idx:
            for _ in range(repeat):
                items.append(ds[int(i)])
                graph_to_dataset.append(d_i)
    return collate(items), graph_to_dataset


def apply_arch_kernel_defaults(cfg, model_cfg, on_tpu: bool) -> None:
    """Backend-aware kernel defaults for the sample CLI (mutates
    model_cfg["arch"] in place).

    Default the fused Pallas conv kernel (ops/pallas/packed_conv.py) ON for
    TPU backends — numerically parity-tested against the XLA path
    (checkpoints trained on either path are interchangeable) and trainable
    via its backward kernel; unsupported shapes fall back automatically
    inside Conv. Elsewhere Pallas would run in interpret mode, orders of
    magnitude slower than the XLA fast path. Override with use_pallas=true/false.

    The whole-model stack kernel (ops/pallas/e3_stack.py) is forward-only, so
    it defaults ON only when nothing differentiates the score network: with
    finetune_on_init active, gradients flow through this same denoiser and
    the stack must stay OFF (the per-layer kernel's custom-VJP backward still
    applies). Override with fused_stack=true/false.
    """
    arch_cfg = model_cfg.get("arch")
    if not (isinstance(arch_cfg, dict) and "E3Conv" in str(arch_cfg.get("_target_", ""))):
        return
    arch_cfg["use_pallas"] = bool(cfg.get("use_pallas", on_tpu))
    finetunes = (cfg.get("finetune_on_init") or {}).get("num_steps", 0) > 0
    arch_cfg["fused_stack"] = bool(
        cfg.get("fused_stack", arch_cfg["use_pallas"] and on_tpu and not finetunes)
    )


def run(cfg) -> None:
    import jax

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()

    if cfg.get("init_datasets") is None:
        raise ValueError("init_datasets must be configured for sampling")
    datasets = instantiate(cfg["init_datasets"])

    ckpt_path = find_checkpoint(cfg["checkpoint_dir"], cfg.get("checkpoint_type", "best_so_far"))
    log.info("loading checkpoint %s", ckpt_path)

    # Rebuild the model from the training config stored next to the checkpoint
    # (hyperparameters-in-checkpoint parity, `denoiser.py:35`).
    run_dir = os.path.dirname(os.path.dirname(ckpt_path))
    train_cfg_path = os.path.join(run_dir, "config.pkl")
    if os.path.exists(train_cfg_path):
        with open(train_cfg_path, "rb") as f:
            model_cfg = pickle.load(f)["model"]
    else:
        model_cfg = cfg.get("model") or compose(DEFAULT_CONFIG_DIR, "train")["model"]

    init_graphs, graph_to_dataset = get_initial_graphs(
        datasets,
        cfg.get("num_init_samples_per_dataset", 1),
        cfg.get("repeat_init_samples", 1),
        seed=cfg.get("seed", 0),
    )

    # ASD sets the EDM preconditioning constants (c_in/c_skip/c_out); a value
    # differing from training silently yields wrong samples, so never default.
    asd = model_cfg.get("average_squared_distance")
    if asd is None:
        asd = cfg.get("average_squared_distance")
    if asd is None:
        raise ValueError(
            "average_squared_distance used at training time could not be recovered "
            f"(no config.pkl next to {ckpt_path} and no model.average_squared_distance "
            "in the sampling config); pass average_squared_distance=<value> explicitly."
        )
    apply_arch_kernel_defaults(cfg, model_cfg, on_tpu=jax.default_backend() in ("tpu", "axon"))

    denoiser = build_denoiser(model_cfg, float(asd))
    optimizer = build_optimizer(model_cfg)
    state = create_train_state(denoiser, optimizer, init_graphs, seed=0)
    state = restore_checkpoint(ckpt_path, state)

    # Optional test-time finetuning on the init structures
    # (reference `cmdline/sample.py:91-116`).
    ft = cfg.get("finetune_on_init") or {}
    if ft.get("num_steps", 0) > 0:
        from jamun_tpu.train.distributions import ConstantSigma
        from jamun_tpu.train.state import make_train_step

        # the fused ConvBlock kernel has a hand-written backward kernel
        # (custom VJP, grad-parity tested), so finetuning runs on the same
        # kernel path as sampling
        sigma_dist = ConstantSigma(float(cfg.get("sigma", 0.04)))
        step_fn = jax.jit(
            make_train_step(denoiser, optimizer, sigma_dist, ema_decay=float(ft.get("ema_decay", 0.999)))
        )
        for i in range(int(ft["num_steps"])):
            state, aux = step_fn(state, init_graphs)
            if i % max(int(ft.get("log_every", 10)), 1) == 0:
                log.info("finetune step %d: loss=%.5f", i, float(aux["loss"]))

    params = state.ema_params  # sample with EMA weights

    batch_sampler = instantiate(cfg["batch_sampler"])

    out_dir = cfg.get("output_dir", "sampler")
    from jamun_tpu.metrics.score_distribution import ScoreDistributionMetrics
    from jamun_tpu.metrics.visualize import SampleVisualizer

    metrics_per_dataset = [
        [
            SaveTrajectory(ds, out_dir),
            RamachandranMetrics(ds),
            ChemicalValidityMetrics(ds),
            ScoreDistributionMetrics(ds),
            SampleVisualizer(ds, out_dir),
        ]
        for ds in datasets
    ]

    class _AllMetricsCallback(TrajectoryMetricCallback):
        """Routes each sampled graph to every metric of its dataset."""

        def on_after_sample_batch(self, sample, sampler, **kwargs):
            for s in sample:
                d = graph_to_dataset[s.get("graph_index", 0)]
                for m in metrics_per_dataset[d]:
                    m.update(s)

    timing_cb = MeasureSamplingTimeCallback(
        label_for_graph=[datasets[d].label() for d in graph_to_dataset]
    )
    callbacks = [
        _AllMetricsCallback([m for ms in metrics_per_dataset for m in ms]),
        timing_cb,
    ]

    # parallel.atom_sharded: large-molecule mode — atoms sharded over the
    # mesh instead of chains (jamun_tpu/parallel/atom_sharded.py, SURVEY 5.7)
    par = dict(cfg.get("parallel") or {})
    sampler = Sampler(
        callbacks=callbacks,
        atom_sharded=par.get("atom_sharded") in (True, "true", "on"),
        num_devices=par.get("num_devices"),
    )
    log.info("devices: %s", jax.devices())
    # per-host seed offset (reference seeds cfg.seed + global_rank,
    # cmdline/sample.py:86-88)
    seed = int(cfg.get("seed", 0)) + jax.process_index()
    sampler.sample(
        denoiser,
        params,
        batch_sampler,
        num_batches=cfg.get("num_batches", 5),
        init_graphs=init_graphs,
        continue_chain=cfg.get("continue_chain", True),
        seed=seed,
    )

    # sampling-rate CSV (reference analysis/sampling_times layout)
    from jamun_tpu.analysis.load_trajectory import write_sampling_times_csv

    if timing_cb.total_samples:
        # per-label rows with the warm (compile-excluded) rate first — the
        # speed-matched analysis budget must reflect steady-state sampling
        # speed, not the first batch's compile (ADVICE r4)
        rows = timing_cb.rates()
        if timing_cb.last_neighbor_overflow is not None:
            for r in rows.values():
                r["neighbor_overflow_mean"] = timing_cb.last_neighbor_overflow["mean"]
                r["neighbor_overflow_max"] = timing_cb.last_neighbor_overflow["max"]
        write_sampling_times_csv(os.path.join(out_dir, "sampling_times.csv"), rows)


def main(argv=None):
    setup_logging()
    parser = argparse.ArgumentParser(description="Walk-jump sampling with a trained denoiser")
    parser.add_argument("--config-dir", default=DEFAULT_CONFIG_DIR)
    parser.add_argument("--config-name", default="sample")
    parser.add_argument("--experiment-dir", default="configs/experiment")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    cfg = compose(args.config_dir, args.config_name, args.overrides, args.experiment_dir)
    try:
        run(cfg)
    except Exception:
        log.exception("sampling failed")
        raise


if __name__ == "__main__":
    main()
