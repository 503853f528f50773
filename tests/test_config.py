"""Config composition + instantiation tests."""

import os

import pytest

from jamun_tpu.config.compose import apply_overrides, compose, merge, resolve_interpolations
from jamun_tpu.config.instantiate import instantiate, locate

DEFAULTS = os.path.join(os.path.dirname(__file__), "..", "jamun_tpu", "config", "defaults")


def test_merge():
    assert merge({"a": {"b": 1, "c": 2}}, {"a": {"b": 3}}) == {"a": {"b": 3, "c": 2}}


def test_interpolation():
    cfg = {"sigma": 0.04, "mcmc": {"s": "${sigma}"}, "p": "${env:NOPE_XYZ,fallback}"}
    out = resolve_interpolations(cfg)
    assert out["mcmc"]["s"] == 0.04
    assert out["p"] == "fallback"


def test_overrides():
    cfg = apply_overrides({"a": {"b": 1}}, ["a.b=2", "+a.c=[1,2]", "~a.b"])
    assert cfg == {"a": {"c": [1, 2]}}


def test_compose_train_config():
    cfg = compose(DEFAULTS, "train", ["model.arch.n_layers=2"])
    assert cfg["model"]["arch"]["n_layers"] == 2
    assert cfg["model"]["arch"]["irreps_hidden"] == "120x0e + 32x1e"
    assert cfg["model"]["sigma"]["sigma"] == 0.04
    assert cfg["trainer"]["max_epochs"] == 10


def test_compose_sample_config_interpolation():
    cfg = compose(DEFAULTS, "sample", ["sigma=0.08", "num_sampling_steps_per_batch=100"])
    mcmc_cfg = cfg["batch_sampler"]["mcmc"]["config"]
    assert mcmc_cfg["delta"] == 0.04
    assert cfg["batch_sampler"]["sigma"] == 0.08
    assert mcmc_cfg["steps"] == 100


def test_instantiate_sampler():
    cfg = compose(DEFAULTS, "sample", ["num_sampling_steps_per_batch=10"])
    sampler = instantiate(cfg["batch_sampler"])
    from jamun_tpu.sampling.walkjump import SingleMeasurementSampler

    assert isinstance(sampler, SingleMeasurementSampler)
    assert sampler.mcmc.config.steps == 10
    assert sampler.mcmc.config.score_fn_clip == 100.0


def test_instantiate_model_arch():
    cfg = compose(DEFAULTS, "train")
    arch = instantiate(cfg["model"]["arch"])
    from jamun_tpu.models.e3conv import E3Conv

    assert isinstance(arch, E3Conv)
    assert arch.n_layers == 5


def test_locate():
    import optax

    assert locate("optax.adam") is optax.adam


def test_group_override_replaces_node():
    """Hydra-style `group=option` CLI overrides swap whole config groups."""
    import os

    from jamun_tpu.config.compose import compose

    root = os.path.join(os.path.dirname(__file__), "..")
    cfg = compose(
        os.path.join(root, "jamun_tpu", "config", "defaults"),
        "train",
        ["experiment=train_test", "model/arch=ophiuchus", "model.arch.n_layers=2"],
        experiment_dir=os.path.join(root, "configs", "experiment"),
    )
    assert "Ophiuchus" in cfg["model"]["arch"]["_target_"]
    assert cfg["model"]["arch"]["n_layers"] == 2
    assert "mul_factor" in cfg["model"]["arch"]
