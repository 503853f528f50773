"""All shipped experiment configs must compose cleanly against the defaults."""

import glob
import os

import pytest

from jamun_tpu.config.compose import compose

ROOT = os.path.join(os.path.dirname(__file__), "..")
DEFAULTS = os.path.join(ROOT, "jamun_tpu", "config", "defaults")
EXPERIMENTS = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(ROOT, "configs", "experiment", "*.yaml"))
)


@pytest.mark.parametrize("experiment", EXPERIMENTS)
def test_experiment_composes(experiment):
    name = "train" if experiment.startswith("train") else "sample"
    cfg = compose(
        DEFAULTS,
        name,
        [f"experiment={experiment}"],
        experiment_dir=os.path.join(ROOT, "configs", "experiment"),
    )
    if name == "train":
        assert "arch" in cfg["model"]
        assert "datasets" in cfg["data"]
        assert cfg["data"]["datasets"]["root"]
    else:
        assert cfg["init_datasets"] is not None
        assert cfg["batch_sampler"]["mcmc"]["config"]["steps"] > 0


def test_all_reference_experiment_names_present():
    # train {test, uncapped_2AA, uncapped_4AA, capped_2AA, mdgen, chignolin,
    # idrome_cg}; sample {test, uncapped_2AA/4AA/5AA, mdgen, custom}
    for required in [
        "train_test", "train_uncapped_2AA", "train_uncapped_4AA", "train_capped_2AA",
        "train_mdgen", "train_chignolin", "train_idrome_cg",
        "sample_test", "sample_uncapped_2AA", "sample_uncapped_4AA",
        "sample_uncapped_5AA", "sample_mdgen", "sample_custom",
    ]:
        assert required in EXPERIMENTS, required
