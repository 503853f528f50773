"""Sample-CLI tests: backend-aware kernel defaults and the finetune_on_init
path end-to-end (reference `cmdline/sample.py:91-116`)."""

import logging
import os
import re

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(**kw):
    return dict(kw)


def _model_cfg():
    return {"arch": {"_target_": "jamun_tpu.models.E3Conv", "n_layers": 2}}


def test_kernel_defaults_tpu_sampling():
    from jamun_tpu.cmdline.sample import apply_arch_kernel_defaults

    m = _model_cfg()
    apply_arch_kernel_defaults(_cfg(), m, on_tpu=True)
    assert m["arch"]["use_pallas"] is True
    assert m["arch"]["fused_stack"] is True


def test_kernel_defaults_finetune_disables_stack():
    """finetune_on_init differentiates the score network; the forward-only
    stack kernel must default OFF while the per-layer kernel stays ON."""
    from jamun_tpu.cmdline.sample import apply_arch_kernel_defaults

    m = _model_cfg()
    apply_arch_kernel_defaults(
        _cfg(finetune_on_init={"num_steps": 5}), m, on_tpu=True
    )
    assert m["arch"]["use_pallas"] is True
    assert m["arch"]["fused_stack"] is False

    # explicit user override still wins
    m = _model_cfg()
    apply_arch_kernel_defaults(
        _cfg(finetune_on_init={"num_steps": 5}, fused_stack=True), m, on_tpu=True
    )
    assert m["arch"]["fused_stack"] is True


def test_kernel_defaults_cpu():
    from jamun_tpu.cmdline.sample import apply_arch_kernel_defaults

    m = _model_cfg()
    apply_arch_kernel_defaults(_cfg(), m, on_tpu=False)
    assert m["arch"]["use_pallas"] is False
    assert m["arch"]["fused_stack"] is False

    # non-E3Conv archs are left untouched
    m = {"arch": {"_target_": "jamun_tpu.models.Ophiuchus"}}
    apply_arch_kernel_defaults(_cfg(), m, on_tpu=True)
    assert "use_pallas" not in m["arch"]


@pytest.mark.slow
def test_finetune_on_init_cli_end_to_end(tmp_path, monkeypatch, caplog):
    """Full CLI flow: train (experiment=train_test) -> sample with
    finetune_on_init -> finetune loss decreases, sampler outputs sane
    (VERDICT r3 #7)."""
    from jamun_tpu.cmdline import sample as sample_cli
    from jamun_tpu.cmdline import train as train_cli

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("JAMUN_DATA_PATH", os.path.join(REPO_ROOT, "data"))
    exp_dir = os.path.join(REPO_ROOT, "configs", "experiment")

    train_cli.main(
        [
            "--experiment-dir", exp_dir,
            "experiment=train_test",
            "trainer.max_steps=8",
            "trainer.val_every_n_steps=4",
            "trainer.val_max_batches=1",
        ]
    )
    assert os.path.exists(tmp_path / "runs" / "test" / "checkpoints" / "last.ckpt")

    caplog.set_level(logging.INFO, logger="jamun_tpu")
    sample_cli.main(
        [
            "--experiment-dir", exp_dir,
            "experiment=sample_test",
            "+finetune_on_init.num_steps=25",
            "+finetune_on_init.log_every=1",
            "num_sampling_steps_per_batch=20",
            "save_every_n_steps=5",
            "num_batches=1",
            "offload_chunk_steps=0",
        ]
    )

    losses = [
        float(m.group(1))
        for rec in caplog.records
        if (m := re.search(r"finetune step \d+: loss=([\d.eE+-]+)", rec.getMessage()))
    ]
    assert len(losses) == 25
    assert all(np.isfinite(losses))
    # the checkpoint is 8 steps old, so 25 finetune steps sit on the steep
    # early part of the loss curve: the tail must be clearly below the head
    assert np.mean(losses[-5:]) < np.mean(losses[:5])

    out_dir = tmp_path / "runs" / "test" / "sampler"
    assert os.path.exists(out_dir / "sampling_times.csv")
    saved = [str(p) for p in out_dir.rglob("*.npy")] + [
        str(p) for p in out_dir.rglob("*.dcd")
    ] + [str(p) for p in out_dir.rglob("*.pdb")]
    assert saved, f"no sampler outputs under {out_dir}"
