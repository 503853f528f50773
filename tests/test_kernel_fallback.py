"""A kernel compile failure must degrade training to the XLA path with a
warning, not abort the run (VERDICT r3 #5: the N=112 backward kernel runs
within ~8 MB of the 128 MiB VMEM budget, so any Mosaic allocator change could
start failing compiles)."""

import logging

import numpy as np
import optax
import pytest

from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
from jamun_tpu.models.e3conv import E3Conv
from jamun_tpu.train.distributions import ConstantSigma
from jamun_tpu.train.loop import Trainer, TrainerConfig, denoiser_without_kernels
from jamun_tpu.utils.testing import make_test_batch


class _BatchModule:
    """Minimal datamodule: a fixed batch repeated."""

    streaming = False

    def __init__(self, batch, n=3):
        self.batch, self.n = batch, n

    def train_batches(self, epoch):
        return iter([self.batch] * self.n)

    def val_batches(self):
        return iter([self.batch])


def _kernel_denoiser(**arch_kw):
    # edge_attr_dim=64 is what supports_packed_conv requires — the kernel
    # dispatch must actually be reachable for the fallback to mean anything
    arch = E3Conv(
        irreps_hidden="32x0e + 16x1e",
        n_layers=1,
        edge_attr_dim=64,
        atom_type_embedding_dim=4,
        atom_code_embedding_dim=4,
        residue_code_embedding_dim=4,
        residue_index_embedding_dim=4,
        use_pallas=True,
        tensor_product="uvu",
        **arch_kw,
    )
    return Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.3))


def test_denoiser_without_kernels():
    den = _kernel_denoiser(fused_stack=True)
    fb = denoiser_without_kernels(den)
    assert fb is not None
    assert fb.arch.use_pallas is False and fb.arch.fused_stack is False
    # config and non-kernel arch attributes are preserved
    assert fb.config == den.config and fb.arch.n_layers == den.arch.n_layers
    # nothing to fall back from when kernels are already off
    assert denoiser_without_kernels(fb) is None


def test_kernel_failure_degrades_to_xla(monkeypatch, caplog, tmp_path):
    import jamun_tpu.ops.pallas.packed_conv as pk

    def boom(*a, **kw):
        raise RuntimeError("simulated Mosaic compile failure (VMEM exhausted)")

    # every kernel entry point the Conv dispatch can reach
    monkeypatch.setattr(pk, "packed_edge_features", boom)
    monkeypatch.setattr(pk, "packed_separable_conv_layer", boom)
    monkeypatch.setattr(pk, "packed_uvu_conv_dense", boom)

    den = _kernel_denoiser()
    batch = make_test_batch(num_graphs=2, max_nodes=8)
    cfg = TrainerConfig(
        max_epochs=1, max_steps=2, log_every_n_steps=1, num_devices=1,
        checkpoint_dir=str(tmp_path / "ckpts"), collect_sigma_diagnostics=False,
    )
    caplog.set_level(logging.WARNING, logger="jamun_tpu")
    trainer = Trainer(cfg)
    state = trainer.fit(den, optax.adam(1e-3), ConstantSigma(0.04), _BatchModule(batch))

    assert int(state.step) == 2  # training completed on the XLA path
    assert any(
        "retrying this batch on the XLA path" in rec.getMessage()
        for rec in caplog.records
    )
    # the trainer's live denoiser is now the kernel-free one
    assert trainer._denoiser.arch.use_pallas is False


def test_non_kernel_failure_still_raises(tmp_path):
    """Without kernels enabled there is nothing to fall back to: a genuine
    error must propagate, not loop through the fallback."""
    den = denoiser_without_kernels(_kernel_denoiser())
    batch = make_test_batch(num_graphs=2, max_nodes=8)

    def bad_update(grads, opt_state, params=None):
        raise RuntimeError("genuine user error (not a kernel failure)")

    bad_optimizer = optax.GradientTransformation(optax.adam(1e-3).init, bad_update)
    cfg = TrainerConfig(
        max_epochs=1, max_steps=1, num_devices=1, checkpoint_dir=str(tmp_path / "c"),
        collect_sigma_diagnostics=False,
    )
    with pytest.raises(RuntimeError, match="genuine user error"):
        Trainer(cfg).fit(den, bad_optimizer, ConstantSigma(0.04), _BatchModule(batch))
