"""Training diagnostics: sigma-vs-loss and sigma-vs-grad-norm distributions,
and denoising visualization at fixed sigma levels.

Reference parity:
  - `PlotLossDistribution` / `PlotGradNormDistribution`
    (`/root/reference/src/jamun/callbacks/_plot_loss_distribution.py:9`,
    `_plot_grad_norm_distribution.py:9`): per-batch (sigma, loss/grad-norm)
    gathered across ranks and logged as density plots.
  - `VisualizeDenoise` (`callbacks/_visualize_denoise.py:11`): denoise at a
    fixed sigma ladder during validation, report scaled RMSD per sigma (the
    Ramachandran/3D views are wandb/py3Dmol artifacts there; here we emit the
    per-sigma metrics + optional matplotlib density plots).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Sequence

import numpy as np

log = logging.getLogger("jamun_tpu")

__all__ = ["SigmaDistributionDiagnostics", "visualize_denoise_metrics"]


class SigmaDistributionDiagnostics:
    """Accumulates (sigma, loss, grad_norm) per train step; writes a CSV and
    optional density plots at the end of each epoch."""

    def __init__(self, output_dir: str, plot: bool = True):
        self.output_dir = output_dir
        self.plot = plot
        self.rows: List[Dict[str, float]] = []

    def update(self, aux: Dict[str, float], step: int):
        self.rows.append(
            {
                "step": step,
                "sigma": float(aux.get("sigma", np.nan)),
                "loss": float(aux.get("loss", np.nan)),
                "grad_norm": float(aux.get("grad_norm", np.nan)),
            }
        )

    def flush(self, epoch: int):
        if not self.rows:
            return
        os.makedirs(self.output_dir, exist_ok=True)
        import csv

        path = os.path.join(self.output_dir, f"sigma_distribution_epoch{epoch}.csv")
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["step", "sigma", "loss", "grad_norm"])
            w.writeheader()
            w.writerows(self.rows)
        if self.plot:
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                sig = np.asarray([r["sigma"] for r in self.rows])
                fig, axes = plt.subplots(1, 2, figsize=(10, 4))
                for ax, key in zip(axes, ["loss", "grad_norm"]):
                    val = np.asarray([r[key] for r in self.rows])
                    ok = np.isfinite(sig) & np.isfinite(val) & (val > 0)
                    if ok.sum() > 1:
                        ax.scatter(sig[ok], val[ok], s=4, alpha=0.4)
                        ax.set_yscale("log")
                    ax.set_xlabel("sigma")
                    ax.set_ylabel(key)
                fig.tight_layout()
                fig.savefig(os.path.join(self.output_dir, f"sigma_distribution_epoch{epoch}.png"), dpi=100)
                plt.close(fig)
            except Exception as e:  # pragma: no cover
                log.warning("sigma-distribution plot failed: %s", e)
        self.rows = []


def visualize_denoise_metrics(
    denoiser,
    params,
    batch,
    sigmas: Sequence[float] = (0.01, 0.02, 0.04, 0.08, 0.16, 0.32),
    seed: int = 0,
) -> Dict[float, Dict[str, float]]:
    """Denoise the batch at each sigma; return per-sigma scaled RMSD etc."""
    import jax

    out: Dict[float, Dict[str, float]] = {}
    for i, sigma in enumerate(sigmas):
        key = jax.random.PRNGKey(seed + i)
        per_graph, aux = jax.jit(
            lambda p, k, s=float(sigma): denoiser.noise_and_compute_loss(
                p, k, batch, s, denoiser.config.align_noisy_input_during_evaluation
            )
        )(params, key)
        gm = np.asarray(batch.graph_mask, dtype=float)
        denom = max(gm.sum(), 1.0)
        out[float(sigma)] = {
            k: float((np.asarray(v) * gm).sum() / denom) for k, v in aux.items()
        }
    return out
