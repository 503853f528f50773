"""Sampler parameter callbacks: mutate MCMC parameters between sample batches.

Reference: `/root/reference/src/jamun/sampling/walkjump/_callbacks.py:10-69`
(MeasurementDependentParametersCallback, DeltaSqrtDecayCallback,
InterpolateParametersCallback). Here MCMCConfig is frozen, so callbacks return
an updated batch_sampler via dataclasses.replace — the Sampler applies it
before each batch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

__all__ = [
    "DeltaSqrtDecayCallback",
    "InterpolateParametersCallback",
    "MeasurementDependentParametersCallback",
]


def _update_mcmc(batch_sampler, **changes):
    new_cfg = dataclasses.replace(batch_sampler.mcmc.config, **changes)
    new_mcmc = type(batch_sampler.mcmc)(new_cfg)
    return dataclasses.replace(batch_sampler, mcmc=new_mcmc)


class DeltaSqrtDecayCallback:
    """delta_k = delta_0 / sqrt(k + 1) per sample batch."""

    def __init__(self, delta_0: float):
        self.delta_0 = delta_0

    def update_sampler(self, batch_sampler, batch_idx: int):
        return _update_mcmc(batch_sampler, delta=self.delta_0 / (batch_idx + 1) ** 0.5)


class InterpolateParametersCallback:
    """Linear interpolation of MCMC parameters over `num_batches`."""

    def __init__(self, start: Dict[str, float], end: Dict[str, float], num_batches: int):
        assert set(start) == set(end)
        self.start, self.end, self.num_batches = start, end, num_batches

    def update_sampler(self, batch_sampler, batch_idx: int):
        t = min(batch_idx / max(self.num_batches - 1, 1), 1.0)
        changes = {k: (1 - t) * self.start[k] + t * self.end[k] for k in self.start}
        return _update_mcmc(batch_sampler, **changes)


class MeasurementDependentParametersCallback:
    """Per-measurement-index parameter table: params_k applied at batch k."""

    def __init__(self, parameters_per_measurement: Sequence[Dict[str, float]]):
        self.table = list(parameters_per_measurement)

    def update_sampler(self, batch_sampler, batch_idx: int):
        changes = self.table[min(batch_idx, len(self.table) - 1)]
        sigma = changes.pop("sigma", None)
        out = _update_mcmc(batch_sampler, **changes)
        if sigma is not None:
            out = dataclasses.replace(out, sigma=float(sigma))
        return out
