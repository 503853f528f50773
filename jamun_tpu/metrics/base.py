"""Per-dataset trajectory metric accumulation + sampler callback plumbing.

Reference parity: `TrajectoryMetric` (`/root/reference/src/jamun/metrics/_utils.py:31`)
accumulates sampled chains per dataset via torchmetrics cat-reduction;
`TrajectoryMetricCallback` (`callbacks/sampler/_utils.py:21`) routes sampled
graphs to their dataset's metric. Here metrics are plain host-side objects fed
by `Sampler` callbacks (sampling output is already on host once unbatched).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

log = logging.getLogger("jamun_tpu")

__all__ = ["TrajectoryMetric", "TrajectoryMetricCallback", "MeasureSamplingTimeCallback"]


class TrajectoryMetric:
    """Accumulates sampled trajectories ([atoms, frames, 3] per chain) for one
    dataset; subclasses implement `compute()`."""

    def __init__(self, dataset):
        self.dataset = dataset
        self.template = dataset.template
        self.chains: List[np.ndarray] = []  # each [atoms, frames, 3]

    def validate(self, sample: Dict[str, Any]):
        n = self.template.num_atoms
        if sample.get("num_atoms", n) != n:
            raise ValueError(
                f"sample atom count {sample.get('num_atoms')} != dataset {n} "
                f"for {self.dataset.label()}"
            )

    def update(self, sample: Dict[str, Any]):
        self.validate(sample)
        traj = sample.get("xhat_traj")
        if traj is not None:
            self.chains.append(np.asarray(traj))

    @property
    def joined_positions(self) -> np.ndarray:
        """All frames of all chains concatenated: [total_frames, atoms, 3]."""
        if not self.chains:
            return np.zeros((0, self.template.num_atoms, 3), np.float32)
        return np.concatenate([np.transpose(c, (1, 0, 2)) for c in self.chains], axis=0)

    def compute(self) -> Dict[str, Any]:
        return {"num_chains": len(self.chains), "num_frames": int(self.joined_positions.shape[0])}

    def reset(self):
        self.chains = []


class TrajectoryMetricCallback:
    """Sampler callback: routes each sampled graph to its dataset's metric by
    graph index and computes/report at the end."""

    def __init__(self, metrics: Sequence[TrajectoryMetric], datasets_per_graph: Optional[Sequence[int]] = None):
        self.metrics = list(metrics)
        self.datasets_per_graph = datasets_per_graph
        self.results: Dict[str, Dict[str, Any]] = {}

    def _metric_for(self, sample: Dict[str, Any]) -> Optional[TrajectoryMetric]:
        g = sample.get("graph_index", 0)
        if self.datasets_per_graph is not None:
            idx = self.datasets_per_graph[g]
        else:
            idx = g % len(self.metrics) if self.metrics else 0
        return self.metrics[idx] if self.metrics else None

    def on_after_sample_batch(self, sample: List[Dict[str, Any]], sampler, **kwargs):
        for s in sample:
            m = self._metric_for(s)
            if m is not None:
                m.update(s)

    def on_sample_end(self, sampler, **kwargs):
        for m in self.metrics:
            label = m.dataset.label()
            self.results[label] = m.compute()
            log.info("metrics[%s]: %s", label, _summarize(self.results[label]))


def _summarize(d: Dict[str, Any]) -> Dict[str, Any]:
    return {k: v for k, v in d.items() if isinstance(v, (int, float, str))}


class MeasureSamplingTimeCallback:
    """Logs per-batch and cumulative time-per-sample
    (`callbacks/sampler/_measure_sampling_time.py:8-89`) — the source of the
    reference's ms/sample numbers."""

    def __init__(self):
        self.total_seconds = 0.0
        self.total_samples = 0
        self.per_batch: List[Dict[str, float]] = []

    def on_after_sample_batch(self, sample, sampler, elapsed_seconds: float = 0.0, **kwargs):
        n_samples = sum(s.get("xhat_traj", np.zeros((0, 0))).shape[1] for s in sample)
        self.total_seconds += elapsed_seconds
        self.total_samples += n_samples
        entry = {
            "batch_seconds": elapsed_seconds,
            "batch_samples": n_samples,
            "ms_per_sample": 1e3 * elapsed_seconds / max(n_samples, 1),
            "cumulative_ms_per_sample": 1e3 * self.total_seconds / max(self.total_samples, 1),
        }
        self.per_batch.append(entry)
        log.info("sampling time: %s", {k: round(v, 4) for k, v in entry.items()})
