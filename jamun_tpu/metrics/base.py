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
    reference's ms/sample numbers.

    `label_for_graph` (graph_index -> dataset label) enables per-label rates:
    all labels in a batch walk in lockstep inside one SPMD program, so each
    batch's wall clock is attributed to labels proportionally to their sample
    counts (the reference runs one peptide per job and gets per-peptide CSVs
    for free; proportional attribution is the batched analog).

    The first batch carries the walk's compile time (ADVICE r4: ~10x the warm
    rate through the tunnel), so `rates()` excludes batch 0 whenever >= 2
    batches ran; the all-batches rate is reported alongside as
    `*_incl_compile`. Speed-matched analysis budgets should use the warm rate.
    """

    def __init__(self, label_for_graph: Optional[Sequence[str]] = None):
        self.label_for_graph = label_for_graph
        self.total_seconds = 0.0
        self.total_samples = 0
        self.per_batch: List[Dict[str, float]] = []
        self.label_samples: Dict[str, int] = {}  # all batches
        self.label_samples_warm: Dict[str, int] = {}  # batches > 0
        self.warm_seconds = 0.0
        self.warm_samples = 0
        self.last_neighbor_overflow: Optional[Dict[str, float]] = None

    def _label(self, s) -> str:
        g = s.get("graph_index", 0)
        if self.label_for_graph is not None and g < len(self.label_for_graph):
            return str(self.label_for_graph[g])
        return "all"

    def on_after_sample_batch(
        self, sample, sampler, elapsed_seconds: float = 0.0,
        neighbor_overflow: Optional[Dict[str, float]] = None, **kwargs,
    ):
        first = not self.per_batch
        n_samples = 0
        for s in sample:
            k = s.get("xhat_traj", np.zeros((0, 0))).shape[1]
            n_samples += k
            lbl = self._label(s)
            self.label_samples[lbl] = self.label_samples.get(lbl, 0) + k
            if not first:
                self.label_samples_warm[lbl] = self.label_samples_warm.get(lbl, 0) + k
        self.total_seconds += elapsed_seconds
        self.total_samples += n_samples
        if not first:
            self.warm_seconds += elapsed_seconds
            self.warm_samples += n_samples
        entry = {
            "batch_seconds": elapsed_seconds,
            "batch_samples": n_samples,
            "ms_per_sample": 1e3 * elapsed_seconds / max(n_samples, 1),
            "cumulative_ms_per_sample": 1e3 * self.total_seconds / max(self.total_samples, 1),
        }
        if neighbor_overflow is not None:
            entry["neighbor_overflow_mean"] = neighbor_overflow.get("mean", 0.0)
            entry["neighbor_overflow_max"] = neighbor_overflow.get("max", 0)
            self.last_neighbor_overflow = dict(neighbor_overflow)
        self.per_batch.append(entry)
        log.info("sampling time: %s", {k: round(v, 4) for k, v in entry.items()})

    def rates(self) -> Dict[str, Dict[str, float]]:
        """label -> {"time_per_sample_seconds" (warm), "..._incl_compile",
        "samples"}. Per-label seconds = proportional share of each pool."""
        use_warm = self.warm_samples > 0
        pool_secs = self.warm_seconds if use_warm else self.total_seconds
        pool_n = self.warm_samples if use_warm else self.total_samples
        pool_labels = self.label_samples_warm if use_warm else self.label_samples
        del pool_labels
        # lockstep SPMD walk: every sample in a pool costs the same wall
        # share, so the proportionally-attributed per-label rate equals the
        # pooled rate — reported per label for the reference CSV layout, with
        # per-label sample counts making the pooling explicit
        warm_rate = pool_secs / max(pool_n, 1)
        out: Dict[str, Dict[str, float]] = {}
        for lbl, n_all in self.label_samples.items():
            out[lbl] = {
                "time_per_sample_seconds": warm_rate,
                "time_per_sample_seconds_incl_compile": self.total_seconds
                / max(self.total_samples, 1),
                "samples": n_all,
            }
        return out
