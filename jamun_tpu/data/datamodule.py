"""Batch iteration: shuffled epochs over map-style datasets or epoch-less
streaming, yielding padded GraphBatch objects.

Replaces `MDtrajDataModule` + torch_geometric DataLoader
(`/root/reference/src/jamun/data/_mdtraj.py:259-328`). Batches are grouped by
node bucket so one epoch produces a small number of distinct XLA shapes.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

from jamun_tpu.data.batching import BucketSpec, collate
from jamun_tpu.data.datasets import StreamingRandomChainDataset
from jamun_tpu.ops.graph import GraphBatch

__all__ = ["DataModule"]


@dataclasses.dataclass
class DataModule:
    datasets: Sequence  # train datasets (map-style or iterable)
    val_datasets: Sequence = ()
    batch_size: int = 32
    shuffle: bool = True
    bucket_spec: BucketSpec = dataclasses.field(default_factory=BucketSpec)
    seed: int = 0
    streaming: bool = False
    stream_weights: Optional[Sequence[float]] = None  # per-dataset interleave weights
    prefetch: int = 2  # background-thread prefetch depth (0 = synchronous)

    def _index(self, datasets) -> List:
        idx = []
        for d_i, ds in enumerate(datasets):
            for f_i in range(len(ds)):
                idx.append((d_i, f_i))
        return idx

    def _iter_batches(self, datasets, shuffle: bool, seed: int) -> Iterator[GraphBatch]:
        if self.streaming:
            stream = iter(
                StreamingRandomChainDataset(datasets, weights=self.stream_weights, seed=seed)
            )
            while True:
                items = [next(stream) for _ in range(self.batch_size)]
                yield collate(items, self.bucket_spec, num_graphs=self.batch_size)

        index = self._index(datasets)
        if shuffle:
            rng = np.random.default_rng(seed)
            rng.shuffle(index)
        # group into batches of same node bucket to bound recompiles
        buckets: dict = {}
        for d_i, f_i in index:
            ds = datasets[d_i]
            b = self.bucket_spec.node_bucket(ds.template.num_atoms)
            buckets.setdefault(b, []).append((d_i, f_i))
            if len(buckets[b]) == self.batch_size:
                items = [datasets[d][f] for d, f in buckets.pop(b)]
                yield collate(items, self.bucket_spec, num_graphs=self.batch_size)
        for b, rest in buckets.items():
            items = [datasets[d][f] for d, f in rest]
            yield collate(items, self.bucket_spec, num_graphs=self.batch_size)

    def _maybe_prefetch(self, it: Iterator[GraphBatch]) -> Iterator[GraphBatch]:
        if self.prefetch <= 0:
            return it

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def worker():
            try:
                for item in it:
                    q.put(item)
            finally:
                q.put(_END)

        threading.Thread(target=worker, daemon=True).start()

        def gen():
            while True:
                item = q.get()
                if item is _END:
                    return
                yield item

        return gen()

    def train_batches(self, epoch: int = 0) -> Iterator[GraphBatch]:
        return self._maybe_prefetch(
            self._iter_batches(self.datasets, self.shuffle and not self.streaming, self.seed + epoch)
        )

    def val_batches(self) -> Iterator[GraphBatch]:
        ds = self.val_datasets or self.datasets
        return self._iter_batches(ds, shuffle=False, seed=self.seed)

    def num_train_frames(self) -> Optional[int]:
        if self.streaming:
            return None
        return sum(len(d) for d in self.datasets)
