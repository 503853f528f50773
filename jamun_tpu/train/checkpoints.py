"""Checkpoint save/restore + discovery.

Uses flax.serialization (msgpack) for robustness; a single checkpoint holds
(params, EMA params, optimizer state, step, rng) — the reference's paired
`*-EMA.ckpt` files (`callbacks/_ema.py:369-391`) are subsumed by the bundled
ema_params. Discovery semantics mirror `utils/checkpoint.py:25-51`:
checkpoint_type in {"last", "best_so_far", explicit "*.ckpt" path}, driven by a
local manifest.json instead of the wandb run registry.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import flax.serialization

__all__ = ["save_checkpoint", "restore_checkpoint", "find_checkpoint", "CheckpointManager"]


def save_checkpoint(path: str, state) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))


def restore_checkpoint(path: str, target):
    with open(path, "rb") as f:
        data = f.read()
    try:
        return flax.serialization.from_bytes(target, data)
    except (ValueError, KeyError) as e:
        # flax raises a deep state-dict key mismatch when the checkpoint was
        # written by a different model configuration — say so plainly
        raise ValueError(
            f"checkpoint {path!r} does not match the current model/optimizer "
            "structure (it was probably saved with a different architecture "
            "config or an older code version). Retrain or point "
            "resume/checkpoint settings at a compatible checkpoint. "
            f"Original error: {e}"
        ) from e


class CheckpointManager:
    """top-k on a monitored metric + always-updated last.ckpt, with manifest."""

    def __init__(self, directory: str, top_k: int = 5, monitor: str = "val/loss", mode: str = "min"):
        self.directory = directory
        self.top_k = top_k
        self.monitor = monitor
        self.mode = mode
        os.makedirs(directory, exist_ok=True)
        self._manifest_path = os.path.join(directory, "manifest.json")
        self._entries: List[Dict[str, Any]] = []
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self._entries = json.load(f).get("entries", [])

    def _write_manifest(self):
        with open(self._manifest_path, "w") as f:
            json.dump({"entries": self._entries, "monitor": self.monitor}, f, indent=2)

    def save(self, state, step: int, metrics: Optional[Dict[str, float]] = None):
        last_path = os.path.join(self.directory, "last.ckpt")
        save_checkpoint(last_path, state)
        metric_val = (metrics or {}).get(self.monitor)
        if metric_val is not None:
            path = os.path.join(self.directory, f"step{step}.ckpt")
            save_checkpoint(path, state)
            self._entries.append({"step": step, "path": path, self.monitor: float(metric_val)})
            sign = 1 if self.mode == "min" else -1
            self._entries.sort(key=lambda e: sign * e[self.monitor])
            for stale in self._entries[self.top_k :]:
                if os.path.exists(stale["path"]):
                    os.remove(stale["path"])
            self._entries = self._entries[: self.top_k]
        self._write_manifest()

    def best_path(self) -> Optional[str]:
        return self._entries[0]["path"] if self._entries else None

    def last_path(self) -> Optional[str]:
        p = os.path.join(self.directory, "last.ckpt")
        return p if os.path.exists(p) else None


def find_checkpoint(directory: str, checkpoint_type: str = "best_so_far") -> str:
    """Resolve a checkpoint path from a run/checkpoint directory."""
    if checkpoint_type.endswith(".ckpt"):
        path = checkpoint_type if os.path.isabs(checkpoint_type) else os.path.join(directory, checkpoint_type)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return path
    mgr = CheckpointManager(directory)
    if checkpoint_type == "last":
        path = mgr.last_path()
    elif checkpoint_type == "best_so_far":
        path = mgr.best_path() or mgr.last_path()
    else:
        raise ValueError(f"unknown checkpoint_type {checkpoint_type!r}")
    if path is None:
        raise FileNotFoundError(f"no checkpoint found in {directory}")
    return path
