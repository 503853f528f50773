"""Multi-host initialization + cross-host utilities.

Reference parity: NCCL/DDP process-group setup via Lightning + srun
(`/root/reference/scripts/slurm/train.sh:31-37`, `utils/dist_log.py`). On TPU
pods each host runs the same program; `jax.distributed.initialize()` discovers
the topology from the runtime, DCN links hosts, ICI links chips.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger("jamun_tpu")

__all__ = ["initialize_distributed", "is_multihost", "process_index", "host_log"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed when running multi-host; no-op single host.

    On Cloud TPU pods all arguments are auto-discovered. For manual clusters
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or pass
    explicitly.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    try:
        if coordinator_address:
            jax.distributed.initialize(coordinator_address, num_processes, process_id)
        elif os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
            jax.distributed.initialize()  # auto-discovery on pods
        else:
            return  # single host
        log.info(
            "jax.distributed initialized: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except Exception as e:  # pragma: no cover
        log.warning("jax.distributed init skipped: %s", e)


def is_multihost() -> bool:
    import jax

    return jax.process_count() > 1


def process_index() -> int:
    import jax

    return jax.process_index()


def host_log(msg: str, *args) -> None:
    """Per-host prefixed logging — replaces the reference's barrier-ordered
    rank logging (`utils/dist_log.py:15-28`) with prefix + per-host files."""
    import jax

    log.info("[host %d] " + msg, jax.process_index(), *args)
