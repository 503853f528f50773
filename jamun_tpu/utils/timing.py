"""Tunnel-proof wall-clock timing for chained device workloads.

The axon tunnel's `block_until_ready` has been observed to ack BEFORE the
dispatch actually executes (reliably right after cold compiles,
intermittently otherwise — BENCH_NOTES round 3d), which makes naive timings
report physically impossible numbers. The rules, shared by every bench
script:

1. sync via a SCALAR VALUE FETCH (`float(jnp.sum(...))`) — a value fetch
   cannot return before the computation that produces it;
2. reject timings faster than a physical floor (default 1 us per chained
   step) and retry a bounded number of times;
3. report failure explicitly instead of printing the artifact.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

MIN_S_PER_STEP = 1e-6  # nothing on this chip finishes a model step in <1 us


def timed_chain(
    run: Callable[[], None],
    steps: int,
    *,
    min_s_per_step: float = MIN_S_PER_STEP,
    max_tries: int = 6,
) -> Optional[float]:
    """Time `run()` (which must END with a scalar value fetch) and return the
    first plausible elapsed seconds, or None if every try measured the
    early-ack artifact. Callers must handle None loudly (error line / skipped
    row), never report it as a speedup."""
    for _ in range(max_tries):
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        if dt >= steps * min_s_per_step:
            return dt
    return None
