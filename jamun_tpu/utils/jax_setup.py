"""Common JAX runtime setup: persistent compilation cache.

The tunneled TPU backend in this environment compiles slowly (tens of seconds
to minutes per program); the persistent cache makes re-runs of the CLIs/bench
near-instant.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("jamun_tpu")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_DEFAULT_CACHE_DIR = os.environ.get(
    "JAMUN_TPU_JAX_CACHE", os.path.join(_REPO_ROOT, ".jax_cache")
)


def setup_jax(compilation_cache_dir: str = _DEFAULT_CACHE_DIR) -> None:
    import jax

    try:
        os.makedirs(compilation_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", compilation_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - best effort
        log.warning("could not enable jax compilation cache: %s", e)
    # f32 matmuls on TPU default to single-pass bf16 (~3e-3 relative error —
    # measured on the radial MLP); force true-f32 decomposition so f32 mode is
    # actually f32. bf16 inputs (the production compute dtype) are unaffected.
    jax.config.update("jax_default_matmul_precision", "highest")
