"""Matmul precision policy.

`utils.jax_setup.setup_jax` sets the GLOBAL default matmul precision to
"highest" so that float32 mode is actually float32 on TPU (the hardware
default lowers f32 matmuls to a single bf16 MXU pass — measured ~3e-3 relative
error on the radial MLP).

For 16-bit compute dtypes that global would be counterproductive: "highest"
upcasts bf16 operands to a multi-pass f32 algorithm, costing throughput while
adding nothing (a single MXU pass is already exact for bf16 operands, with f32
accumulation). Hot modules therefore ask `matmul_precision(dtype)` for an
explicit per-op precision: single-pass for 16-bit dtypes, inherit-global
(i.e. true f32) otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["matmul_precision"]


def matmul_precision(dtype):
    """Explicit precision for a matmul whose operands are `dtype`.

    Returns DEFAULT (single-pass) for 16-bit float dtypes, None (inherit the
    global setting — "highest" under setup_jax) for everything else.
    """
    if dtype is None:
        return None
    # accept dtype objects AND config strings like "bfloat16"
    if jnp.dtype(dtype) in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16)):
        return jax.lax.Precision.DEFAULT
    return None
