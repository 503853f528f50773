"""XLA fast path for the dense l<=1 separable (uvu) convolution.

Same math as the Pallas kernel (`ops/pallas/fused_conv.py`) in plain jnp with
structure-of-arrays component planes: explicit y/z/x slices instead of the
generic packed-irreps einsums, which removes the (mul, component) interleave
reshapes/transposes the generic `WeightedTensorProduct` path forces XLA to
materialize between stages. Unlike the Pallas kernel this path is usable
inside `lax.scan` (it is ordinary XLA) and is differentiable, so it serves
training too.

dtp output block order matches `depthwise_tp`: [Sx0e, Sx1e, Vx1e, Vx0e, Vx1e].
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

__all__ = ["fast_uvu_messages_dense", "fast_uvu_messages_nbr"]

_INV_SQRT3 = 1.0 / math.sqrt(3.0)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_SQRT3 = math.sqrt(3.0)


def fast_uvu_messages_dense(
    x: jnp.ndarray,        # [G, N, S + 3V] packed irreps node features
    sh_dense: jnp.ndarray, # [G, N, N, 4]  (1x0e ++ 1x1e in (y,z,x))
    weights: jnp.ndarray,  # [G, N, N, 2S + 3V] radial-MLP output
    adj: jnp.ndarray,      # [G, N, N]
    S: int,
    V: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregated dtp messages [G, N, S + 3S + 3V + V + 3V] + degree [G, N].

    V == 0 (scalar-only input, e.g. the embedding projector) yields [G, N, 4S]
    with blocks [Sx0e, Sx1e]. In atom-sharded mode x holds the full gathered
    SRC atoms while sh/weights/adj are dst-sliced [G, N_dst, N_src, ...]."""
    G, N, _ = x.shape  # N = N_src
    Nd = adj.shape[1]  # N_dst (== N except in atom-sharded mode)
    dt = weights.dtype
    s = x[..., :S].astype(dt)  # [G, N, S]

    shy = sh_dense[..., 1].astype(dt)  # [G, N, N]
    shz = sh_dense[..., 2].astype(dt)
    shx = sh_dense[..., 3].astype(dt)

    w1 = weights[..., 0:S]
    w2 = weights[..., S : 2 * S]

    adj = adj.astype(dt)
    adj3 = adj[..., None]

    def agg(msg):  # [G, N(dst), N(src), C] -> [G, N, C]
        return jnp.sum(msg * adj3, axis=2)

    sj = s[:, None, :, :]  # broadcast src over dst
    o1 = agg(w1 * sj)
    t2 = w2 * sj
    o2y = agg(t2 * shy[..., None])
    o2z = agg(t2 * shz[..., None])
    o2x = agg(t2 * shx[..., None])

    s1e = jnp.stack([o2y, o2z, o2x], axis=-1).reshape(G, Nd, 3 * S)
    deg = jnp.sum(adj, axis=-1)
    if V == 0:
        return jnp.concatenate([o1, s1e], axis=-1), deg

    v = x[..., S:].reshape(G, N, V, 3).astype(dt)
    vy, vz, vx = v[..., 0], v[..., 1], v[..., 2]
    w3 = weights[..., 2 * S : 2 * S + V]
    w4 = weights[..., 2 * S + V : 2 * S + 2 * V]
    w5 = weights[..., 2 * S + 2 * V : 2 * S + 3 * V]

    vyj, vzj, vxj = vy[:, None], vz[:, None], vx[:, None]
    shy3, shz3, shx3 = shy[..., None], shz[..., None], shx[..., None]
    o3y = agg(w3 * vyj)
    o3z = agg(w3 * vzj)
    o3x = agg(w3 * vxj)
    o4 = agg(w4 * (vyj * shy3 + vzj * shz3 + vxj * shx3) * _INV_SQRT3)
    # cross product in the cyclic (y, z, x) basis
    o5y = agg(w5 * (vzj * shx3 - vxj * shz3) * _INV_SQRT2)
    o5z = agg(w5 * (vxj * shy3 - vyj * shx3) * _INV_SQRT2)
    o5x = agg(w5 * (vyj * shz3 - vzj * shy3) * _INV_SQRT2)

    v3 = jnp.stack([o3y, o3z, o3x], axis=-1).reshape(G, Nd, 3 * V)
    v5 = jnp.stack([o5y, o5z, o5x], axis=-1).reshape(G, Nd, 3 * V)
    packed = jnp.concatenate([o1, s1e, v3, o4, v5], axis=-1)
    return packed, deg


def fast_uvu_messages_nbr(
    x: jnp.ndarray,         # [G, N_src, S + 3V] packed irreps node features
    sh_nbr: jnp.ndarray,    # [G, N, K, 4]  (1x0e ++ 1x1e in (y,z,x))
    weights: jnp.ndarray,   # [G, N, K, 2S + 3V] radial-MLP output
    nbr_idx: jnp.ndarray,   # [G, N, K] -> src index
    nbr_mask: jnp.ndarray,  # [G, N, K]
    S: int,
    V: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse-neighbor variant of `fast_uvu_messages_dense`: identical math
    with the src axis replaced by a gathered K-neighbor axis
    (ops/neighbors.py). O(N*K) message work instead of O(N^2); the backward
    pass of the feature gather is an XLA scatter-add over at most N*K rows.
    """
    from jamun_tpu.ops.neighbors import gather_neighbors

    G, Nd, K = nbr_idx.shape
    dt = weights.dtype
    xg = gather_neighbors(x, nbr_idx).astype(dt)  # [G, N, K, S + 3V]
    s = xg[..., :S]

    shy = sh_nbr[..., 1].astype(dt)  # [G, N, K]
    shz = sh_nbr[..., 2].astype(dt)
    shx = sh_nbr[..., 3].astype(dt)

    w1 = weights[..., 0:S]
    w2 = weights[..., S : 2 * S]

    m = nbr_mask.astype(dt)
    m3 = m[..., None]

    def agg(msg):  # [G, N, K, C] -> [G, N, C]
        return jnp.sum(msg * m3, axis=2)

    o1 = agg(w1 * s)
    t2 = w2 * s
    o2y = agg(t2 * shy[..., None])
    o2z = agg(t2 * shz[..., None])
    o2x = agg(t2 * shx[..., None])

    s1e = jnp.stack([o2y, o2z, o2x], axis=-1).reshape(G, Nd, 3 * S)
    deg = jnp.sum(m, axis=-1)
    if V == 0:
        return jnp.concatenate([o1, s1e], axis=-1), deg

    v = xg[..., S:].reshape(G, Nd, K, V, 3)
    vy, vz, vx = v[..., 0], v[..., 1], v[..., 2]
    w3 = weights[..., 2 * S : 2 * S + V]
    w4 = weights[..., 2 * S + V : 2 * S + 2 * V]
    w5 = weights[..., 2 * S + 2 * V : 2 * S + 3 * V]

    shy3, shz3, shx3 = shy[..., None], shz[..., None], shx[..., None]
    o3y = agg(w3 * vy)
    o3z = agg(w3 * vz)
    o3x = agg(w3 * vx)
    o4 = agg(w4 * (vy * shy3 + vz * shz3 + vx * shx3) * _INV_SQRT3)
    # cross product in the cyclic (y, z, x) basis
    o5y = agg(w5 * (vz * shx3 - vx * shz3) * _INV_SQRT2)
    o5z = agg(w5 * (vx * shy3 - vy * shx3) * _INV_SQRT2)
    o5x = agg(w5 * (vy * shz3 - vz * shy3) * _INV_SQRT2)

    v3 = jnp.stack([o3y, o3z, o3x], axis=-1).reshape(G, Nd, 3 * V)
    v5 = jnp.stack([o5y, o5z, o5x], axis=-1).reshape(G, Nd, 3 * V)
    packed = jnp.concatenate([o1, s1e, v3, o4, v5], axis=-1)
    return packed, deg
