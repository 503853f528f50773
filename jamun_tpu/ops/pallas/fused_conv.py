"""Pallas TPU kernel: fused dense equivariant convolution (l<=1, separable TP).

One kernel program per graph computes, entirely in VMEM:
    edge vectors -> spherical harmonics + gaussian radial basis + adjacency
    -> radial MLP (two MXU matmuls) -> depthwise tensor product messages
    -> masked sum over incoming edges (+ degree)
replacing the XLA chain that materializes [G, N, N, 704] messages and
[G, N, N, W] radial weights in HBM between stages. HBM traffic per layer drops
from O(N^2 * C) to O(N * C).

Scope: irreps_in = S x0e + V x1e, irreps_sh = 1x0e + 1x1e, radial MLP
64 -> 64 -> (2S + 3V), dtp output blocks [S x0e, S x1e, V x1e, V x0e, V x1e]
(construction order of `jamun_tpu.ops.tensor_product.depthwise_tp`). This is
exactly the flagship separable E3Conv configuration; other shapes fall back to
the XLA path.

Feature layout inside the kernel is structure-of-arrays: the 1e block of the
input is passed de-interleaved as [V(y), V(z), V(x)] groups; the output is
returned SoA and re-interleaved by the wrapper (cheap [N, C] transposes).

Bonded edges are NOT handled here (small static list; added by the caller via
the XLA path).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_uvu_conv_dense", "supports_fused_conv"]

_SQRT3 = math.sqrt(3.0)
_INV_SQRT3 = 1.0 / math.sqrt(3.0)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def supports_fused_conv(S: int, V: int, sh_dim: int, attr_dim: int, radial_hidden: int) -> bool:
    return sh_dim == 4 and attr_dim == 64 and radial_hidden == 64 and S > 0 and V > 0


def _kernel(
    # inputs (per graph block); feature/weight refs may be bf16 (compute_dtype)
    pos_ref,      # [K, N, 4]   xyz + pad
    s_ref,        # [K, N, S]   scalar features
    vy_ref,       # [K, N, V]
    vz_ref,       # [K, N, V]
    vx_ref,       # [K, N, V]
    mask_ref,     # [K, N, 1]   node mask
    w1_ref,       # [32, 64]    radial rows of layer 1 (bond rows folded into b1)
    b1_ref,       # [1, 64]     effective bias: b1 + bond0 @ w1[bond rows]
    w2o1_ref,     # [64, S]     layer-2 weights, split per TP path (lane-aligned)
    b2o1_ref,     # [1, S]
    w2o2_ref,     # [64, S]
    b2o2_ref,     # [1, S]
    w2o3_ref,     # [64, V]
    b2o3_ref,     # [1, V]
    w2o4_ref,     # [64, V]
    b2o4_ref,     # [1, V]
    w2o5_ref,     # [64, V]
    b2o5_ref,     # [1, V]
    scalars_ref,  # [1, 4]      cutoff, basis_step_inv ... in SMEM? keep VMEM
    # outputs (separate per-plane buffers: a single packed [N, 4S+7V+1] output
    # with in-kernel concat measured SLOWER — 2.34 vs 2.12 ms/call — the small
    # lane-misaligned concat/slice copies cost more than the extra DMAs)
    out_s_ref,    # [K, N, S]       o1
    out_sy_ref,   # [K, N, S]       o2 (y)
    out_sz_ref,   # [K, N, S]
    out_sx_ref,   # [K, N, S]
    out_v3y_ref,  # [K, N, V]       o3 (y)
    out_v3z_ref,  # [K, N, V]
    out_v3x_ref,  # [K, N, V]
    out_v0_ref,   # [K, N, V]       o4
    out_v5y_ref,  # [K, N, V]       o5 (y)
    out_v5z_ref,  # [K, N, V]
    out_v5x_ref,  # [K, N, V]
    deg_ref,      # [K, N, 1]
    *,
    N: int,
    S: int,
    V: int,
    n_radial: int,
    K: int = 1,
):
    # K graphs per program (unrolled). Measured on v5e (G=128, N=48, S=120,
    # V=32, bf16): K=1 2.56 ms/call, K=2 2.64, K=4 2.73 — per-program overhead
    # is NOT the bottleneck (the kernel is relayout/VPU-bound), so K=1 is the
    # default; the knob is kept for experimentation on other shapes.
    for k in range(K):
        _kernel_one(
            pos_ref, s_ref, vy_ref, vz_ref, vx_ref, mask_ref,
            w1_ref, b1_ref, w2o1_ref, b2o1_ref, w2o2_ref, b2o2_ref,
            w2o3_ref, b2o3_ref, w2o4_ref, b2o4_ref, w2o5_ref, b2o5_ref,
            scalars_ref,
            out_s_ref, out_sy_ref, out_sz_ref, out_sx_ref,
            out_v3y_ref, out_v3z_ref, out_v3x_ref, out_v0_ref,
            out_v5y_ref, out_v5z_ref, out_v5x_ref, deg_ref,
            k=k, N=N, S=S, V=V, n_radial=n_radial,
        )


def _kernel_one(
    pos_ref, s_ref, vy_ref, vz_ref, vx_ref, mask_ref,
    w1_ref, b1_ref, w2o1_ref, b2o1_ref, w2o2_ref, b2o2_ref,
    w2o3_ref, b2o3_ref, w2o4_ref, b2o4_ref, w2o5_ref, b2o5_ref,
    scalars_ref,
    out_s_ref, out_sy_ref, out_sz_ref, out_sx_ref,
    out_v3y_ref, out_v3z_ref, out_v3x_ref, out_v0_ref,
    out_v5y_ref, out_v5z_ref, out_v5x_ref, deg_ref,
    *,
    k: int,
    N: int,
    S: int,
    V: int,
    n_radial: int,
):
    f32 = jnp.float32
    cdt = s_ref.dtype  # compute dtype of the feature path (f32 or bf16)
    cutoff = scalars_ref[0, 0]
    px = pos_ref[k, :, 0]
    py = pos_ref[k, :, 1]
    pz = pos_ref[k, :, 2]
    mask = mask_ref[k, :, 0]  # [N]

    # pair geometry: rel[i, j] = pos[j] - pos[i]
    rx = px[None, :] - px[:, None]  # [N, N]
    ry = py[None, :] - py[:, None]
    rz = pz[None, :] - pz[:, None]
    d2 = rx * rx + ry * ry + rz * rz
    dist = jnp.sqrt(d2 + 1e-12)
    eye = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (N, N), 1
    )
    adj = (
        (dist < cutoff)
        & (~eye)
        & (mask[:, None] > 0)
        & (mask[None, :] > 0)
    ).astype(cdt)  # [N, N]

    inv_d = 1.0 / jnp.maximum(dist, 1e-12)
    # sh1 in (y, z, x) order, component normalization sqrt(3) * n
    shy = (_SQRT3 * ry * inv_d).astype(cdt)
    shz = (_SQRT3 * rz * inv_d).astype(cdt)
    shx = (_SQRT3 * rx * inv_d).astype(cdt)

    # gaussian radial basis (soft_one_hot_linspace, cutoff=True):
    # centers c_k = cutoff * k/(n+1), k=1..n; width = cutoff/(n+1)
    step = cutoff / (n_radial + 1)
    kb = jax.lax.broadcasted_iota(jnp.int32, (1, n_radial), 1).astype(f32) + 1.0  # [1, n]
    centers = step * kb  # [1, n]
    dflat = dist.reshape(N * N, 1)
    diff = (dflat - centers) / step  # [N*N, n]
    radial = (jnp.exp(-(diff * diff)) * (1.0 / 1.12)).astype(cdt)

    # radial MLP (MXU, f32 accumulate; SiLU in f32 — Mosaic's bf16 logistic
    # lowering is broken). The bondedness-0 embedding column block of the
    # first layer is constant across edges and pre-folded into b1 host-side,
    # so layer 1 is a single aligned [N*N, 32] x [32, 64] matmul (no concat).
    # Explicit matmul precision: the framework-global "highest" default maps
    # to a contract precision Mosaic rejects for bf16 operands ("Bad lhs
    # type"); 16-bit operands take the (already exact) single pass.
    from jamun_tpu.ops.precision import matmul_precision

    prec = matmul_precision(cdt)
    h32 = (
        jnp.dot(radial, w1_ref[...], preferred_element_type=f32, precision=prec)
        + b1_ref[0][None, :].astype(f32)
    )
    h = (h32 * jax.nn.sigmoid(h32)).astype(cdt)  # SiLU

    adjflat = adj.reshape(N * N, 1)

    def path_w(w2k_ref, b2k_ref, C):
        # one lane-aligned matmul per TP path — slicing a fused [N*N, 2S+3V]
        # output at non-128-multiple lane offsets forced Mosaic relayouts.
        wk = (
            jnp.dot(h, w2k_ref[...], preferred_element_type=f32, precision=prec)
            + b2k_ref[0][None, :].astype(f32)
        )
        return (wk.astype(cdt) * adjflat).reshape(N, N, C)  # adjacency pre-applied

    # path weights (construction order: o1 S, o2 S, o3 V, o4 V, o5 V)
    w1p = path_w(w2o1_ref, b2o1_ref, S)
    w2p = path_w(w2o2_ref, b2o2_ref, S)
    w3p = path_w(w2o3_ref, b2o3_ref, V)
    w4p = path_w(w2o4_ref, b2o4_ref, V)
    w5p = path_w(w2o5_ref, b2o5_ref, V)

    s = s_ref[k]  # [N, S] (src index j)
    vy = vy_ref[k]
    vz = vz_ref[k]
    vx = vx_ref[k]

    def agg(msg):  # [N(i), N(j), C] -> [N, C] sum over j (adj already in w)
        return jnp.sum(msg.astype(f32), axis=1).astype(out_s_ref.dtype)

    sj = s[None, :, :]  # src features broadcast over dst
    # o1: w1p * s[j]   (0e x 0e -> 0e, sh0 = 1)
    out_s_ref[k] = agg(w1p * sj)
    # o2: w2p * s[j] * sh1_k
    t2 = w2p * sj
    out_sy_ref[k] = agg(t2 * shy[:, :, None])
    out_sz_ref[k] = agg(t2 * shz[:, :, None])
    out_sx_ref[k] = agg(t2 * shx[:, :, None])
    # o3: w3p * v[j]_k ; o5: w5p * (v[j] x sh1)_k / sqrt(2)
    vyj = vy[None, :, :]
    vzj = vz[None, :, :]
    vxj = vx[None, :, :]
    shy3 = shy[:, :, None]
    shz3 = shz[:, :, None]
    shx3 = shx[:, :, None]
    # cross product in (y, z, x) cyclic basis: (v x s)_y = v_z s_x - v_x s_z, etc.
    cy = vzj * shx3 - vxj * shz3
    cz = vxj * shy3 - vyj * shx3
    cx = vyj * shz3 - vzj * shy3
    out_v3y_ref[k] = agg(w3p * vyj)
    out_v3z_ref[k] = agg(w3p * vzj)
    out_v3x_ref[k] = agg(w3p * vxj)
    out_v5y_ref[k] = agg(w5p * cy * _INV_SQRT2)
    out_v5z_ref[k] = agg(w5p * cz * _INV_SQRT2)
    out_v5x_ref[k] = agg(w5p * cx * _INV_SQRT2)
    # o4: w4p * (v[j] . sh1) / sqrt(3)
    dot = vyj * shy3 + vzj * shz3 + vxj * shx3
    out_v0_ref[k] = agg(w4p * dot * _INV_SQRT3)

    deg_ref[k] = jnp.sum(adj.astype(f32), axis=1)[:, None].astype(deg_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("S", "V", "n_radial", "interpret", "compute_dtype", "graphs_per_program"),
)
def fused_uvu_conv_dense(
    pos: jnp.ndarray,       # [G, N, 3] f32
    node_mask: jnp.ndarray, # [G, N] bool
    x: jnp.ndarray,         # [G, N, S + 3V] packed irreps (f32/bf16)
    w1: jnp.ndarray,        # [64, 64]
    b1: jnp.ndarray,        # [64]
    w2: jnp.ndarray,        # [64, 2S + 3V]
    b2: jnp.ndarray,        # [2S + 3V]
    bond0: jnp.ndarray,     # [32] bondedness-0 embedding
    cutoff: jnp.ndarray,    # scalar
    S: int,
    V: int,
    n_radial: int = 32,
    interpret: bool = False,
    compute_dtype=None,
    graphs_per_program: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (aggregated dtp messages [G, N, 2S+3V+... packed], degree [G, N]).

    Output packed in the depthwise_tp block order [Sx0e, Sx1e, Vx1e, Vx0e, Vx1e]
    with standard interleaved (mul, component) layout — directly consumable by
    the post-linear.
    """
    G, N, _ = pos.shape
    f32 = jnp.float32
    cdt = compute_dtype or jnp.float32
    # tile K graphs per kernel program (amortizes grid dispatch + DMA latency);
    # pad G up to a multiple of K with masked-out graphs.
    K = max(1, min(graphs_per_program, G))
    Gp = ((G + K - 1) // K) * K
    if Gp != G:
        padg = Gp - G
        pos = jnp.concatenate([pos, jnp.zeros((padg, N, 3), pos.dtype)], axis=0)
        node_mask = jnp.concatenate(
            [node_mask, jnp.zeros((padg, N), node_mask.dtype)], axis=0
        )
        x = jnp.concatenate([x, jnp.zeros((padg,) + x.shape[1:], x.dtype)], axis=0)
    # de-interleave the 1e block into SoA components
    s_feat = x[..., :S].astype(cdt)
    v = x[..., S:].reshape(Gp, N, V, 3).astype(cdt)
    vy, vz, vx = v[..., 0], v[..., 1], v[..., 2]

    pos_pad = jnp.concatenate([pos.astype(f32), jnp.zeros((Gp, N, 1), f32)], axis=-1)
    maskf = node_mask.astype(f32)[..., None]
    scalars = jnp.broadcast_to(jnp.asarray([cutoff, 0.0, 0.0, 0.0], f32)[None], (1, 4))

    # host-side weight prep: the edge attr is [bond0 (const) | radial], so the
    # bond block of layer 1 contributes a constant vector — fold it into the
    # bias; split layer 2 per TP path so every kernel matmul output is
    # lane-aligned (slicing a fused [N*N, 2S+3V] at offsets S, 2S, ... forced
    # Mosaic relayouts that dominated the kernel's runtime).
    nb = w1.shape[0] - n_radial  # bond-embedding rows of layer 1
    # full-precision fold (XLA's default TPU matmul precision is bf16 — that
    # rounding on a BIAS is amplified across every edge)
    b1_eff = b1 + jnp.einsum(
        "i,ij->j", bond0.astype(f32), w1[:nb].astype(f32),
        precision=jax.lax.Precision.HIGHEST,
    )
    w1r = w1[nb:]  # [n_radial, 64]
    w2s = []
    off = 0
    for C in (S, S, V, V, V):
        w2s.append((w2[:, off : off + C].astype(cdt), b2[off : off + C].astype(f32)[None]))
        off += C

    kernel = functools.partial(_kernel, N=N, S=S, V=V, n_radial=n_radial, K=K)

    def gspec(shape):
        return pl.BlockSpec((K,) + shape, lambda g: (g,) + (0,) * len(shape), memory_space=pltpu.VMEM)

    def shared(shape):
        return pl.BlockSpec(shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)

    out_shapes = tuple(
        jax.ShapeDtypeStruct((Gp, N, C), f32)
        for C in (S, S, S, S, V, V, V, V, V, V, V, 1)
    )
    outs = pl.pallas_call(
        kernel,
        grid=(Gp // K,),
        in_specs=[
            gspec((N, 4)),
            gspec((N, S)),
            gspec((N, V)),
            gspec((N, V)),
            gspec((N, V)),
            gspec((N, 1)),
            shared((n_radial, 64)),
            shared((1, 64)),
        ]
        + [
            spec
            for wk, bk in w2s
            for spec in (shared(wk.shape), shared(bk.shape))
        ]
        + [shared((1, 4))],
        out_specs=tuple(gspec(sh.shape[1:]) for sh in out_shapes),
        out_shape=out_shapes,
        interpret=interpret,
        # f32 mode + highest matmul precision (jax_setup) inflates the
        # in-kernel matmul scratch past the 16 MiB scoped-vmem default when
        # K > 1; raise the ceiling (v5e has far more VMEM than the default).
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(
        pos_pad,
        s_feat,
        vy,
        vz,
        vx,
        maskf,
        w1r.astype(cdt),
        b1_eff.astype(f32)[None],
        *[a for wk, bk in w2s for a in (wk, bk)],
        scalars,
    )
    o1, o2y, o2z, o2x, o3y, o3z, o3x, o4, o5y, o5z, o5x, deg = (
        (a[:G] if Gp != G else a) for a in outs
    )

    # re-interleave to the packed dtp block order
    # [Sx0e | Sx1e | Vx1e(o3) | Vx0e(o4) | Vx1e(o5)].
    s1e = jnp.stack([o2y, o2z, o2x], axis=-1).reshape(G, N, 3 * S)
    v3 = jnp.stack([o3y, o3z, o3x], axis=-1).reshape(G, N, 3 * V)
    v5 = jnp.stack([o5y, o5z, o5x], axis=-1).reshape(G, N, 3 * V)
    packed = jnp.concatenate([o1, s1e, v3, o4, v5], axis=-1)
    return packed, deg[..., 0]
