"""Pallas TPU kernel: fused capped-neighbor (sparse) separable convolution.

The sparse execution path (`ops/neighbors.py` + `ops/fast_uvu.py::
fast_uvu_messages_nbr`) is the production replacement for torch_cluster +
torch_scatter at IDRome scale (`/root/reference/src/jamun/model/denoiser.py:149`,
`/root/reference/src/jamun/e3tools/nn/_conv.py:116-117`). Measured on v5e
(BENCH_NOTES round 5a), its XLA form is dominated by the [G, N, K] row-gather
of node features: the gather ALONE costs 1.3-1.5 ms at N=1024/G=2/C=216 —
~20x the HBM floor — and every one of the ~6 layers pays it, plus HBM
materialization of the [G, N, K, 2S+3V] radial weights between stages.

This kernel runs one dst-atom tile per program and keeps everything in VMEM:

    attr tile -> radial MLP (two MXU matmuls)
    idx tile  -> BLOCK-SPARSE masked one-hot gather: the src axis is cut into
                 SB=128 blocks; a per-(dst-tile, src-block) activity bitmap
                 (computed on the host side of the call, folded into the jit)
                 predicates one [Tn*K, SB] one-hot matmul per ACTIVE block —
                 chain-geometry neighbor lists touch only a few blocks, so
                 most of the O(N*K*Np) gather FLOPs are skipped
    -> depthwise-TP messages -> sum over K (+ degree)

Layout tricks (measured constraints, see fused_conv.py for the house rules):
  - masked slots are folded into the indices (sentinel Np, out of every
    block's range) so the one-hot needs no mask multiply;
  - the three 1e component planes are gathered as ONE [Np, 3V] concat matmul
    and kept concatenated through the products: the o3/o4/o5 path weights are
    column-tiled to [.., 3V] host-side, the SH factors are expanded to the
    concat layout by a tiny [Tn*K, 3] @ [3, 3V] matmul, and the cross product
    becomes two cyclic lane-rolls (group permutations) of elementwise
    products — no sub-128-lane slicing anywhere in the hot path.

HBM traffic per layer drops from O(N*K*C) * (gather materialization + radial
weights + ~10 product intermediates) to O(N*K*A) reads + O(N*C_out) writes.

Scope mirrors `fused_conv.py`: irreps_in = S x0e [+ V x1e], irreps_sh =
1x0e + 1x1e, radial MLP A -> 64 -> (2S + 3V), output blocks in
`depthwise_tp` construction order [Sx0e, Sx1e, Vx1e, Vx0e, Vx1e]. V == 0
(the embedding projector) is supported. Bonded edges are NOT handled here
(small static list; added by the caller via the XLA path). Forward-only —
training keeps the XLA sparse path (dispatch in `models/e3conv.py`).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nbr_uvu_conv", "nbr_edge_features", "supports_nbr_conv"]

_INV_SQRT3 = 1.0 / math.sqrt(3.0)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)

_SB = 128   # src atoms per gather block


def _env_tn(name: str, default: int) -> int:
    """Process-constant tile-size override (tuning sweeps only)."""
    import os

    return int(os.environ.get(name, default))


def _TN():  # dst atoms per conv-kernel program
    return _env_tn("JAMUN_NBR_TN", 128)


def _TN_GEOM():  # dst atoms per edge-features-kernel program — larger tiles
    # amortize the per-program overhead that dominates this small kernel
    # (measured 34 us/program vs ~8 us of compute at N=1024, round 5a)
    return _env_tn("JAMUN_NBR_TN_GEOM", 512)


def supports_nbr_conv(S: int, V: int, sh_dim: int, attr_dim: int, radial_hidden: int, K: int) -> bool:
    """Shape support: flagship separable config + K a sublane multiple."""
    return (
        sh_dim == 4
        and attr_dim == 64
        and radial_hidden == 64
        and S > 0
        and K >= 8
        and K % 8 == 0
    )


def _kernel(
    act_ref,  # scalar-prefetch: [G*T*B] int32 block-activity bitmap
    *refs,
    Np: int,
    Tn: int,
    SB: int,
    K: int,
    S: int,
    V: int,
):
    """Ref order after the scalar-prefetch bitmap (V > 0): s, v3, sh, attr,
    idxm, mask, E96, w1, b1, (w2/b2 per path: o1, o2, o3t, o4t, o5t), then
    outputs o1, o2y/z/x, o3c, o4, o5c, deg, then scratch acc_s[, acc_v].
    V == 0 drops v3/E96/o3t..o5t/o3c/o4/o5c (the wrapper builds the matching
    spec list)."""
    it = iter(refs)
    s_ref = next(it)
    v3_ref = next(it) if V > 0 else None
    sh_ref, attr_ref, idxm_ref, mask_ref = (next(it), next(it), next(it), next(it))
    E96_ref = next(it) if V > 0 else None
    w1_ref, b1_ref = next(it), next(it)
    w2o1_ref, b2o1_ref, w2o2_ref, b2o2_ref = next(it), next(it), next(it), next(it)
    if V > 0:
        w2o3_ref, b2o3_ref, w2o4_ref, b2o4_ref, w2o5_ref, b2o5_ref = (
            next(it), next(it), next(it), next(it), next(it), next(it)
        )
    out_s_ref, out_sy_ref, out_sz_ref, out_sx_ref = next(it), next(it), next(it), next(it)
    if V > 0:
        out_v3c_ref, out_v4_ref, out_v5c_ref = next(it), next(it), next(it)
    deg_ref = next(it)
    if V > 0:
        acc_s_ref, acc_v_ref = next(it), next(it)
    else:
        acc_s_ref = next(it)
        acc_v_ref = None

    f32 = jnp.float32
    cdt = s_ref.dtype
    from jamun_tpu.ops.precision import matmul_precision

    prec = matmul_precision(cdt)
    B = Np // SB
    idxm = idxm_ref[0]  # [Tn, K] int32; masked slots hold Np (out of range)

    if B == 1:
        # single-block fast path: one unpredicated one-hot + matmul
        cols = jax.lax.broadcasted_iota(jnp.int32, (Tn, K, Np), 2)
        onehot = (idxm[:, :, None] == cols).astype(f32).reshape(Tn * K, Np).astype(cdt)
        sg = jnp.dot(
            onehot, s_ref[0].astype(cdt), preferred_element_type=f32, precision=prec
        ).astype(cdt)
        vg3 = (
            jnp.dot(
                onehot, v3_ref[0].astype(cdt), preferred_element_type=f32, precision=prec
            ).astype(cdt)
            if V > 0
            else None
        )
    else:
        # block-sparse gather: accumulate per active src block
        acc_s_ref[...] = jnp.zeros(acc_s_ref.shape, acc_s_ref.dtype)
        if V > 0:
            acc_v_ref[...] = jnp.zeros(acc_v_ref.shape, acc_v_ref.dtype)
        cols_sb = jax.lax.broadcasted_iota(jnp.int32, (Tn, K, SB), 2)
        T = Np // Tn
        base = (pl.program_id(0) * T + pl.program_id(1)) * B
        for b in range(B):

            @pl.when(act_ref[base + b] > 0)
            def _(b=b):
                rel = idxm - b * SB
                oh = (
                    (rel[:, :, None] == cols_sb).astype(f32).reshape(Tn * K, SB).astype(cdt)
                )
                acc_s_ref[...] += jnp.dot(
                    oh,
                    s_ref[0][b * SB : (b + 1) * SB, :].astype(cdt),
                    preferred_element_type=f32,
                    precision=prec,
                )
                if V > 0:
                    acc_v_ref[...] += jnp.dot(
                        oh,
                        v3_ref[0][b * SB : (b + 1) * SB, :].astype(cdt),
                        preferred_element_type=f32,
                        precision=prec,
                    )

        sg = acc_s_ref[...].astype(cdt)
        vg3 = acc_v_ref[...].astype(cdt) if V > 0 else None

    # radial MLP (f32 accumulate; SiLU in f32 — Mosaic's bf16 logistic
    # lowering is broken, see fused_conv.py)
    attr = attr_ref[0].reshape(Tn * K, attr_ref.shape[-1]).astype(cdt)
    h32 = (
        jnp.dot(attr, w1_ref[...].astype(cdt), preferred_element_type=f32, precision=prec)
        + b1_ref[0][None, :].astype(f32)
    )
    h = (h32 * jax.nn.sigmoid(h32)).astype(cdt)

    def path_w(w2k_ref, b2k_ref):
        wk = (
            jnp.dot(h, w2k_ref[...].astype(cdt), preferred_element_type=f32, precision=prec)
            + b2k_ref[0][None, :].astype(f32)
        )
        return wk.astype(cdt)  # [Tn*K, C] — the mask lives in the gather

    # sh planes as [Tn*K, 1] lane-broadcast factors (keep-dims slices: the
    # [Tn, K, 1] -> [Tn*K, 1] reshape only merges majors — no minor insert)
    shy = sh_ref[0][:, :, 1:2].reshape(Tn * K, 1).astype(cdt)
    shz = sh_ref[0][:, :, 2:3].reshape(Tn * K, 1).astype(cdt)
    shx = sh_ref[0][:, :, 3:4].reshape(Tn * K, 1).astype(cdt)

    def agg(msg, C):  # [Tn*K, C] -> [Tn, C] sum over K (f32)
        return jnp.sum(msg.reshape(Tn, K, C).astype(f32), axis=1)

    w1p = path_w(w2o1_ref, b2o1_ref)
    w2p = path_w(w2o2_ref, b2o2_ref)
    out_s_ref[0] = agg(w1p * sg, S).astype(out_s_ref.dtype)
    t2 = w2p * sg
    out_sy_ref[0] = agg(t2 * shy, S).astype(out_s_ref.dtype)
    out_sz_ref[0] = agg(t2 * shz, S).astype(out_s_ref.dtype)
    out_sx_ref[0] = agg(t2 * shx, S).astype(out_s_ref.dtype)

    if V > 0:
        V3 = 3 * V
        # sh in the concat (y|z|x)-group layout: [Tn*K, 3] @ [3, 3V]
        sh3 = sh_ref[0][:, :, 1:4].reshape(Tn * K, 3).astype(cdt)
        sh96 = jnp.dot(
            sh3, E96_ref[...].astype(cdt), preferred_element_type=f32, precision=prec
        ).astype(cdt)
        w3p = path_w(w2o3_ref, b2o3_ref)  # [Tn*K, 3V] (column-tiled host-side)
        w4p = path_w(w2o4_ref, b2o4_ref)
        w5p = path_w(w2o5_ref, b2o5_ref)
        out_v3c_ref[0] = agg(w3p * vg3, V3).astype(out_s_ref.dtype)
        o4c = agg(w4p * vg3 * sh96, V3)  # [Tn, 3V] f32
        out_v4_ref[0] = (
            (o4c[:, :V] + o4c[:, V : 2 * V] + o4c[:, 2 * V :]) * _INV_SQRT3
        ).astype(out_s_ref.dtype)
        # cross product via cyclic group rolls: with U[g] = v[g] * sh[(g+2)%3]
        # and W[g] = v[g] * sh[(g+1)%3], o5[g] = v[g+1]*sh[g+2] - v[g+2]*sh[g+1]
        # = W[(g+1)%3] - U[(g+2)%3] — two group rolls of elementwise products
        shrot_a = jnp.roll(sh96, V, axis=1)       # groups [shx, shy, shz]
        shrot_b = jnp.roll(sh96, 2 * V, axis=1)   # groups [shz, shx, shy]
        U = vg3 * shrot_a
        W = vg3 * shrot_b
        cross = jnp.roll(W, 2 * V, axis=1) - jnp.roll(U, V, axis=1)
        out_v5c_ref[0] = (agg(w5p * cross, V3) * _INV_SQRT2).astype(out_s_ref.dtype)

    deg_ref[0] = jnp.sum(mask_ref[0].astype(f32), axis=1)[:, None].astype(deg_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("S", "V", "interpret", "compute_dtype")
)
def nbr_uvu_conv(
    x: jnp.ndarray,         # [G, N, S + 3V] packed irreps node features
    sh_nbr: jnp.ndarray,    # [G, N, K, 4]
    attr_nbr: jnp.ndarray,  # [G, N, K, A]
    nbr_idx: jnp.ndarray,   # [G, N, K] int32 (src index)
    nbr_mask: jnp.ndarray,  # [G, N, K]
    w1: jnp.ndarray,        # [A, 64]
    b1: jnp.ndarray,        # [64]
    w2: jnp.ndarray,        # [64, 2S + 3V]
    b2: jnp.ndarray,        # [2S + 3V]
    S: int,
    V: int,
    interpret: bool = False,
    compute_dtype=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused sparse-conv layer. Returns (packed dtp messages
    [G, N, 4S + 7V] in [Sx0e | Sx1e | Vx1e | Vx0e | Vx1e] interleaved block
    order, degree [G, N]) — same contract as
    `fast_uvu_messages_nbr(x, sh_nbr, radial_nn(attr_nbr), ...)`.
    """
    G, N, K = nbr_idx.shape
    f32 = jnp.float32
    cdt = compute_dtype or jnp.float32

    # pad dst atoms to a tile multiple (masked rows aggregate to zero); src
    # axis is padded identically so the one-hot width matches x's rows
    Tn = min(_TN(), max(8, N))
    Np = ((N + Tn - 1) // Tn) * Tn
    if Np != N:
        padn = Np - N
        x = jnp.pad(x, ((0, 0), (0, padn), (0, 0)))
        sh_nbr = jnp.pad(sh_nbr, ((0, 0), (0, padn), (0, 0), (0, 0)))
        attr_nbr = jnp.pad(attr_nbr, ((0, 0), (0, padn), (0, 0), (0, 0)))
        nbr_idx = jnp.pad(nbr_idx, ((0, 0), (0, padn), (0, 0)))
        nbr_mask = jnp.pad(nbr_mask, ((0, 0), (0, padn), (0, 0)))

    SB = _SB if Np % _SB == 0 else Np
    B = Np // SB
    T = Np // Tn

    # fold the mask into the indices: masked slots point at the sentinel Np,
    # which is outside every gather block's range -> all-zero one-hot rows
    idxm = jnp.where(nbr_mask > 0, nbr_idx, Np).astype(jnp.int32)
    # per-(dst-tile, src-block) activity bitmap (the sentinel lands in
    # pseudo-block B and never activates a real block)
    blk = (idxm // SB).reshape(G, T, Tn * K)
    act = (
        (blk[..., None] == jnp.arange(B)[None, None, None, :])
        .any(axis=2)
        .astype(jnp.int32)
    )  # [G, T, B]

    s_feat = x[..., :S].astype(cdt)
    if V > 0:
        v = x[..., S:].reshape(G, Np, V, 3).astype(cdt)
        # concat (y | z | x) component planes: ONE gather matmul for all three
        v3 = jnp.concatenate([v[..., 0], v[..., 1], v[..., 2]], axis=-1)  # [G, Np, 3V]
        # group-expansion matrix for the SH factors: E96[c, c*V + j] = 1
        E96 = jnp.repeat(jnp.eye(3, dtype=f32), V, axis=1)  # [3, 3V]

    # split layer 2 per TP path so every kernel matmul output is lane-aligned
    # (see fused_conv.py); the o3/o4/o5 paths are column-tiled x3 to the
    # concat v-plane layout
    def w2slice(off, C):
        return w2[:, off : off + C].astype(cdt), b2[off : off + C].astype(f32)[None]

    w2s = [w2slice(0, S), w2slice(S, S)]
    if V > 0:
        for i in range(3):
            wk, bk = w2slice(2 * S + i * V, V)
            w2s.append((jnp.tile(wk, (1, 3)), jnp.tile(bk, (1, 3))))

    kernel = functools.partial(_kernel, Np=Np, Tn=Tn, SB=SB, K=K, S=S, V=V)

    # index maps take (*grid_ids, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — hence the trailing *_
    def full(shape):  # per-graph full array (same block for all dst tiles)
        return pl.BlockSpec(
            (1,) + shape, lambda g, t, *_: (g,) + (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def tile(shape):  # per-dst-tile block
        return pl.BlockSpec(
            (1, Tn) + shape, lambda g, t, *_: (g, t) + (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def shared(shape):  # weights
        return pl.BlockSpec(shape, lambda g, t, *_: (0,) * len(shape), memory_space=pltpu.VMEM)

    in_specs = (
        [full((Np, S))]
        + ([full((Np, 3 * V))] if V > 0 else [])
        + [
            tile((K, 4)),
            tile((K, attr_nbr.shape[-1])),
            tile((K,)),
            tile((K,)),
        ]
        + ([shared((3, 3 * V))] if V > 0 else [])
        + [shared((w1.shape[0], 64)), shared((1, 64))]
        + [spec for wk, bk in w2s for spec in (shared(wk.shape), shared(bk.shape))]
    )
    inputs = (
        [s_feat]
        + ([v3] if V > 0 else [])
        + [sh_nbr.astype(cdt), attr_nbr.astype(cdt), idxm, nbr_mask.astype(cdt)]
        + ([E96] if V > 0 else [])
        + [w1.astype(cdt), b1.astype(f32)[None]]
        + [a for wk, bk in w2s for a in (wk, bk)]
    )

    out_widths = (S, S, S, S) + ((3 * V, V, 3 * V) if V > 0 else ()) + (1,)
    out_shapes = tuple(jax.ShapeDtypeStruct((G, Np, C), f32) for C in out_widths)
    scratch = [pltpu.VMEM((Tn * K, S), f32)]
    if V > 0:
        scratch.append(pltpu.VMEM((Tn * K, 3 * V), f32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the [G*T*B] block-activity bitmap
        grid=(G, T),
        in_specs=in_specs,
        out_specs=tuple(tile(sh.shape[2:]) for sh in out_shapes),
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(act.reshape(-1), *inputs)

    if V > 0:
        o1, o2y, o2z, o2x, o3c, o4, o5c, deg = outs
    else:
        o1, o2y, o2z, o2x, deg = outs
    s1e = jnp.stack([o2y, o2z, o2x], axis=-1).reshape(G, Np, 3 * S)
    if V > 0:
        # concat (y|z|x) planes -> interleaved (mul, component) layout
        def interleave(c):  # [G, Np, 3V] -> [G, Np, 3V] (v0y v0z v0x v1y ...)
            return jnp.stack(
                [c[..., :V], c[..., V : 2 * V], c[..., 2 * V :]], axis=-1
            ).reshape(G, Np, 3 * V)

        packed = jnp.concatenate([o1, s1e, interleave(o3c), o4, interleave(o5c)], axis=-1)
    else:
        packed = jnp.concatenate([o1, s1e], axis=-1)
    if Np != N:
        packed, deg = packed[:, :N], deg[:, :N]
    return packed, deg[..., 0]


def _geom_kernel(
    act_ref,   # scalar-prefetch: [G*T*B] int32 block-activity bitmap
    pos_ref,   # [1, Np, 4]  (x, y, z, 0) full graph
    posd_ref,  # [1, Tn, 4]  dst tile (same array, tiled spec)
    idx_ref,   # [1, Tn, K]  int32, superset-mask folded (sentinel Np)
    sup_ref,   # [1, Tn, K]  superset mask
    scal_ref,  # [1, 4]      (radial_cutoff, 0, 0, 0)
    sh_ref,    # out [1, Tn, K, 4]   (pad, y, z, x) component-normalized sh1
    rad_ref,   # out [1, Tn, K, n_radial]
    mask_ref,  # out [1, Tn, K]      true-cutoff mask
    idxf_ref,  # out [1, Tn, K] int32, final-mask folded
    acc_p_ref,  # scratch [Tn*K, 4] f32
    *,
    Np: int,
    Tn: int,
    SB: int,
    K: int,
    n_radial: int,
):
    """Once-per-forward sparse edge features, replacing the XLA stage
    (`ops/neighbors.py::neighbor_edge_data`'s pos gather + sh + radial basis)
    whose [G, N, K] position row-gather dominates it (BENCH_NOTES round 5a).
    Same block-sparse one-hot gather as the conv kernel; geometry, SH and the
    gaussian radial basis (`soft_one_hot_linspace` cutoff=True semantics, see
    fused_conv.py) are computed in VMEM. Also emits the true-cutoff mask and
    the final-folded indices the per-layer kernels consume."""
    f32 = jnp.float32
    from jamun_tpu.ops.precision import matmul_precision

    prec = matmul_precision(f32)
    B = Np // SB
    idxm = idx_ref[0]  # [Tn, K]
    cutoff = scal_ref[0, 0]

    if B == 1:
        cols = jax.lax.broadcasted_iota(jnp.int32, (Tn, K, Np), 2)
        onehot = (idxm[:, :, None] == cols).astype(f32).reshape(Tn * K, Np)
        pos_g = jnp.dot(
            onehot, pos_ref[0].astype(f32), preferred_element_type=f32, precision=prec
        )
    else:
        acc_p_ref[...] = jnp.zeros(acc_p_ref.shape, acc_p_ref.dtype)
        cols_sb = jax.lax.broadcasted_iota(jnp.int32, (Tn, K, SB), 2)
        T = Np // Tn
        base = (pl.program_id(0) * T + pl.program_id(1)) * B
        for b in range(B):

            @pl.when(act_ref[base + b] > 0)
            def _(b=b):
                rel_i = idxm - b * SB
                oh = (rel_i[:, :, None] == cols_sb).astype(f32).reshape(Tn * K, SB)
                acc_p_ref[...] += jnp.dot(
                    oh,
                    pos_ref[0][b * SB : (b + 1) * SB, :].astype(f32),
                    preferred_element_type=f32,
                    precision=prec,
                )

        pos_g = acc_p_ref[...]

    pd = jnp.broadcast_to(posd_ref[0][:, None, :], (Tn, K, 4)).reshape(Tn * K, 4)
    rel = pos_g - pd  # [Tn*K, 4] in (x, y, z, 0); masked rows: -pd (feature-masked later)
    d2 = jnp.sum(rel * rel, axis=1, keepdims=True)  # [Tn*K, 1]
    dist = jnp.sqrt(d2 + 1e-12)
    inv = (math.sqrt(3.0)) / jnp.maximum(dist, 1e-12)
    shp = rel * inv  # (x, y, z, 0) scaled
    # reorder to the irreps component layout (pad, y, z, x)
    sh4 = jnp.concatenate(
        [shp[:, 3:4], shp[:, 1:2], shp[:, 2:3], shp[:, 0:1]], axis=1
    )
    sh_ref[0] = sh4.reshape(Tn, K, 4).astype(sh_ref.dtype)

    # gaussian radial basis, soft_one_hot_linspace(cutoff=True): centers
    # step*k (k=1..n), width step, normalized by 1/1.12 (see fused_conv.py)
    step = cutoff / (n_radial + 1)
    kb = jax.lax.broadcasted_iota(jnp.int32, (1, n_radial), 1).astype(f32) + 1.0
    centers = step * kb
    diff = (dist - centers) / step  # [Tn*K, n_radial]
    rad_ref[0] = (
        (jnp.exp(-(diff * diff)) * (1.0 / 1.12)).reshape(Tn, K, n_radial)
    ).astype(rad_ref.dtype)

    sup = sup_ref[0]  # [Tn, K]
    mfin = sup * (dist < cutoff).astype(sup.dtype).reshape(Tn, K)
    mask_ref[0] = mfin.astype(mask_ref.dtype)
    idxf_ref[0] = jnp.where(mfin > 0, idxm, Np).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_radial", "interpret", "compute_dtype"))
def nbr_edge_features(
    pos: jnp.ndarray,       # [G, N, 3]
    nbr_idx: jnp.ndarray,   # [G, N, K] int32 (cached superset list)
    sup_mask: jnp.ndarray,  # [G, N, K] superset mask
    radial_cutoff,          # scalar (true cutoff — the cache was built wider)
    n_radial: int = 32,
    interpret: bool = False,
    compute_dtype=None,
):
    """Returns (sh_nbr [G, N, K, 4], radial [G, N, K, n_radial],
    mask [G, N, K], idx_folded [G, N, K]) for the cached-neighbor kernel
    path. `radial` is the radial HALF of the edge attr — the constant
    bondedness block is folded into the radial MLP bias by the consumer
    (`Conv`), like the dense kernels fold bond0 (fused_conv.py)."""
    G, N, K = nbr_idx.shape
    f32 = jnp.float32
    cdt = compute_dtype or jnp.float32

    Tn = min(_TN_GEOM(), max(8, N))
    Np = ((N + Tn - 1) // Tn) * Tn
    if Np != N:
        padn = Np - N
        pos = jnp.pad(pos, ((0, 0), (0, padn), (0, 0)))
        nbr_idx = jnp.pad(nbr_idx, ((0, 0), (0, padn), (0, 0)))
        sup_mask = jnp.pad(sup_mask, ((0, 0), (0, padn), (0, 0)))
    SB = _SB if Np % _SB == 0 else Np
    B = Np // SB
    T = Np // Tn

    idxm = jnp.where(sup_mask > 0, nbr_idx, Np).astype(jnp.int32)
    blk = (idxm // SB).reshape(G, T, Tn * K)
    act = (
        (blk[..., None] == jnp.arange(B)[None, None, None, :]).any(axis=2).astype(jnp.int32)
    )
    pos4 = jnp.concatenate([pos.astype(f32), jnp.zeros((G, Np, 1), f32)], axis=-1)
    scal = jnp.broadcast_to(
        jnp.stack([jnp.asarray(radial_cutoff, f32), 0.0, 0.0, 0.0])[None], (1, 4)
    )

    kernel = functools.partial(
        _geom_kernel, Np=Np, Tn=Tn, SB=SB, K=K, n_radial=n_radial
    )

    def full(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda g, t, *_: (g,) + (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def tile(shape):
        return pl.BlockSpec(
            (1, Tn) + shape, lambda g, t, *_: (g, t) + (0,) * len(shape), memory_space=pltpu.VMEM
        )

    def shared(shape):
        return pl.BlockSpec(shape, lambda g, t, *_: (0,) * len(shape), memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((G, Np, K, 4), cdt),
        jax.ShapeDtypeStruct((G, Np, K, n_radial), cdt),
        jax.ShapeDtypeStruct((G, Np, K), f32),
        jax.ShapeDtypeStruct((G, Np, K), jnp.int32),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, T),
        in_specs=[full((Np, 4)), tile((4,)), tile((K,)), tile((K,)), shared((1, 4))],
        out_specs=(tile((K, 4)), tile((K, n_radial)), tile((K,)), tile((K,))),
        scratch_shapes=[pltpu.VMEM((Tn * K, 4), f32)],
    )
    sh, rad, mask, idxf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(act.reshape(-1), pos4, pos4, idxm, sup_mask.astype(f32), scal)
    if Np != N:
        sh, rad, mask, idxf = sh[:, :N], rad[:, :N], mask[:, :N], idxf[:, :N]
    return sh, rad, mask, idxf
