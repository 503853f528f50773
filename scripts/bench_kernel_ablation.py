"""Ablation of the lane-packed conv kernel: which stage costs what.

Each variant is a stripped copy of the packed kernel, timed inside a
50-iteration fori_loop (the only trustworthy timing through the tunnel —
standalone dispatch timings do not reflect device time).

Variants:
  full      - the real kernel (all 11 paths + aggregations)
  o1only    - geometry + radial MLP + one path matmul + one msg + one agg
  noagg     - all messages computed, aggregation matmuls replaced by row slice
  notile    - src features NOT tiled (single row broadcast; wrong numerics)
  nopaths   - path matmuls replaced by bias broadcast (radial MLP still runs)
  geom      - geometry + radial basis + radial MLP only
"""

from __future__ import annotations

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jamun_tpu.ops.precision import matmul_precision

_SQRT3 = math.sqrt(3.0)
_INV_SQRT3 = 1.0 / math.sqrt(3.0)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _kernel(*refs, N, S, V, n_radial, mode):
    (
        pos_ref, mask_ref, s_ref, vy_ref, vz_ref, vx_ref,
        w1_ref, b1_ref,
        w2o1_ref, b2o1_ref, w2o2_ref, b2o2_ref, w2o3_ref, b2o3_ref,
        w2o4_ref, b2o4_ref, w2o5_ref, b2o5_ref, scal_ref,
        out_s_ref, out_sy_ref, out_sz_ref, out_sx_ref,
        out_v3y_ref, out_v3z_ref, out_v3x_ref, out_v0_ref,
        out_v5y_ref, out_v5z_ref, out_v5x_ref, deg_ref,
    ) = refs

    f32 = jnp.float32
    cdt = s_ref.dtype
    P = N * N
    cutoff = scal_ref[0, 0]
    if mode == "dmaonly":
        # pure grid + DMA overhead: trivially touch each input, write outputs
        out_s_ref[0] = s_ref[0][:N].astype(f32) + pos_ref[0][:, :1] + mask_ref[0]
        for r in (out_sy_ref, out_sz_ref, out_sx_ref):
            r[0] = s_ref[0][:N].astype(f32)
        for r, src in (
            (out_v3y_ref, vy_ref), (out_v3z_ref, vz_ref), (out_v3x_ref, vx_ref),
            (out_v0_ref, vy_ref), (out_v5y_ref, vy_ref), (out_v5z_ref, vz_ref),
            (out_v5x_ref, vx_ref),
        ):
            r[0] = src[0][:N].astype(f32)
        deg_ref[0] = (
            w1_ref[0, :1].astype(f32) + b1_ref[0, :1] + w2o1_ref[0, :1].astype(f32)
            + b2o1_ref[0, :1] + w2o2_ref[0, :1].astype(f32) + b2o2_ref[0, :1]
            + w2o3_ref[0, :1].astype(f32) + b2o3_ref[0, :1]
            + w2o4_ref[0, :1].astype(f32) + b2o4_ref[0, :1]
            + w2o5_ref[0, :1].astype(f32) + b2o5_ref[0, :1] + scal_ref[0, :1]
        )[None, :] * jnp.ones((N, 1), f32)
        return

    pos = pos_ref[0]
    mask = mask_ref[0, :, 0]
    px, py, pz = pos[:, 0], pos[:, 1], pos[:, 2]
    rx = px[None, :] - px[:, None]
    ry = py[None, :] - py[:, None]
    rz = pz[None, :] - pz[:, None]
    d2 = rx * rx + ry * ry + rz * rz
    dist = jnp.sqrt(d2 + 1e-12)
    eye = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (N, N), 1
    )
    adj = ((dist < cutoff) & (~eye) & (mask[:, None] > 0) & (mask[None, :] > 0)).astype(f32)
    inv_d = 1.0 / jnp.maximum(dist, 1e-12)
    dflat = dist.reshape(P, 1)
    adjf = adj.reshape(P, 1).astype(cdt)
    shy = (_SQRT3 * ry * inv_d).reshape(P, 1).astype(cdt)
    shz = (_SQRT3 * rz * inv_d).reshape(P, 1).astype(cdt)
    shx = (_SQRT3 * rx * inv_d).reshape(P, 1).astype(cdt)

    step = cutoff / (n_radial + 1)
    kb = jax.lax.broadcasted_iota(jnp.int32, (1, n_radial), 1).astype(f32) + 1.0
    centers = step * kb
    diff = (dflat - centers) / step
    radial = (jnp.exp(-(diff * diff)) * (1.0 / 1.12)).astype(cdt)

    prec = matmul_precision(cdt)
    h32 = (
        jnp.dot(radial, w1_ref[...], preferred_element_type=f32, precision=prec)
        + b1_ref[0][None, :].astype(f32)
    )
    h = (h32 * jax.nn.sigmoid(h32)).astype(cdt)

    if mode == "geom":
        # keep h + sh/adj alive via cheap writes (no matmuls)
        keep = (h[:N, :] + shy[:N] + shz[:N] + shx[:N] + adjf[:N]).astype(f32)  # [N, 64]
        out_s_ref[0] = jnp.concatenate([keep, jnp.zeros((N, S - 64), f32)], axis=1)
        for r in (out_sy_ref, out_sz_ref, out_sx_ref):
            r[0] = jnp.zeros((N, S), f32)
        for r in (out_v3y_ref, out_v3z_ref, out_v3x_ref, out_v0_ref, out_v5y_ref, out_v5z_ref, out_v5x_ref):
            r[0] = jnp.zeros((N, V), f32)
        deg_ref[0] = jnp.zeros((N, 1), f32)
        return

    rown = jax.lax.broadcasted_iota(jnp.int32, (N, P), 0)
    colp = jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
    off = colp - rown * N
    eit = ((off >= 0) & (off < N)).astype(cdt)

    def path_w(wk_ref, bk_ref, C):
        if mode == "nopaths":
            return jnp.broadcast_to(bk_ref[0][None, :].astype(cdt), (P, C)) * h[:, :1]
        wk = (
            jnp.dot(h, wk_ref[...], preferred_element_type=f32, precision=prec)
            + bk_ref[0][None, :].astype(f32)
        )
        return wk.astype(cdt)

    def tile_src(a):
        if mode == "notile":
            return jnp.broadcast_to(a[:1, :], (P, a.shape[1]))
        return jnp.concatenate([a] * N, axis=0)

    def agg(msg, out_ref):
        if mode == "noagg":
            out_ref[0] = msg[:N, :].astype(f32)
        else:
            out_ref[0] = jnp.dot(eit, msg, preferred_element_type=f32, precision=prec).astype(f32)

    w1p = path_w(w2o1_ref, b2o1_ref, S)
    sj = tile_src(s_ref[0]) * adjf
    agg(w1p * sj, out_s_ref)

    if mode == "o1only":
        for r in (out_sy_ref, out_sz_ref, out_sx_ref):
            r[0] = jnp.zeros((N, S), f32)
        for r in (out_v3y_ref, out_v3z_ref, out_v3x_ref, out_v0_ref, out_v5y_ref, out_v5z_ref, out_v5x_ref):
            r[0] = jnp.zeros((N, V), f32)
        deg_ref[0] = jnp.zeros((N, 1), f32)
        return

    w2p = path_w(w2o2_ref, b2o2_ref, S)
    t2 = w2p * sj
    agg(t2 * shy, out_sy_ref)
    agg(t2 * shz, out_sz_ref)
    agg(t2 * shx, out_sx_ref)

    w3p = path_w(w2o3_ref, b2o3_ref, V)
    w4p = path_w(w2o4_ref, b2o4_ref, V)
    w5p = path_w(w2o5_ref, b2o5_ref, V)
    vyj = tile_src(vy_ref[0]) * adjf
    vzj = tile_src(vz_ref[0]) * adjf
    vxj = tile_src(vx_ref[0]) * adjf
    agg(w3p * vyj, out_v3y_ref)
    agg(w3p * vzj, out_v3z_ref)
    agg(w3p * vxj, out_v3x_ref)
    dotv = vyj * shy + vzj * shz + vxj * shx
    agg(w4p * dotv * _INV_SQRT3, out_v0_ref)
    agg(w5p * (vzj * shx - vxj * shz) * _INV_SQRT2, out_v5y_ref)
    agg(w5p * (vxj * shy - vyj * shx) * _INV_SQRT2, out_v5z_ref)
    agg(w5p * (vyj * shz - vzj * shy) * _INV_SQRT2, out_v5x_ref)
    deg_ref[0] = jnp.dot(eit, adjf, preferred_element_type=f32, precision=prec).astype(f32)


@functools.partial(jax.jit, static_argnames=("S", "V", "n_radial", "mode"))
def variant(pos, node_mask, x, w1, b1, w2, b2, bond0, cutoff, S, V, n_radial=32, mode="full"):
    G, N, _ = pos.shape
    f32 = jnp.float32
    cdt = jnp.bfloat16
    s_feat = x[..., :S].astype(cdt)
    v = x[..., S:].reshape(G, N, V, 3).astype(cdt)
    pos_pad = jnp.concatenate([pos.astype(f32), jnp.zeros((G, N, 1), f32)], axis=-1)
    maskf = node_mask.astype(f32)[..., None]
    scalars = jnp.broadcast_to(jnp.asarray([cutoff, 0.0, 0.0, 0.0], f32)[None], (1, 4))
    nb = w1.shape[0] - n_radial
    b1_eff = b1 + bond0 @ w1[:nb]
    w1r = w1[nb:].astype(cdt)
    w2s = []
    off = 0
    for C in (S, S, V, V, V):
        w2s.append((w2[:, off : off + C].astype(cdt), b2[off : off + C].astype(f32)[None]))
        off += C
    kernel = functools.partial(_kernel, N=N, S=S, V=V, n_radial=n_radial, mode=mode)

    def gspec(shape):
        return pl.BlockSpec((1,) + shape, lambda g: (g,) + (0,) * len(shape), memory_space=pltpu.VMEM)

    def shared(shape):
        return pl.BlockSpec(shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)

    out_dims = (S, S, S, S, V, V, V, V, V, V, V, 1)
    out_shapes = tuple(jax.ShapeDtypeStruct((G, N, C), f32) for C in out_dims)
    in_arrays = [pos_pad, maskf, s_feat, v[..., 0], v[..., 1], v[..., 2], w1r, b1_eff[None]]
    in_specs = [gspec((N, 4)), gspec((N, 1)), gspec((N, S))] + [gspec((N, V))] * 3 + [
        shared((n_radial, 64)), shared((1, 64))]
    for wk, bk in w2s:
        in_arrays += [wk, bk]
        in_specs += [shared(wk.shape), shared(bk.shape)]
    in_arrays.append(scalars)
    in_specs.append(shared((1, 4)))
    outs = pl.pallas_call(
        kernel, grid=(G,), in_specs=in_specs,
        out_specs=tuple(gspec(sh.shape[1:]) for sh in out_shapes), out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(*in_arrays)
    return outs[0], outs[-1]


def main():
    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    G, N, S, V, nr = 128, 48, 120, 32, 32
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((G, N, 3)).astype(np.float32)) * 0.35
    mask = jnp.asarray(rng.random((G, N)) > 0.05)
    x = jnp.asarray(rng.standard_normal((G, N, S + 3 * V)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((64, 2 * S + 3 * V)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal(2 * S + 3 * V).astype(np.float32) * 0.1)
    bond0 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    cutoff = jnp.asarray(0.9)

    for mode in ("dmaonly", "geom"):
        fn = functools.partial(variant, S=S, V=V, n_radial=nr, mode=mode)

        @jax.jit
        def loop(xx, fn=fn):
            def body(_, acc):
                out, deg = fn(pos, mask, acc, w1, b1, w2, b2, bond0, cutoff)
                return acc.at[..., :S].add(out[..., :S].astype(acc.dtype) * 1e-4)

            return jax.lax.fori_loop(0, 50, body, xx)

        t0 = time.perf_counter()
        jax.block_until_ready(loop(x))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x))
        t = time.perf_counter() - t0
        print(f"{mode:8s}: compile {c:6.1f}s  {t*1e3/50:7.3f} ms/iter  ({t*1e6/50/G:6.2f} us/graph)", flush=True)


if __name__ == "__main__":
    main()
