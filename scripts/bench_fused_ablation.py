"""Ablation of the gen-3 FUSED ConvBlock kernel at 5AA scale (N=112).

Stripped copies of `_layer_kernel`'s dense stream isolate which stage carries
the 5AA per-layer cost (the speedup-sag regime, VERDICT r2 #2):

  full      - dense stream + bond stream + fused block tail (production shape)
  noagg     - aggregation matmuls replaced by a [:, :N] slice (wrong numerics)
  novpu     - message products replaced by reusing sj (skips the TP VPU work)
  noradial  - radial MLP skipped (w_all = b2 broadcast)
  norepeat  - src gather skipped (sj/vj = zero-pad broadcast of nf; wrong)
  aggonly   - sj reused for every message AND radial skipped (agg + gather)

Timing rule (memory/tunnel): 30-iteration fori_loop, output feeds input.

Run: python scripts/bench_fused_ablation.py [--N 112] [--G 128] [--modes a,b]
"""

from __future__ import annotations

import argparse
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jamun_tpu.ops.precision import matmul_precision

_INV_SQRT3 = 1.0 / math.sqrt(3.0)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _pad16(c):
    return ((c + 15) // 16) * 16


def _kernel(nf_ref, ef_ref, w1_ref, b1_ref, w2_ref, b2_ref, pl0_ref, pl1_ref,
            lin20_ref, lin21_ref, sk0_ref, sk1_ref, out_ref, *,
            N, S, V, n_radial, K, mode):
    f32 = jnp.float32
    cdt = nf_ref.dtype
    P = N * N
    Sp, Vp = _pad16(S), _pad16(V)
    Sc, Gt, Vg = S, V, V
    Scp, Gtp, Vgp = _pad16(Sc), _pad16(Gt), _pad16(Vg)
    prec = matmul_precision(cdt)
    offt = jax.lax.broadcasted_iota(jnp.int32, (P, N), 0) - jax.lax.broadcasted_iota(
        jnp.int32, (P, N), 1
    ) * N
    ei = ((offt >= 0) & (offt < N)).astype(cdt)

    for k in range(K):
        shy = ef_ref[k][0:1]
        shz = ef_ref[k][1:2]
        shx = ef_ref[k][2:3]
        adj = ef_ref[k][3:4]
        radial = ef_ref[k][4 : 4 + n_radial]
        if mode in ("noradial", "aggonly"):
            w_all = jnp.broadcast_to(b2_ref[...], (b2_ref.shape[0], P)).astype(cdt)
        else:
            h32 = jnp.dot(w1_ref[...], radial, preferred_element_type=f32, precision=prec) + b1_ref[...]
            h = (h32 * jax.nn.sigmoid(h32)).astype(cdt)
            w_all = (jnp.dot(w2_ref[...], h, preferred_element_type=f32, precision=prec) + b2_ref[...]).astype(cdt)

        def agg(msg):
            if mode == "noagg":
                return msg[:, 0:N].astype(f32)
            return jnp.dot(msg, ei, preferred_element_type=f32, precision=prec)

        adjS = jnp.broadcast_to(adj, (Sp, P))
        if mode == "norepeat":
            sj = jnp.concatenate(
                [nf_ref[k][0:Sp]] + [jnp.zeros((Sp, P - N), cdt)], axis=1
            ) * adjS
        else:
            sj = pltpu.repeat(nf_ref[k][0:Sp], N, axis=1) * adjS
        w1p = w_all[0:Sp]
        w2p = w_all[Sp : 2 * Sp]
        if mode in ("novpu", "aggonly"):
            blocks = [agg(sj), agg(sj), agg(sj), agg(sj)]
        else:
            m1 = w1p * sj
            t2 = w2p * sj
            shyS = jnp.broadcast_to(shy, (Sp, P))
            shzS = jnp.broadcast_to(shz, (Sp, P))
            shxS = jnp.broadcast_to(shx, (Sp, P))
            blocks = [agg(m1), agg(t2 * shyS), agg(t2 * shzS), agg(t2 * shxS)]
        if mode == "norepeat":
            vj = jnp.concatenate(
                [nf_ref[k][Sp : Sp + 3 * Vp]] + [jnp.zeros((3 * Vp, P - N), cdt)], axis=1
            )
        else:
            vj = pltpu.repeat(nf_ref[k][Sp : Sp + 3 * Vp], N, axis=1)
        vj = vj * jnp.broadcast_to(adj, (3 * Vp, P))
        vy, vz, vx = vj[0:Vp], vj[Vp : 2 * Vp], vj[2 * Vp : 3 * Vp]
        if mode in ("novpu", "aggonly"):
            blocks += [agg(vy), agg(vz), agg(vx), agg(vy), agg(vy), agg(vz), agg(vx)]
        else:
            w3p = w_all[2 * Sp : 2 * Sp + Vp]
            w4p = w_all[2 * Sp + Vp : 2 * Sp + 2 * Vp]
            w5p = w_all[2 * Sp + 2 * Vp : 2 * Sp + 3 * Vp]
            sy = jnp.broadcast_to(shy, (Vp, P))
            sz = jnp.broadcast_to(shz, (Vp, P))
            sx = jnp.broadcast_to(shx, (Vp, P))
            dotv = vy * sy + vz * sz + vx * sx
            blocks += [
                agg(w3p * vy), agg(w3p * vz), agg(w3p * vx),
                agg(w4p * dotv * _INV_SQRT3),
                agg(w5p * (vz * sx - vx * sz) * _INV_SQRT2),
                agg(w5p * (vx * sy - vy * sx) * _INV_SQRT2),
                agg(w5p * (vy * sz - vz * sy) * _INV_SQRT2),
            ]
        if mode == "concatagg":
            # one tall aggregation matmul instead of 11 + deg: kills M-dim
            # rounding waste on the 32-row vector blocks
            tall = jnp.concatenate(
                [m1, t2 * shyS, t2 * shzS, t2 * shxS,
                 w3p * vy, w3p * vz, w3p * vx,
                 w4p * dotv * _INV_SQRT3,
                 w5p * (vz * sx - vx * sz) * _INV_SQRT2,
                 w5p * (vx * sy - vy * sx) * _INV_SQRT2,
                 w5p * (vy * sz - vz * sy) * _INV_SQRT2,
                 jnp.broadcast_to(adj, (16, P))], axis=0)
            res = jnp.dot(tall, ei, preferred_element_type=f32, precision=prec)
            off = 0
            blocks = []
            for rows in (Sp, Sp, Sp, Sp, Vp, Vp, Vp, Vp, Vp, Vp, Vp):
                blocks.append(res[off : off + rows])
                off += rows
            deg = res[off : off + 1]
        else:
            deg = agg(adj)
        inv_deg = 1.0 / jnp.maximum(deg, 1.0)
        norm = [(b * inv_deg).astype(cdt) for b in blocks]
        o1n, o2y, o2z, o2x, o3y, o3z, o3x, o4n, o5y, o5z, o5x = norm
        in0 = jnp.concatenate([o1n, o4n], axis=0)
        in1 = [jnp.concatenate([a, b, c], axis=0)
               for a, b, c in ((o2y, o3y, o5y), (o2z, o3z, o5z), (o2x, o3x, o5x))]
        conv0 = jnp.dot(pl0_ref[...], in0, preferred_element_type=f32, precision=prec)
        conv1 = [jnp.dot(pl1_ref[...], in1[c], preferred_element_type=f32, precision=prec)
                 for c in range(3)]
        scal = jax.nn.leaky_relu(conv0[0:Scp], 0.01).astype(cdt)
        gates = jax.nn.sigmoid(conv0[Scp : Scp + Gtp])
        gated = [(conv1[c] * gates[0:Vgp]).astype(cdt) for c in range(3)]
        out0 = jnp.dot(lin20_ref[...], scal, preferred_element_type=f32, precision=prec)
        out0 = out0 + jnp.dot(sk0_ref[...], nf_ref[k][0:Sp], preferred_element_type=f32, precision=prec)
        out_ref[k, 0:Scp] = out0
        for c in range(3):
            o1 = jnp.dot(lin21_ref[...], gated[c], preferred_element_type=f32, precision=prec)
            o1 = o1 + jnp.dot(sk1_ref[...], nf_ref[k][Sp + c * Vp : Sp + (c + 1) * Vp],
                              preferred_element_type=f32, precision=prec)
            out_ref[k, Scp + c * Vgp : Scp + (c + 1) * Vgp] = o1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=112)
    ap.add_argument("--G", type=int, default=128)
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--modes", type=str, default="full,noagg,novpu,noradial,aggonly")
    args = ap.parse_args()

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()

    G, N, K = args.G, args.N, args.K
    S, V, n_radial = 120, 32, 32
    Sp, Vp = _pad16(S), _pad16(V)
    Fp = Sp + 3 * Vp
    P = N * N
    EFR = 4 + n_radial
    cdt = jnp.bfloat16
    Scp, Vgp = _pad16(S), _pad16(V)
    Wp = 2 * Sp + 3 * Vp
    In0p, In1p = Sp + Vp, Sp + 2 * Vp
    rng = np.random.default_rng(0)
    sn = lambda *s: jnp.asarray((rng.standard_normal(s) * 0.1).astype(np.float32))

    nf = sn(G, Fp, N).astype(cdt)
    ef = sn(G, EFR, P).astype(cdt)
    w1 = sn(64, n_radial).astype(cdt)
    b1 = sn(64, 1)
    w2 = sn(Wp, 64).astype(cdt)
    b2 = sn(Wp, 1)
    pl0 = sn(Scp + _pad16(V), In0p).astype(cdt)
    pl1 = sn(Vgp, In1p).astype(cdt)
    lin20 = sn(Scp, Scp).astype(cdt)
    lin21 = sn(Vgp, Vgp).astype(cdt)
    sk0 = sn(Scp, Sp).astype(cdt)
    sk1 = sn(Vgp, Vp).astype(cdt)

    for mode in args.modes.split(","):
        kern = functools.partial(_kernel, N=N, S=S, V=V, n_radial=n_radial, K=K, mode=mode)
        grid = (G // K,)
        fn = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((K, Fp, N), lambda g: (g, 0, 0)),
                pl.BlockSpec((K, EFR, P), lambda g: (g, 0, 0)),
            ] + [pl.BlockSpec(w.shape, lambda g: (0,) * w.ndim) for w in
                 (w1, b1, w2, b2, pl0, pl1, lin20, lin21, sk0, sk1)],
            out_specs=pl.BlockSpec((K, Scp + 3 * Vgp, N), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, Scp + 3 * Vgp, N), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )

        @jax.jit
        def chain(nf, ef):
            def body(_, x):
                o = fn(x, ef, w1, b1, w2, b2, pl0, pl1, lin20, lin21, sk0, sk1)
                return o[:, 0:Fp, :].astype(cdt)
            return jax.lax.fori_loop(0, args.steps, body, nf)

        t0 = time.time()
        out = chain(nf, ef)
        out.block_until_ready()
        c = time.time() - t0
        t0 = time.time()
        out = chain(nf, ef)
        out.block_until_ready()
        dt = (time.time() - t0) / args.steps * 1e3
        print(f"{mode:>10}: {dt:7.3f} ms/call  (compile {c:.1f}s)  "
              f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}", flush=True)


if __name__ == "__main__":
    main()
