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

from jamun_tpu.utils.timing import timed_chain
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


def _kernel_srcmajor(nf_ref, ef_ref, w1_ref, b1_ref, w2_ref, b2_ref, pl0_ref,
                     pl1_ref, lin20_ref, lin21_ref, sk0_ref, sk1_ref, out_ref, *,
                     N, S, V, n_radial, K):
    """Src-major chunked layout: pairs p = src*128 + dst (dst padded to 128).

    The src-feature multiply AND the aggregation fuse into one unrolled loop
    of lane-broadcast FMAs over src chunks -- no one-hot aggregation matmuls,
    no sj/vj materialization. ef is [EFR, N*128] in src-major order.
    """
    f32 = jnp.float32
    cdt = nf_ref.dtype
    C = 128  # dst chunk width (lane tile)
    P2 = N * C
    Sp, Vp = _pad16(S), _pad16(V)
    Scp, Gtp, Vgp = _pad16(S), _pad16(V), _pad16(V)
    prec = matmul_precision(cdt)

    for k in range(K):
        shy = ef_ref[k][0:1]
        shz = ef_ref[k][1:2]
        shx = ef_ref[k][2:3]
        adj = ef_ref[k][3:4]
        radial = ef_ref[k][4 : 4 + n_radial]
        h32 = jnp.dot(w1_ref[...], radial, preferred_element_type=f32, precision=prec) + b1_ref[...]
        h = (h32 * jax.nn.sigmoid(h32)).astype(cdt)
        w_all = (jnp.dot(w2_ref[...], h, preferred_element_type=f32, precision=prec) + b2_ref[...]).astype(cdt)
        w_all = w_all * jnp.broadcast_to(adj, w_all.shape)  # fold the pair mask

        w1p = w_all[0:Sp]
        w2p = w_all[Sp : 2 * Sp]
        w3p = w_all[2 * Sp : 2 * Sp + Vp]
        w4p = w_all[2 * Sp + Vp : 2 * Sp + 2 * Vp]
        w5p = w_all[2 * Sp + 2 * Vp : 2 * Sp + 3 * Vp]
        shyS = jnp.broadcast_to(shy, (Sp, P2))
        shzS = jnp.broadcast_to(shz, (Sp, P2))
        shxS = jnp.broadcast_to(shx, (Sp, P2))
        shyV = shyS[0:Vp]
        shzV = shzS[0:Vp]
        shxV = shxS[0:Vp]
        w4y = w4p * shyV * _INV_SQRT3
        w4z = w4p * shzV * _INV_SQRT3
        w4x = w4p * shxV * _INV_SQRT3
        w5y = w5p * shyV * _INV_SQRT2
        w5z = w5p * shzV * _INV_SQRT2
        w5x = w5p * shxV * _INV_SQRT2
        # expanded weight-side product rows; acc row r aggregates
        # sum_s msgs[r, s*128+d] * xstack[r, s]
        msgs = jnp.concatenate(
            [w1p, w2p * shyS, w2p * shzS, w2p * shxS,       # 4*Sp
             w3p, w3p, w3p,                                  # x vy, vz, vx
             w4y, w4z, w4x,                                  # dotv terms
             w5x, w5z,                                       # o5y = w5x*vz - w5z*vx
             w5y, w5x,                                       # o5z = w5y*vx - w5x*vy
             w5z, w5y,                                       # o5x = w5z*vy - w5y*vz
             jnp.broadcast_to(adj, (8, P2))], axis=0)        # degree rows
        sN = nf_ref[k][0:Sp]
        vyN = nf_ref[k][Sp : Sp + Vp]
        vzN = nf_ref[k][Sp + Vp : Sp + 2 * Vp]
        vxN = nf_ref[k][Sp + 2 * Vp : Sp + 3 * Vp]
        ones = jnp.ones((8, N), cdt)
        xstack = jnp.concatenate(
            [sN, sN, sN, sN,
             vyN, vzN, vxN,
             vyN, vzN, vxN,
             vzN, vxN,
             vxN, vyN,
             vyN, vzN,
             ones], axis=0)
        rows = 4 * Sp + 12 * Vp + 8

        # 8 independent accumulators break the loop-carried dependency chain
        # (a single-acc version measured SLOWER than the one-hot agg matmuls:
        # 4.48 vs 4.17 ms/call at N=112 — VPU serialization, not throughput)
        NACC = 8
        accs = [jnp.zeros((rows, C), f32) for _ in range(NACC)]
        for s in range(N):
            accs[s % NACC] = accs[s % NACC] + (
                msgs[:, s * C : (s + 1) * C] * xstack[:, s : s + 1]
            ).astype(f32)
        while len(accs) > 1:
            accs = [a + b for a, b in zip(accs[0::2], accs[1::2])]
        acc = accs[0]

        o1n = acc[0:Sp]
        o2y = acc[Sp : 2 * Sp]
        o2z = acc[2 * Sp : 3 * Sp]
        o2x = acc[3 * Sp : 4 * Sp]
        b0 = 4 * Sp
        o3y = acc[b0 : b0 + Vp]
        o3z = acc[b0 + Vp : b0 + 2 * Vp]
        o3x = acc[b0 + 2 * Vp : b0 + 3 * Vp]
        o4n = acc[b0 + 3 * Vp : b0 + 4 * Vp] + acc[b0 + 4 * Vp : b0 + 5 * Vp] + acc[b0 + 5 * Vp : b0 + 6 * Vp]
        o5y = acc[b0 + 6 * Vp : b0 + 7 * Vp] - acc[b0 + 7 * Vp : b0 + 8 * Vp]
        o5z = acc[b0 + 8 * Vp : b0 + 9 * Vp] - acc[b0 + 9 * Vp : b0 + 10 * Vp]
        o5x = acc[b0 + 10 * Vp : b0 + 11 * Vp] - acc[b0 + 11 * Vp : b0 + 12 * Vp]
        deg = acc[b0 + 12 * Vp : b0 + 12 * Vp + 1]

        inv_deg = 1.0 / jnp.maximum(deg, 1.0)
        norm = [(b * inv_deg).astype(cdt)
                for b in (o1n, o2y, o2z, o2x, o3y, o3z, o3x, o4n, o5y, o5z, o5x)]
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
        nfp = jnp.concatenate(
            [nf_ref[k][...], jnp.zeros((nf_ref.shape[1], C - N), cdt)], axis=1)
        out0 = jnp.dot(lin20_ref[...], scal, preferred_element_type=f32, precision=prec)
        out0 = out0 + jnp.dot(sk0_ref[...], nfp[0:Sp], preferred_element_type=f32, precision=prec)
        out_ref[k, 0:Scp] = out0
        for c in range(3):
            o1 = jnp.dot(lin21_ref[...], gated[c], preferred_element_type=f32, precision=prec)
            o1 = o1 + jnp.dot(sk1_ref[...], nfp[Sp + c * Vp : Sp + (c + 1) * Vp],
                              preferred_element_type=f32, precision=prec)
            out_ref[k, Scp + c * Vgp : Scp + (c + 1) * Vgp] = o1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=112)
    ap.add_argument("--G", type=int, default=128)
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--modes", type=str, default="full,noagg,novpu,noradial,aggonly")
    ap.add_argument("--parity", action="store_true",
                    help="interpret-mode numerical check: srcmajor vs full")
    args = ap.parse_args()

    if args.parity:
        # interpret-mode check runs on CPU; never touch the TPU client
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    else:
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

    # src-major edge features are the dst-major ones with the pair index
    # permuted (p_sm = src*128 + dst <- p = dst*N + src), dst padded to 128
    ef_np = np.asarray(ef.astype(jnp.float32)).reshape(G, EFR, N, N)  # [.., dst, src]
    ef_sm_np = np.zeros((G, EFR, N, 128), np.float32)
    ef_sm_np[:, :, :, 0:N] = np.swapaxes(ef_np, 2, 3)  # [.., src, dst]
    ef_sm = jnp.asarray(ef_sm_np.reshape(G, EFR, N * 128)).astype(cdt)

    def build(mode, interpret=False):
        grid = (G // K,)
        if mode == "srcmajor":
            kern = functools.partial(_kernel_srcmajor, N=N, S=S, V=V, n_radial=n_radial, K=K)
            NL, ef_in, P_in = 128, ef_sm, N * 128
        else:
            kern = functools.partial(_kernel, N=N, S=S, V=V, n_radial=n_radial, K=K, mode=mode)
            NL, ef_in, P_in = N, ef, P
        fn = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((K, Fp, N), lambda g: (g, 0, 0)),
                pl.BlockSpec((K, EFR, P_in), lambda g: (g, 0, 0)),
            ] + [pl.BlockSpec(w.shape, lambda g: (0,) * w.ndim) for w in
                 (w1, b1, w2, b2, pl0, pl1, lin20, lin21, sk0, sk1)],
            out_specs=pl.BlockSpec((K, Scp + 3 * Vgp, NL), lambda g: (g, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, Scp + 3 * Vgp, NL), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )
        return fn, ef_in

    if args.parity:
        outs = {}
        for mode in ("full", "srcmajor"):
            fn, ef_in = build(mode, interpret=True)
            o = fn(nf, ef_in, w1, b1, w2, b2, pl0, pl1, lin20, lin21, sk0, sk1)
            outs[mode] = np.asarray(o)[:, :, 0:N]
        err = np.max(np.abs(outs["srcmajor"] - outs["full"]))
        rel = err / (np.max(np.abs(outs["full"])) + 1e-12)
        print(f"parity srcmajor vs full: max abs {err:.3e}  rel {rel:.3e}")
        assert rel < 2e-2, "srcmajor does not match full"
        return

    for mode in args.modes.split(","):
        fn, ef_in = build(mode)

        @jax.jit
        def chain(nf, ef):
            def body(_, x):
                o = fn(x, ef, w1, b1, w2, b2, pl0, pl1, lin20, lin21, sk0, sk1)
                return o[:, 0:Fp, 0:N].astype(cdt)
            return jax.lax.fori_loop(0, args.steps, body, nf)

        # tunnel-proof sync via scalar value fetch (utils/timing.py)
        def run():
            return float(jnp.sum(chain(nf, ef_in).astype(jnp.float32)))

        t0 = time.time()
        run()
        c = time.time() - t0
        el = timed_chain(run, args.steps)
        if el is None:
            print(f"{mode:>10}: TIMING FAILED (tunnel early-ack artifact)",
                  flush=True)
            continue
        dt = el / args.steps * 1e3
        out = chain(nf, ef_in)
        print(f"{mode:>10}: {dt:7.3f} ms/call  (compile {c:.1f}s)  "
              f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}", flush=True)


if __name__ == "__main__":
    main()
