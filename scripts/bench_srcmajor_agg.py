"""Ablation: src-major pair layout with 128-padded dst groups vs the one-hot
aggregation matmul (the dominant MXU term of the layer kernel at N=112 —
~65% per `bench_fused_ablation.py`).

Layouts (stripped kernels, representative data volumes, NOT correct model
numerics):

  matmul   dst-major, P = N^2 lanes. Gather = pltpu.repeat (tile); mean-agg
           = bundled [rows, P] @ one-hot [P, 128] matmuls. Today's scheme.
  tree_rep src-major, P' = N*128 lanes (each src's dst-block padded to one
           lane tile). Gather faked with repeat (timing lower bound for the
           layout; wrong pair order). Agg = log-depth halving adds over
           ALIGNED contiguous [rows, k*128] slices — pure VPU, no relayout,
           no loop-carried serialization (the round-3a "src-major slice-add"
           failure was a serialized per-src accumulator on unaligned slices).
  tree_mm  src-major + the REAL gather: stretch nf [C, N] -> [C, N*128]
           (column n broadcast to lanes n*128..n*128+127) via a one-hot
           stretch matmul (same trick the edge kernel uses for dst positions).
  tree_bc  src-major + broadcast-stretch: nf -> [C, N, 1] -> broadcast
           [C, N, 128] -> reshape [C, N*128] (relayout cost, no MXU).

All variants run the radial MLP (w1 [64,32] @ radial, w2 [352,64] @ h) on
their pair-lane count and build 6 message bundles of 128 rows, so the agg
change is measured in a realistic instruction context.

Run: python scripts/bench_srcmajor_agg.py [--n 112] [--g 128] [--steps 30]
     [--variant matmul|tree_rep|tree_mm|tree_bc|all]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jamun_tpu.ops.precision import matmul_precision

f32 = jnp.float32


def _tree_agg(m, N):
    """Sum over the N leading 128-lane groups of m [rows, N*128] -> [rows, 128].

    Halve while even (one big aligned add per level); finish an odd count
    with an explicit balanced tree of [rows, 128] slice adds (no concats —
    wide-lane concats are a known Mosaic layout-solver pathology). First add
    upcasts to f32 so accumulation precision matches the one-hot matmul's
    f32 accumulator."""
    n = N
    while n > 1 and n % 2 == 0:
        half = n // 2
        lo, hi = m[:, : half * 128], m[:, half * 128 : n * 128]
        if m.dtype != f32:
            lo, hi = lo.astype(f32), hi.astype(f32)
        m = lo + hi
        n = half
    if n == 1:
        return m.astype(f32)
    parts = [m[:, i * 128 : (i + 1) * 128].astype(f32) for i in range(n)]
    while len(parts) > 1:
        nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _kernel(nf_ref, rad_ref, w1_ref, w2_ref, st_ref, out_ref, *, N, variant):
    cdt = nf_ref.dtype
    prec = matmul_precision(cdt)
    srcmajor = variant != "matmul"
    P = N * 128 if srcmajor else N * N

    radial = rad_ref[0]  # [32, P]
    h32 = jnp.dot(w1_ref[...], radial, preferred_element_type=f32, precision=prec)
    h = (h32 * jax.nn.sigmoid(h32)).astype(cdt)
    w_all = jnp.dot(w2_ref[...], h, preferred_element_type=f32, precision=prec).astype(cdt)  # [352, P]

    nf = nf_ref[0]  # [128, N]
    if variant in ("matmul", "tree_rep"):
        reps = N if variant == "matmul" else 128
        sj = pltpu.repeat(nf, reps, axis=1)  # [128, P] (tree_rep: wrong order, timing only)
    elif variant == "tree_mm":
        # stretch via one-hot matmul: st [N, N*128], st[n, n*128+k] = 1
        sj = jnp.dot(nf, st_ref[...], preferred_element_type=f32, precision=prec).astype(cdt)
    else:  # tree_bc
        nfT = nf.reshape(128, N, 1)
        sj = jnp.broadcast_to(nfT, (128, N, 128)).reshape(128, N * 128).astype(cdt)

    # 6 message bundles of 128 rows each (2 VPU muls per element, like the
    # real kernel's w*sj*sh products); mod stays [1, P] so the broadcast is
    # fused into the product instead of materialized (VMEM)
    mod = jnp.tanh(radial[0:1]).astype(cdt)  # [1, P] stand-in for an sh row
    if srcmajor:
        for b in range(6):
            w = w_all[(b % 2) * 128 : (b % 2) * 128 + 128]
            msg = (w * sj) * mod
            out_ref[0, b] = _tree_agg(msg, N)
    else:
        # dst-major one-hot [P, 128] passed in (host-built; the real kernel
        # builds it via iota, but two [P, 128] int32 iota temporaries blow
        # the stripped kernel's VMEM budget at N=112)
        ei = st_ref[...]
        for b in range(6):
            w = w_all[(b % 2) * 128 : (b % 2) * 128 + 128]
            msg = (w * sj) * mod
            out_ref[0, b] = jnp.dot(msg, ei, preferred_element_type=f32, precision=prec)


def run_variant(variant, N, G, steps, cdt=jnp.bfloat16):
    P = N * 128 if variant != "matmul" else N * N
    rng = np.random.default_rng(0)
    nf = jnp.asarray(rng.standard_normal((G, 128, N)), dtype=cdt)
    rad = jnp.asarray(rng.standard_normal((G, 32, P)) * 0.1, dtype=cdt)
    w1 = jnp.asarray(rng.standard_normal((64, 32)) * 0.1, dtype=cdt)
    w2 = jnp.asarray(rng.standard_normal((352, 64)) * 0.1, dtype=cdt)
    if variant == "matmul":
        # dst-major agg one-hot: pair p = i*N + j -> dst i
        st = np.zeros((P, 128), np.float32)
        for i in range(N):
            st[i * N : (i + 1) * N, i] = 1.0
    else:
        # stretch one-hot: node n -> lanes n*128 .. n*128+127
        st = np.zeros((N, N * 128), np.float32)
        for n in range(N):
            st[n, n * 128 : (n + 1) * 128] = 1.0
    st = jnp.asarray(st, dtype=cdt)

    kern = functools.partial(_kernel, N=N, variant=variant)
    gspec = lambda shape: pl.BlockSpec((1,) + shape, lambda g: (g,) + (0,) * len(shape))
    shared = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape))

    def call(nf, rad):
        out = pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[
                gspec((128, N)), gspec((32, P)),
                shared((64, 32)), shared((352, 64)), shared(tuple(st.shape)),
            ],
            out_specs=gspec((6, 128, 128)),
            out_shape=jax.ShapeDtypeStruct((G, 6, 128, 128), f32),
            interpret=jax.default_backend() not in ("tpu", "axon"),
            compiler_params=None
            if jax.default_backend() not in ("tpu", "axon")
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(nf, rad, w1, w2, st)
        return out

    @jax.jit
    def chain(nf0):
        def body(_, carry):
            o = call(carry, rad)
            # fold outputs back into nf so iterations chain
            return (o.mean(axis=1)[:, :, :N] * 1e-3 + carry.astype(f32)).astype(cdt)

        return jax.lax.fori_loop(0, steps, body, nf0)

    from jamun_tpu.utils.timing import timed_chain

    def run():
        float(jnp.sum(chain(nf).astype(f32)))

    t0 = time.time()
    run()
    comp = time.time() - t0
    dt = timed_chain(run, steps)
    if dt is None:
        print(f"N={N} G={G} {variant:<9}: TIMING FAILED (tunnel early-ack artifact)",
              flush=True)
        return None
    dt = dt / steps * 1e3
    out = chain(nf)
    print(
        f"N={N} G={G} {variant:<9}: {dt:7.3f} ms/call (compile {comp:.1f}s) "
        f"finite={bool(jnp.isfinite(out.astype(f32)).all())}",
        flush=True,
    )
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=112)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--variant", default="all")
    args = ap.parse_args()

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    variants = (
        ["matmul", "tree_rep", "tree_mm", "tree_bc"]
        if args.variant == "all"
        else [args.variant]
    )
    for v in variants:
        try:
            run_variant(v, args.n, args.g, args.steps)
        except Exception as e:
            print(f"N={args.n} {v}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
