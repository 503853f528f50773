"""Can the narrow post-fold aggregation blocks be bundled at N=112?

Post o2-fold the dense-stream agg msgs at flagship widths are
[128, 32,32,32, 32,32,32, 32, 32,32,32, 1] rows. At N=112 bundling is gated
off because wide-lane sublane CONCATS send the Mosaic layout solver
pathological (round 3b). Each narrow [32, P] @ [P, 128] matmul pays ~half a
full 128-row MXU pipeline pass (measured round 3a), so ~7 narrow matmuls
waste ~2.5 passes. This measures three mechanisms on a stripped kernel:

  split   - 11 separate matmuls (today's N=112 scheme)
  scratch - bundle rows via sublane-slice stores into a VMEM scratch ref,
            then 4 matmuls total (dynamic_update_slice has no Pallas TPU
            lowering)
  concat  - jnp.concatenate bundles (the known-pathological baseline;
            run LAST, detached: compile may take 20+ min)

Run: python scripts/bench_bundle112.py [--variant split|scratch|concat]
     [--n 112] [--g 128] [--steps 30]
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


def _kernel(nf_ref, rad_ref, w1_ref, w2_ref, ei_ref, out_ref, scr_ref, *, N, variant):
    cdt = nf_ref.dtype
    prec = matmul_precision(cdt)
    P = N * N

    radial = rad_ref[0]  # [32, P]
    h32 = jnp.dot(w1_ref[...], radial, preferred_element_type=f32, precision=prec)
    h = (h32 * jax.nn.sigmoid(h32)).astype(cdt)
    w_all = jnp.dot(w2_ref[...], h, preferred_element_type=f32, precision=prec).astype(cdt)  # [352, P]
    nf = nf_ref[0]  # [128, N]
    sj = pltpu.repeat(nf, N, axis=1)  # [128, P]
    mod = jnp.tanh(radial[0:1]).astype(cdt)

    # post-fold block structure: one wide + ten narrow
    wide = (w_all[0:128] * sj) * mod                      # m1 [128, P]
    narrow = [
        (w_all[128 + 32 * i : 160 + 32 * i] * sj[0:32]) * mod for i in range(7)
    ] + [
        (w_all[128 + 32 * (i % 7) : 160 + 32 * (i % 7)] * sj[32:64]) * mod
        for i in range(3)
    ]  # 10 x [32, P]
    ei = ei_ref[...]  # [P, 128]

    def agg(m):
        return jnp.dot(m, ei, preferred_element_type=f32, precision=prec)

    out_ref[0, 3] = jnp.zeros((128, 128), f32)
    if variant == "split":
        out_ref[0, 0] = agg(wide)
        for i in range(10):
            o = agg(narrow[i])
            out_ref[0, 1 + (i // 4), 32 * (i % 4) : 32 * (i % 4) + 32] = o
    elif variant == "scratch":
        # bundle via sublane-slice stores into a VMEM scratch ref
        # (dynamic_update_slice has no Pallas TPU lowering; concat is the
        # known-pathological path). All 10 narrow blocks aggregated, same as
        # split: 4 + 4 bundled, the trailing 2 separate.
        out_ref[0, 0] = agg(wide)
        for b in range(2):
            for i in range(4):
                scr_ref[32 * i : 32 * i + 32] = narrow[4 * b + i]
            out_ref[0, 1 + b] = agg(scr_ref[...])
        out_ref[0, 3, 0:32] = agg(narrow[8])
        out_ref[0, 3, 32:64] = agg(narrow[9])
    else:  # concat
        b1 = jnp.concatenate(narrow[0:4], axis=0)
        b2 = jnp.concatenate(narrow[4:8], axis=0)
        out_ref[0, 0] = agg(wide)
        out_ref[0, 1] = agg(b1)
        out_ref[0, 2] = agg(b2)
        out_ref[0, 3, 0:32] = agg(narrow[8])
        out_ref[0, 3, 32:64] = agg(narrow[9])


def run_variant(variant, N, G, steps, cdt=jnp.bfloat16):
    P = N * N
    rng = np.random.default_rng(0)
    nf = jnp.asarray(rng.standard_normal((G, 128, N)), dtype=cdt)
    rad = jnp.asarray(rng.standard_normal((G, 32, P)) * 0.1, dtype=cdt)
    w1 = jnp.asarray(rng.standard_normal((64, 32)) * 0.1, dtype=cdt)
    w2 = jnp.asarray(rng.standard_normal((352, 64)) * 0.1, dtype=cdt)
    ei = np.zeros((P, 128), np.float32)
    for i in range(N):
        ei[i * N : (i + 1) * N, i] = 1.0
    ei = jnp.asarray(ei, dtype=cdt)

    kern = functools.partial(_kernel, N=N, variant=variant)
    gspec = lambda shape: pl.BlockSpec((1,) + shape, lambda g: (g,) + (0,) * len(shape))
    shared = lambda shape: pl.BlockSpec(shape, lambda g: (0,) * len(shape))

    def call(nf, rad):
        return pl.pallas_call(
            kern,
            grid=(G,),
            in_specs=[
                gspec((128, N)), gspec((32, P)),
                shared((64, 32)), shared((352, 64)), shared((P, 128)),
            ],
            out_specs=gspec((4, 128, 128)),
            out_shape=jax.ShapeDtypeStruct((G, 4, 128, 128), f32),
            interpret=jax.default_backend() not in ("tpu", "axon"),
            scratch_shapes=[pltpu.VMEM((128, P), cdt)],
            compiler_params=None
            if jax.default_backend() not in ("tpu", "axon")
            else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(nf, rad, w1, w2, ei)

    @jax.jit
    def chain(nf0):
        def body(_, carry):
            o = call(carry, rad)
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
        print(f"N={N} G={G} {variant:<7}: TIMING FAILED (tunnel early-ack artifact)",
              flush=True)
        return
    dt = dt / steps * 1e3
    out = chain(nf)
    print(
        f"N={N} G={G} {variant:<7}: {dt:7.3f} ms/call (compile {comp:.1f}s) "
        f"finite={bool(jnp.isfinite(out.astype(f32)).all())}",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=112)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--variant", default="split")
    args = ap.parse_args()

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    try:
        run_variant(args.variant, args.n, args.g, args.steps)
    except Exception as e:
        print(f"N={args.n} {args.variant}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
