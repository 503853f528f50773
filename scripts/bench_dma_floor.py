"""Measure the pallas per-program overhead floor vs buffer count / K.

Variants (all trivial compute — copies only):
  split-k1   : 31 buffers per program, K=1 (the current kernel's layout)
  combined-k1: 4 buffers per program (inputs packed into 3, outputs into 1), K=1
  combined-k4/k8: combined buffers, K graphs per program
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def split_kernel(*refs):
    ins = refs[:19]
    outs = refs[19:]
    f32 = jnp.float32
    N = ins[0].shape[1]
    for i, r in enumerate(outs[:-1]):
        C = r.shape[-1]
        src = ins[2] if C == 120 else ins[3]
        r[0] = src[0][:, :C].astype(f32)
    outs[-1][0] = ins[0][0][:, :1]


def combined_kernel(xp_ref, posm_ref, w_ref, out_ref, *, K):
    f32 = jnp.float32
    for k in range(K):
        x = xp_ref[k]  # [N, 512]
        out_ref[k] = jnp.concatenate(
            [x.astype(f32), x.astype(f32), x.astype(f32), x[:, :512 - 384].astype(f32)], axis=1
        ) + posm_ref[k][:, :1] + w_ref[0, :1].astype(f32)


def main():
    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    G, N, S, V = 128, 48, 120, 32
    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16

    # --- split (current layout) ---
    pos = jnp.asarray(rng.standard_normal((G, N, 4)).astype(np.float32))
    mask = jnp.ones((G, N, 1), jnp.float32)
    s = jnp.zeros((G, N, S), cdt)
    v3 = [jnp.zeros((G, N, V), cdt) for _ in range(3)]
    w1 = jnp.zeros((32, 64), cdt)
    b1 = jnp.zeros((1, 64), jnp.float32)
    w2s = []
    for C in (S, S, V, V, V):
        w2s += [jnp.zeros((64, C), cdt), jnp.zeros((1, C), jnp.float32)]
    scal = jnp.zeros((1, 4), jnp.float32)

    def gspec(shape, K=1):
        return pl.BlockSpec((K,) + shape, lambda g: (g,) + (0,) * len(shape), memory_space=pltpu.VMEM)

    def shared(shape):
        return pl.BlockSpec(shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)

    out_dims = (S, S, S, S, V, V, V, V, V, V, V, 1)

    @jax.jit
    def split_call(pos, s):
        ins = [pos, mask, s] + v3 + [w1, b1] + w2s + [scal]
        in_specs = [gspec((N, 4)), gspec((N, 1)), gspec((N, S))] + [gspec((N, V))] * 3 + [
            shared((32, 64)), shared((1, 64))]
        for C in (S, S, V, V, V):
            in_specs += [shared((64, C)), shared((1, C))]
        in_specs.append(shared((1, 4)))
        return pl.pallas_call(
            split_kernel, grid=(G,), in_specs=in_specs,
            out_specs=tuple(gspec((N, C)) for C in out_dims),
            out_shape=tuple(jax.ShapeDtypeStruct((G, N, C), jnp.float32) for C in out_dims),
        )(*ins)

    # --- combined ---
    xp = jnp.zeros((G, N, 512), cdt)  # 4 slot-padded feature streams
    posm = jnp.asarray(rng.standard_normal((G, N, 8)).astype(np.float32))
    wpk = jnp.zeros((80, 640), cdt)  # all weights in one buffer

    def combined_call_factory(K):
        @jax.jit
        def call(xp, posm):
            return pl.pallas_call(
                functools.partial(combined_kernel, K=K),
                grid=(G // K,),
                in_specs=[gspec((N, 512), K), gspec((N, 8), K), shared((80, 640))],
                out_specs=gspec((N, 1664), K),
                out_shape=jax.ShapeDtypeStruct((G, N, 1664), jnp.float32),
            )(xp, posm, wpk)

        return call

    def inloop(fn, x0, label, iters=50):
        @jax.jit
        def loop(seed):
            def body(_, acc):
                outs = fn(*acc)
                o = outs[0] if isinstance(outs, (tuple, list)) else outs
                a0 = acc[0] + o[..., : acc[0].shape[-1]].astype(acc[0].dtype) * 0
                return (a0, acc[1])

            return jax.lax.fori_loop(0, iters, body, seed)

        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x0))
        t = time.perf_counter() - t0
        print(f"{label}: compile {c:6.1f}s  {t*1e3/iters:7.3f} ms/iter ({t*1e6/iters/G:5.2f} us/graph)", flush=True)

    inloop(split_call, (pos, s), "split-k1    ")
    inloop(combined_call_factory(1), (xp, posm), "combined-k1 ")
    inloop(combined_call_factory(4), (xp, posm), "combined-k4 ")
    inloop(combined_call_factory(8), (xp, posm), "combined-k8 ")


if __name__ == "__main__":
    main()
