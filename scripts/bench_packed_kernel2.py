"""Careful kernel timing: fresh inputs per rep + in-loop probes for both kernels."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()

    G, N, S, V, nr = 128, 48, 120, 32, 32
    cdt = jnp.bfloat16
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((G, N, 3)).astype(np.float32)) * 0.35
    mask = jnp.asarray(rng.random((G, N)) > 0.05)
    xs = [
        jnp.asarray(rng.standard_normal((G, N, S + 3 * V)).astype(np.float32)) for _ in range(6)
    ]
    w1 = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.standard_normal(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((64, 2 * S + 3 * V)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal(2 * S + 3 * V).astype(np.float32) * 0.1)
    bond0 = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    cutoff = jnp.asarray(0.9)
    jax.block_until_ready(xs)

    from jamun_tpu.ops.pallas.packed_conv import packed_uvu_conv_dense
    from jamun_tpu.ops.pallas.fused_conv import fused_uvu_conv_dense

    packed = functools.partial(packed_uvu_conv_dense, S=S, V=V, n_radial=nr, compute_dtype=cdt)
    plane = functools.partial(fused_uvu_conv_dense, S=S, V=V, n_radial=nr, compute_dtype=cdt)

    for name, fn in (("packed", packed), ("plane ", plane)):
        out = fn(pos, mask, xs[0], w1, b1, w2, b2, bond0, cutoff)
        jax.block_until_ready(out)
        # same input every rep
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(pos, mask, xs[0], w1, b1, w2, b2, bond0, cutoff))
            ts.append(time.perf_counter() - t0)
        same = min(ts)
        # fresh input every rep
        ts = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(pos, mask, x, w1, b1, w2, b2, bond0, cutoff))
            ts.append(time.perf_counter() - t0)
        fresh = min(ts)
        print(f"{name}: same-input {same*1e3:.3f} ms  fresh-input {fresh*1e3:.3f} ms", flush=True)

    # in-loop probes (sequential dependency, 50 iters)
    for name, fn in (("packed", packed), ("plane ", plane)):

        @jax.jit
        def loop(x, fn=fn):
            def body(_, acc):
                out, deg = fn(pos, mask, acc, w1, b1, w2, b2, bond0, cutoff)
                return acc + out[..., : S + 3 * V] * 1e-4

            return jax.lax.fori_loop(0, 50, body, x)

        t0 = time.perf_counter()
        jax.block_until_ready(loop(xs[0]))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(loop(xs[1]))
        t = time.perf_counter() - t0
        print(f"{name}-in-loop(50): compile {c:.1f}s  {t*1e3/50:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
