"""Profile the walk step on the real TPU via jax.profiler.trace.

NOTES_NEXT round-3 #2a: all kernel-time attribution so far was ablation
guesswork; this captures an XPlane device trace through the axon tunnel and
prints a per-op time table, so the 5AA (N=112 layerwise) and 4AA (N=44 stack)
hot spots are measured, not inferred.

Usage:
  python scripts/profile_walk.py [--n 112] [--pad 112] [--chains 256]
      [--steps 20] [--stack | --no-pallas] [--out DIR]
  (default path = the layerwise fused kernels; --stack for the whole-model
  stack kernel, --no-pallas for the XLA fast path)

Prints the top ops by self-time from the captured trace. The raw trace stays
in --out (default /tmp/jaxprof) for tensorboard_plugin_profile if available.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from collections import defaultdict


def parse_traces(trace_dir):
    """Return [(process_name, event_name, total_us, count)] aggregated from
    all Chrome-format *.trace.json.gz files the profiler writes (this image's
    tensorflow does not ship the xplane proto, so the .xplane.pb sibling is
    only readable via xprof's converters — which report Pallas custom calls
    as opaque anyway; the Chrome trace carries the same device timeline)."""
    import gzip
    import json

    agg = defaultdict(lambda: [0.0, 0])
    for path in glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    ):
        with gzip.open(path) as f:
            tr = json.load(f)
        evs = tr["traceEvents"] if isinstance(tr, dict) else tr
        names = {
            e["pid"]: e["args"].get("name", "")
            for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        for e in evs:
            if e.get("ph") == "X":
                key = (names.get(e["pid"], ""), e["name"])
                agg[key][0] += e.get("dur", 0)
                agg[key][1] += 1
    return [(proc, name, us, cnt) for (proc, name), (us, cnt) in agg.items()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=112)
    ap.add_argument("--pad", type=int, default=None)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--stack", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--out", default="/tmp/jaxprof")
    ap.add_argument("--chain-geom", action="store_true",
                    help="worm-like-chain positions (sparse-regime geometry)")
    ap.add_argument("--skin", type=float, default=0.0,
                    help=">0: Verlet-cached neighbor lists with this skin (nm)")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    pad = args.pad or args.n

    import jax
    import jax.numpy as jnp

    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.utils.testing import make_test_batch

    use_pallas = not args.no_pallas
    arch = E3Conv(
        tensor_product="uvu", dtype=jnp.bfloat16, use_pallas=use_pallas,
        fused_stack=bool(args.stack),
    )
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
    batch = make_test_batch(
        num_graphs=args.chains, max_nodes=pad,
        nodes_per_graph=[args.n] * args.chains, max_bonds=2 * pad, scale=0.35,
    )
    if args.chain_geom:
        from jamun_tpu.utils.testing import make_chain_positions

        batch = batch.replace(pos=jnp.asarray(make_chain_positions(args.chains, pad, seed=0)))
    params = den.init(jax.random.PRNGKey(0), batch)
    mask = batch.node_mask[..., None].astype(batch.pos.dtype)
    sigma = 0.04
    mcmc = BAOAB(
        MCMCConfig(
            delta=0.04, friction=1.0, M=1.0, steps=args.steps,
            save_every_n_steps=args.steps - 1, score_fn_clip=100.0,
        )
    )

    cached = (
        den.make_neighbor_cached_score(params, batch, sigma, args.skin)
        if args.skin > 0
        else None
    )

    @jax.jit
    def walk(params, y0, key):
        def score_fn(y):
            return den.score(params, batch.replace_pos(y), sigma)

        y, v, y_traj, s_traj = mcmc(
            key, y0, score_fn, v_init="gaussian", mask=mask, cached_score=cached
        )
        return y

    y0 = batch.pos
    t0 = time.perf_counter()
    y = walk(params, y0, jax.random.PRNGKey(1))
    jax.block_until_ready(y)
    print(f"# compile+run {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    y = walk(params, y, jax.random.PRNGKey(2))
    jax.block_until_ready(y)
    wall = time.perf_counter() - t0
    print(
        f"# steady: {wall * 1e3 / (args.steps - 1):.3f} ms/step "
        f"(N={args.n}/{pad}, G={args.chains})",
        file=sys.stderr, flush=True,
    )

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        y = walk(params, y, jax.random.PRNGKey(3))
        jax.block_until_ready(y)

    try:
        rows = parse_traces(args.out)
    except Exception as e:
        print(f"TRACE PARSE FAILED: {type(e).__name__}: {e}")
        print("trace files:", glob.glob(os.path.join(args.out, "**", "*"), recursive=True))
        sys.exit(2)

    if not rows:
        print("NO TRACE DATA captured (device tracing likely unsupported through tunnel)")
        sys.exit(3)

    # device events first, by total time
    dev = sorted((r for r in rows if r[0].startswith("/device")), key=lambda r: -r[2])
    print(f"{'process':<22} {'ms':>9} {'n':>5}  event")
    for proc, name, us, cnt in dev[: args.top]:
        print(f"{proc[:22]:<22} {us / 1e3:>9.2f} {cnt:>5}  {name[:100]}")


if __name__ == "__main__":
    main()
