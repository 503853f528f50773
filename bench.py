"""Headline benchmark: walk-jump sampling throughput on a 4AA-scale peptide.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's published 2.5 ms/sample on Timewarp 4AA, 1 GPU
(`/root/reference/analysis/sampling_times/JAMUN.csv:4`), where one "sample" is
one emitted walk-jump frame of one chain (save_every=1). Here the whole walk
is a fused lax.scan over vmapped chains on one TPU chip, and the jump is FREE:
BAOAB already evaluates the raw score at every saved state, and
score(y) = (xhat(y) - y) / sigma^2 exactly, so the per-frame jump is the
elementwise identity xhat = y + sigma^2 * score (see
`jamun_tpu/sampling/walkjump.py` `fused_jump`) — the second denoiser pass the
reference runs per frame (`walkjump/_single_measurement.py`) never happens.
vs_baseline = baseline_ms / our_ms (>1 is faster than the reference).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS_PER_SAMPLE = 2.5  # Timewarp 4AA, reference CSV

N_ATOMS = 44  # 4AA-scale heavy-atom count
N_PAD = 44  # exact-N padding: pair arrays are O(N^2), and the kernels take
# any N; padding to the "round" 48 costs ~16% more pairs for nothing
# (measured delta ~2% — recorded in BENCH_NOTES round 3)
NUM_CHAINS = 256  # per-sample optimum for the fused kernel (sweep in
# BENCH_NOTES: 64 -> 0.0430, 128 -> 0.0407, 256 -> 0.0401, 512 -> 0.0416)
STEPS = 101  # steps-1 walk updates (reference loop semantics)
SIGMA = 0.04

if "--chains" in sys.argv:
    NUM_CHAINS = int(sys.argv[sys.argv.index("--chains") + 1])


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    from jamun_tpu.utils.jax_setup import setup_jax

    try:
        setup_jax()
        jax.devices()
    except Exception as e:  # backend unavailable: emit an explicit error line
        # rather than crashing with no JSON (the tunneled TPU service has
        # observable multi-hour outages; see NOTES_NEXT.md)
        print(json.dumps({
            "metric": "walkjump_ms_per_sample_4AA",
            "value": None,
            "unit": "ms/sample",
            "vs_baseline": None,
            "error": f"TPU backend unavailable: {type(e).__name__}",
        }), flush=True)
        return
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.utils.testing import make_test_batch

    # default: the whole-model stack kernel (ops/pallas/e3_stack.py) — the
    # ENTIRE walk-step forward in one pallas call; --layerwise for the
    # per-layer fused kernels, --no-pallas for the XLA fast path
    use_pallas = "--no-pallas" not in sys.argv
    fused_stack = use_pallas and "--layerwise" not in sys.argv
    arch = E3Conv(
        tensor_product="uvu", dtype=jnp.bfloat16, use_pallas=use_pallas,
        fused_stack=fused_stack,
    )
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
    batch = make_test_batch(
        num_graphs=NUM_CHAINS,
        max_nodes=N_PAD,
        nodes_per_graph=[N_ATOMS] * NUM_CHAINS,
        max_bonds=2 * N_PAD,
        scale=0.35,
    )
    log("init params")
    params = den.init(jax.random.PRNGKey(0), batch)
    mask = batch.node_mask[..., None].astype(batch.pos.dtype)

    mcmc = BAOAB(
        MCMCConfig(
            delta=0.04, friction=1.0, M=1.0, steps=STEPS,
            save_every_n_steps=1, score_fn_clip=100.0,
        )
    )

    @jax.jit
    def walk_jump(params, y0, key):
        def score_fn(y):
            return den.score(params, batch.replace_pos(y), SIGMA)

        y, v, y_traj, score_traj = mcmc(key, y0, score_fn, v_init="gaussian", mask=mask)
        # fused jump: xhat = y + sigma^2 * score, exactly (BAOAB saves the raw
        # score at every saved state) — zero additional denoiser forwards
        xhat_traj = y_traj + (SIGMA**2) * score_traj
        return y, v, y_traj, xhat_traj

    y0 = batch.pos + SIGMA * jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape) * mask

    log("compiling fused walk-jump...")
    t0 = time.perf_counter()
    y, v, y_traj, xhat_traj = walk_jump(params, y0, jax.random.PRNGKey(2))
    jax.block_until_ready(xhat_traj)
    log(f"walk-jump compile+run {time.perf_counter() - t0:.1f}s; frames={y_traj.shape[0]}")

    # timed runs. Sync via a SCALAR device->host fetch, not block_until_ready:
    # right after a long cold compile the tunnel has been observed to ack
    # block_until_ready before the dispatch actually executed (a 101-step
    # walk "finishing" in 1 ms); a value fetch cannot return early. Timings
    # faster than 1 us/step are physically impossible on this chip — treat
    # them as that artifact and retry.
    min_plausible = (STEPS - 1) * 1e-6
    times = []
    for i in range(6):
        t0 = time.perf_counter()
        y, v, y_traj, xhat_traj = walk_jump(params, y, jax.random.PRNGKey(3 + i))
        sync = float(jnp.sum(xhat_traj[-1, 0]))
        dt = time.perf_counter() - t0
        if dt >= min_plausible:
            times.append(dt)
        else:
            log(f"implausible timing {dt * 1e3:.3f} ms discarded (sync={sync:.3g})")
        if len(times) >= 2:
            break
    if not times:
        print(json.dumps({
            "metric": "walkjump_ms_per_sample_4AA",
            "value": None,
            "unit": "ms/sample",
            "vs_baseline": None,
            "error": "all timings implausibly fast (tunnel sync artifact)",
        }), flush=True)
        return

    elapsed = min(times)
    n_frames = int(y_traj.shape[0])
    n_samples = NUM_CHAINS * n_frames
    ms_per_sample = elapsed * 1e3 / n_samples
    result = {
        "metric": "walkjump_ms_per_sample_4AA",
        "value": round(ms_per_sample, 5),
        "unit": "ms/sample",
        "vs_baseline": round(BASELINE_MS_PER_SAMPLE / ms_per_sample, 2),
    }
    print(json.dumps(result), flush=True)
    log(
        f"chains={NUM_CHAINS} frames={n_frames} walk_jump={elapsed:.3f}s "
        f"steps/sec/chip={(STEPS - 1) / elapsed:.1f} (x{NUM_CHAINS} chains)"
    )

    if "--quick" in sys.argv:
        return

    # --- steady-state: the reference-shaped 20k-step uncapped workload ---
    # (`/root/reference/configs/experiment/sample_uncapped_2AA.yaml:16`), every
    # step saved, trajectories materialized in HBM (real memory pressure).
    # Host drain is excluded here: through the axon tunnel device->host is
    # ~100x slower than a local TPU host (BENCH_NOTES), so including it would
    # measure the tunnel, not the chip; pass --offload CHUNK to measure the
    # chunked-drain variant anyway.
    ss_steps = 20000
    if "--steps" in sys.argv:
        ss_steps = int(sys.argv[sys.argv.index("--steps") + 1])
    offload = 0
    if "--offload" in sys.argv:
        offload = int(sys.argv[sys.argv.index("--offload") + 1])
    # segment the scan regardless: a single 20k-frame trajectory pair
    # (~6 GB) faults the device; 2k-step segments match the offload
    # chunking real runs use (sampling/walkjump.py offload_chunk_steps)
    seg_steps = offload if offload else min(ss_steps, 2000)
    n_seg = max(1, ss_steps // seg_steps)

    mcmc_ss = BAOAB(
        MCMCConfig(
            delta=0.04, friction=1.0, M=1.0, steps=seg_steps + 1,
            save_every_n_steps=1, score_fn_clip=100.0,
        )
    )

    @jax.jit
    def walk_segment(params, y0, v0, key):
        def score_fn(y):
            return den.score(params, batch.replace_pos(y), SIGMA)

        y, v, y_traj, score_traj = mcmc_ss(key, y0, score_fn, v_init=v0, mask=mask)
        # fused jump folded into a checksum: xhat frames are produced and
        # reduced on device without materializing a third trajectory
        checksum = jnp.sum(jnp.abs(y_traj + (SIGMA**2) * score_traj))
        return y, v, checksum

    log(f"steady-state: {n_seg} x {seg_steps} steps, offload={'on' if offload else 'off'}")
    v0 = jnp.zeros_like(y)
    yc, vc, checksum = walk_segment(params, y, v0, jax.random.PRNGKey(7))
    float(checksum)  # compile + warm segment; scalar fetch, NOT
    # block_until_ready — the tunnel acks the latter early after cold
    # compiles, which would leak the warm segment into the timed region
    t0 = time.perf_counter()
    total_frames = 0
    yc, vc = y, v0
    for i in range(n_seg):
        yc, vc, checksum = walk_segment(params, yc, vc, jax.random.PRNGKey(10 + i))
        if offload:
            np.asarray(checksum)  # host sync per chunk (drain proxy)
        total_frames += seg_steps + 1
    float(checksum)  # scalar fetch: real completion sync (see headline note)
    ss_elapsed = time.perf_counter() - t0
    ss_ms = ss_elapsed * 1e3 / (NUM_CHAINS * total_frames)
    # metric name says device_only: host drain is excluded unless --offload
    # (through this tunnel device->host is ~100x a local TPU host, so the
    # default number is the on-chip rate; the offload variant measures the
    # chunked-drain path end to end)
    print(json.dumps({
        "metric": (
            "walkjump_steady_state_ms_per_sample_4AA_20k_"
            + ("with_offload" if offload else "device_only")
        ),
        "value": round(ss_ms, 5),
        "unit": "ms/sample",
        "vs_baseline": round(BASELINE_MS_PER_SAMPLE / ss_ms, 2),
    }), flush=True)
    log(
        f"steady-state {total_frames} frames x {NUM_CHAINS} chains in "
        f"{ss_elapsed:.1f}s ({ss_elapsed * 1e3 / (n_seg * seg_steps):.3f} ms/step)"
    )

    if "--no-extra" not in sys.argv:
        extra_size_metrics()


def extra_size_metrics():
    """Frontier metrics alongside the 4AA headline (VERDICT r4 #8): 2AA and
    5AA (the reference's other published sizes) plus one sparse-regime point
    (N=1024 walk on the capped-neighbor path — the production execution
    format for large molecules, BENCH_NOTES round 4a/5). Emitted as extra
    JSON lines so BENCH_r*.json tracks regressions where the remaining
    performance work actually is."""
    import jax
    import jax.numpy as jnp

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.sampling.mcmc import BAOAB, MCMCConfig
    from jamun_tpu.utils.testing import make_chain_positions, make_test_batch

    # label, chains, N (exact heavy atoms), baseline ms/sample
    # (`/root/reference/analysis/sampling_times/JAMUN.csv`), arch mode
    CONFIGS = [
        ("2AA", 256, 19, 2.2, "stack"),       # N<=64: whole-model stack kernel
        ("5AA", 128, 112, 7.5, "layerwise"),  # per-layer fused kernels
        ("N512_sparse", 8, 512, None, "nbr"),   # capped-K sparse path, the
        # strongest kernel+Verlet gain (1.63x same-session, round 5a)
        ("N1024_sparse", 2, 1024, None, "nbr"),  # capped-K sparse path (G=2:
        # the measured per-sample optimum for the dense-HBM-bound gather path)
    ]
    for label, G, N, ref_ms, mode in CONFIGS:
        if "--only" in sys.argv and sys.argv[sys.argv.index("--only") + 1] != label:
            continue
        arch = E3Conv(
            tensor_product="uvu", dtype=jnp.bfloat16, use_pallas=True,
            fused_stack=mode == "stack",
        )
        den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
        batch = make_test_batch(
            num_graphs=G, max_nodes=N, nodes_per_graph=[N] * G, max_bonds=2 * N,
            scale=0.35,
        )
        if mode == "nbr":
            # worm-like-chain geometry: the realistic large-molecule regime
            # whose cutoff fill factor actually collapses with N
            batch = batch.replace(pos=jnp.asarray(make_chain_positions(G, N, seed=0)))
        params = den.init(jax.random.PRNGKey(0), batch)
        mask = batch.node_mask[..., None].astype(batch.pos.dtype)
        mcmc = BAOAB(
            MCMCConfig(delta=0.04, friction=1.0, M=1.0, steps=STEPS,
                       save_every_n_steps=1, score_fn_clip=100.0)
        )

        # sparse regime: Verlet-cached neighbor lists (skin 1.0 nm, rebuild on
        # the skin/2 displacement trigger) — the production sampling config
        cached = (
            den.make_neighbor_cached_score(params, batch, SIGMA, 1.0)
            if mode == "nbr"
            else None
        )

        @jax.jit
        def walk_jump(params, y0, key, den=den, batch=batch, mcmc=mcmc, mask=mask,
                      cached=cached):
            def score_fn(y):
                return den.score(params, batch.replace_pos(y), SIGMA)

            y, v, y_traj, score_traj = mcmc(
                key, y0, score_fn, v_init="gaussian", mask=mask, cached_score=cached
            )
            return y, y_traj + (SIGMA**2) * score_traj

        y0 = batch.pos + SIGMA * jax.random.normal(
            jax.random.PRNGKey(1), batch.pos.shape
        ) * mask
        t0 = time.perf_counter()
        y, xhat_traj = walk_jump(params, y0, jax.random.PRNGKey(2))
        float(jnp.sum(xhat_traj[-1, 0]))  # scalar-fetch sync (tunnel rule)
        log(f"{label}: compile+run {time.perf_counter() - t0:.1f}s")

        min_plausible = (STEPS - 1) * 1e-6
        times = []
        for i in range(6):
            t0 = time.perf_counter()
            y, xhat_traj = walk_jump(params, y, jax.random.PRNGKey(3 + i))
            float(jnp.sum(xhat_traj[-1, 0]))
            dt = time.perf_counter() - t0
            if dt >= min_plausible:
                times.append(dt)
            if len(times) >= 2:
                break
        if not times:
            print(json.dumps({
                "metric": f"walkjump_ms_per_sample_{label}", "value": None,
                "unit": "ms/sample", "vs_baseline": None,
                "error": "all timings implausibly fast (tunnel sync artifact)",
            }), flush=True)
            continue
        ms = min(times) * 1e3 / (G * int(xhat_traj.shape[0]))
        print(json.dumps({
            "metric": f"walkjump_ms_per_sample_{label}",
            "value": round(ms, 5),
            "unit": "ms/sample",
            "vs_baseline": round(ref_ms / ms, 2) if ref_ms else None,
        }), flush=True)


if __name__ == "__main__":
    main()
