"""On-hardware bf16 parity spot-check: whole-model STACK kernel vs the
layerwise kernel path vs the plain XLA fast path (NOTES_NEXT round-3 #5).

CPU f32 parity is covered by tests/test_e3_stack.py; this script checks
the compiled Mosaic kernels on the real TPU at the bench's bf16 shapes
(N=44 exact-N 4AA and N=19 2AA), where Mosaic layout/precision choices can
differ from interpret mode.

Pass criterion: masked positions' denoiser outputs agree within bf16 noise
(rel tol ~2e-2 on the score, which amplifies xhat-y by 1/sigma^2).

Run: python scripts/check_stack_parity_tpu.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def run_case(n_atoms: int, n_pad: int, num_chains: int = 8) -> bool:
    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.utils.testing import make_test_batch

    sigma = 0.04
    batch = make_test_batch(
        num_graphs=num_chains,
        max_nodes=n_pad,
        nodes_per_graph=[n_atoms] * num_chains,
        max_bonds=2 * n_pad,
        scale=0.35,
    )
    outs = {}
    params = None
    for name, kwargs in (
        ("xla", dict(use_pallas=False)),
        ("layerwise", dict(use_pallas=True)),
        ("stack", dict(use_pallas=True, fused_stack=True)),
    ):
        arch = E3Conv(tensor_product="uvu", dtype=jnp.bfloat16, **kwargs)
        den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.5))
        if params is None:
            params = den.init(jax.random.PRNGKey(0), batch)

        @jax.jit
        def score_fn(params, pos, den=den):
            return den.score(params, batch.replace_pos(pos), sigma)

        t0 = time.perf_counter()
        outs[name] = np.asarray(
            score_fn(params, batch.pos), dtype=np.float64
        ) * batch.node_mask[..., None]
        print(
            f"#   N={n_atoms}/{n_pad} {name}: compile+run "
            f"{time.perf_counter() - t0:.1f}s",
            file=sys.stderr, flush=True,
        )

    ok = True
    scale = np.abs(outs["xla"]).max()
    for name in ("layerwise", "stack"):
        err = np.abs(outs[name] - outs["xla"]).max() / max(scale, 1e-30)
        line = f"N={n_atoms}/{n_pad} {name} vs xla: max rel err {err:.3e} (scale {scale:.3e})"
        if err > 2e-2:
            print(f"FAIL {line}")
            ok = False
        else:
            print(f"ok   {line}")
    return ok


def main():
    from jamun_tpu.utils.jax_setup import setup_jax

    setup_jax()
    print(f"# devices: {jax.devices()}", file=sys.stderr, flush=True)
    # run BOTH cases even if the first fails (full diagnostic signal)
    ok44 = run_case(44, 44)
    ok19 = run_case(19, 19)
    ok = ok44 and ok19
    print("PARITY " + ("PASS" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
