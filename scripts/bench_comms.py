"""Multi-chip cost accounting on the virtual 8-device CPU mesh (VERDICT r2 #4).

Real ICI is not available in this environment (one tunneled chip), so this
script measures what CAN be measured honestly without it:

  1. Atom-sharded E3Conv: the per-layer halo all-gather volume, read straight
     from the compiled HLO (every `all-gather` op's result bytes), against the
     compiler's own FLOP count — the bytes/FLOP arithmetic intensity that
     decides whether the halo rides free under compute on a real mesh.
  2. DP train-step parity: the same global batch on 1 device vs sharded over
     8 — loss agreement and step-count parity (the compiler inserts the
     gradient psum).

What this does NOT measure: actual ICI transfer time, overlap, or DP scaling
throughput — those need real chips; BENCH_NOTES states the projection and its
assumptions explicitly.

Run: python scripts/bench_comms.py
"""

from __future__ import annotations

import os
import re

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "f64": 8, "s32": 4, "u32": 4, "pred": 1, "s8": 1, "u8": 1}


def collective_bytes(hlo_text: str):
    """Sum result bytes of every all-gather / all-reduce / reduce-scatter op
    in the compiled HLO (shapes like `f32[8,96,216]`)."""
    out = {}
    for kind in ("all-gather", "all-reduce", "reduce-scatter", "collective-permute"):
        total = 0
        count = 0
        for m in re.finditer(rf"=\s*(\w+)\[([\d,]*)\]\S*\s+{kind}(?:-start)?\(", hlo_text):
            dt, dims = m.group(1), m.group(2)
            n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims else 1
            total += n * _DTYPE_BYTES.get(dt, 4)
            count += 1
        if count:
            out[kind] = (count, total)
    return out


def main():
    from jamun_tpu.models.e3conv import E3Conv
    from jamun_tpu.parallel.atom_sharded import (
        atom_sharded_forward,
        prepare_atom_sharded_batch,
    )
    from jamun_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from jamun_tpu.utils.testing import make_test_batch

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    print(f"devices: {n_dev} (virtual CPU mesh)")

    # ---- 1. atom-sharded halo volume vs FLOPs (real hidden dims) ----
    print("\n== atom-sharded E3Conv (S=120, V=32, 5 layers, real arch dims) ==")
    for N in (96, 256, 512):
        batch = make_test_batch(
            num_graphs=1, max_nodes=N, nodes_per_graph=[N], max_bonds=2 * N, scale=0.6
        )
        arch = E3Conv(tensor_product="uvu", use_pallas=False)
        c_noise = jnp.asarray([0.1])
        cutoff = jnp.asarray(1.0)
        params = jax.jit(arch.init)(jax.random.PRNGKey(0), batch, c_noise, cutoff)

        sharded = prepare_atom_sharded_batch(batch, mesh)
        lowered = jax.jit(
            lambda p, b: atom_sharded_forward(arch, mesh, p, b, c_noise, cutoff)
        ).lower(params, sharded)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        cols = collective_bytes(hlo)
        cost = compiled.cost_analysis()
        flops = (cost or {}).get("flops", float("nan"))
        ag_count, ag_bytes = cols.get("all-gather", (0, 0))
        other = {k: v for k, v in cols.items() if k != "all-gather"}
        print(
            f"N={N:4d}: all-gather x{ag_count} = {ag_bytes/1e6:8.3f} MB/fwd"
            f"  | HLO flops {flops/1e9:7.2f} G | bytes/flop {ag_bytes/max(flops,1):.4f}"
            + (f" | other collectives: {other}" if other else "")
        )

    # ---- 2. DP train-step parity: 1 device vs 8-device mesh ----
    print("\n== DP train-step parity (global batch 8, 3 steps) ==")
    import optax

    from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
    from jamun_tpu.train.distributions import ConstantSigma
    from jamun_tpu.train.state import create_train_state, make_train_step

    arch = E3Conv(
        irreps_hidden="8x0e + 4x1e", n_layers=2, edge_attr_dim=8,
        atom_type_embedding_dim=2, atom_code_embedding_dim=2,
        residue_code_embedding_dim=2, residue_index_embedding_dim=2,
        tensor_product="uvu",
    )
    den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.3))
    batch = make_test_batch(num_graphs=8, max_nodes=16, scale=0.4)
    opt = optax.sgd(1e-3)
    step = jax.jit(make_train_step(den, opt, ConstantSigma(0.05)))

    state1 = create_train_state(den, opt, batch, seed=0)
    state8 = jax.device_put(state1, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    losses1, losses8 = [], []
    s1, s8 = state1, state8
    for i in range(3):
        s1, aux1 = step(s1, batch)
        s8, aux8 = step(s8, shard_batch(batch, mesh))
        losses1.append(float(aux1["loss"]))
        losses8.append(float(aux8["loss"]))
    print(f"1-device losses: {losses1}")
    print(f"8-device losses: {losses8}")
    np.testing.assert_allclose(losses1, losses8, rtol=2e-5)
    assert int(s1.step) == int(s8.step) == 3
    print("PARITY OK: identical losses and step counts; gradient psum inserted by XLA")


if __name__ == "__main__":
    main()
