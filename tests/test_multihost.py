"""Real two-process jax.distributed test (the DCN half of SURVEY 5.8).

Spawns TWO separate Python processes that initialize jax.distributed over a
local coordinator, build a GLOBAL mesh spanning both processes' CPU devices,
and run one data-parallel training step of the real denoiser with
`multihost_utils` host-local batch sharding. This exercises the code path
the reference gets from Lightning DDP + srun (`scripts/slurm/train.sh:31-37`)
without multi-host hardware.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)

from jamun_tpu.parallel.distributed import initialize_distributed, is_multihost, host_log

initialize_distributed()  # picks up JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
assert is_multihost(), "distributed init failed"
assert jax.process_count() == 2
assert jax.device_count() == 4, jax.devices()

import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jamun_tpu.models.denoiser import Denoiser, DenoiserConfig
from jamun_tpu.models.e3conv import E3Conv
from jamun_tpu.train.distributions import ConstantSigma
from jamun_tpu.train.state import create_train_state, make_train_step
from jamun_tpu.utils.testing import make_test_batch

mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
arch = E3Conv(
    irreps_hidden="4x0e + 2x1e", n_layers=1, edge_attr_dim=4,
    atom_type_embedding_dim=2, atom_code_embedding_dim=2,
    residue_code_embedding_dim=2, residue_index_embedding_dim=2,
    tensor_product="uvu",
)
den = Denoiser(arch, DenoiserConfig(max_radius=1.0, average_squared_distance=0.3))

# host-local batch shard -> global array over the mesh "data" axis
local = make_test_batch(num_graphs=2, max_nodes=6, seed=jax.process_index())
global_batch = jax.tree.map(
    lambda x: multihost_utils.host_local_array_to_global_array(
        np.asarray(x), mesh, P("data")
    ),
    local,
)

opt = optax.adam(1e-3)
state = create_train_state(den, opt, local, seed=0)
state = jax.device_put(state, NamedSharding(mesh, P()))  # replicated params
step = jax.jit(make_train_step(den, opt, ConstantSigma(0.04)))
state, aux = step(state, global_batch)
loss = float(aux["loss"])
assert np.isfinite(loss), loss

# cross-host agreement: every process must see the identical loss
losses = multihost_utils.process_allgather(jnp.asarray(loss))
assert np.allclose(np.asarray(losses), loss), losses
host_log("two-process DP step ok: loss=%.5f", loss)
print(f"proc {jax.process_index()} OK loss={loss:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    # The worker script lives in tmp_path, so Python auto-adds only tmp_path
    # (the script's directory) to sys.path; add the repo root via PYTHONPATH
    # so jamun_tpu is importable without an editable install.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=os.pathsep.join(
                p for p in (repo_root, os.environ.get("PYTHONPATH", "")) if p
            ),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert "OK loss=" in out
    # both processes computed the same global loss
    l0 = outs[0].split("OK loss=")[1].split()[0]
    l1 = outs[1].split("OK loss=")[1].split()[0]
    assert l0 == l1, (l0, l1)
