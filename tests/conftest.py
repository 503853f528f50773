"""Test configuration: force a genuine local CPU backend with a virtual
8-device mesh.

NOTE: this environment's sitecustomize overrides JAX_PLATFORMS to route all
work to a single tunneled TPU chip; `jax.config.update` after import wins, and
keeps the test suite off the (exclusive, slow-dispatch) TPU tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
