"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy of exercising the full pipeline on
small machines (reference azure-pipelines.yml); multi-chip sharding is
validated on virtual CPU devices as the driver does via dryrun_multichip.

NOTE: this machine's environment force-registers a tunneled TPU backend
("axon") and overrides JAX_PLATFORMS, so the env var alone is NOT
enough - we must also update jax.config before any backend is touched.
Running tests through the TPU tunnel would be pathologically slow
(~0.4s RTT per host transfer) and races with concurrent benchmarks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.local_device_count() >= 8, (
    "tests require 8 virtual CPU devices; got "
    f"{jax.devices()}"
)
