"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy of exercising the full pipeline on
small machines (reference azure-pipelines.yml); multi-chip sharding is
validated on virtual CPU devices as the driver does via dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
