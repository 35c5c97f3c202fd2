"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference has no multi-device tests (SURVEY.md §4); this is new capability:
all sharded code paths are exercised on host CPU with
--xla_force_host_platform_device_count=8.
"""

import os

# must be set before jax is imported anywhere in the test process
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
