"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The reference has no multi-device tests (SURVEY.md §4); this is new capability:
all sharded code paths are exercised on host CPU with
--xla_force_host_platform_device_count=8.

Note: this environment injects a TPU PJRT plugin via sitecustomize that pins
JAX_PLATFORMS — `jax.config.update` after import is the reliable override, the
env var alone is not.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
# tests get their own compilation cache: entries differ from production
# (device count, platform) and must not pollute the TPU cache
os.environ.setdefault(
    "GPSAT_TPU_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "gpsat_tpu_jax_cputest"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
