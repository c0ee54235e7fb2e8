"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the
host platform to expose 8 devices (the driver separately dry-runs the
multi-chip path; see __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# This box has a single CPU core; XLA compiles dominate test time. Cache
# compiled executables across pytest runs.
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# The axon TPU plugin (sitecustomize) loads before conftest and consumes
# XLA_FLAGS, so --xla_force_host_platform_device_count is ignored; the jax
# config knob applies at CPU client creation instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


# One long pytest process accumulates live compiled executables and garbage
# cycles across 190 tests (every test builds fresh jitted closures); on this
# 1-core box that inflates a ~6-minute suite past 10 minutes. Dropping the
# in-memory executable cache per module and forcing a collect keeps the
# process flat — recompiles hit the persistent .jax_cache so the cost is
# deserialization, not XLA.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _flush_compiled_state_per_module():
    yield
    jax.clear_caches()
    gc.collect()
