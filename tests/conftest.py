"""Test configuration.

Unit tests run on the CPU backend with 8 virtual devices so multi-chip
sharding tests work without TPU hardware (the driver separately dry-runs the
real multi-chip path via __graft_entry__.dryrun_multichip).

This container boots an experimental TPU PJRT plugin from sitecustomize
*before* any conftest runs, which locks the backend choice at import time —
so we reset the backend registry in-process and re-select CPU.
"""

import os
import sys

repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if repo_root not in sys.path:
    sys.path.insert(0, repo_root)

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():
    _xb._clear_backends()
assert jax.devices()[0].platform == "cpu"

# persistent compile cache: the suite's long pole is re-compiling the full
# jitted steps every run; repeat runs hit the on-disk cache instead
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
