"""Test configuration: force the CPU backend with a faked 8-device mesh.

Tests must be fast and hermetic (CI has no TPU; this session's default
platform is a tunneled TPU). Multi-chip sharding paths are validated on a
virtual 8-device CPU mesh, per SURVEY.md §4.3. TPU perf is exercised by
bench.py, not pytest.
"""

import os

_plat = os.environ.get("HAGRID_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _plat
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The session may ship a platform plugin that overrides JAX_PLATFORMS (the
# tunneled "axon" TPU registers itself as default); config.update wins.
jax.config.update("jax_platforms", _plat)

# Persistent compilation cache: CPU compiles of the whole-frame sweep
# tracer run 30-90s each and dominate suite wall time; with the cache
# only the first-ever run pays them. Same dir as bench/CLI (entries are
# keyed by platform + HLO, so CPU and TPU artifacts coexist).
from hagrid_tpu.utils import cache  # noqa: E402

cache.enable()
