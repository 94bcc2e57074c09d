"""Test configuration: force CPU with an 8-device virtual mesh and x64.

Multi-device sharding tests run against a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`), the standard way to validate
`jax.sharding` programs without real multi-chip hardware. float64 is enabled
so oracle comparisons can be done at full precision (the framework default
remains float32; tests exercise both).
"""

import os

# Opt-in on-TPU mode: DRM_TPU_RUN_ON_TPU=1 leaves the backend alone so
# tests/test_pallas_tpu.py can exercise the COMPILED Mosaic kernels on the
# real chip (they are skipped unless the backend is tpu). Everything else
# in the suite is designed for the virtual CPU mesh and should not be run
# in this mode.
_ON_TPU = os.environ.get("DRM_TPU_RUN_ON_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if not _ON_TPU and "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's fusion emitter is pathological on the scalar-expanded dynamics
# graphs (deep shared elementwise chains): a single RNEA VJP measures 200+ s
# to compile WITH fusion and ~5 s without, on this 1-core host. Tests only
# check numerics, so CPU fusion buys nothing here; disabling it cuts suite
# compile time by an order of magnitude. (TPU compiles are unaffected —
# tests are pinned to the CPU platform below.)
if not _ON_TPU and "xla_disable_hlo_passes" not in _flags:
    _flags = (_flags + " --xla_disable_hlo_passes=fusion").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

if not _ON_TPU:
    # The environment may pre-import jax with a hardware platform selected
    # (e.g. a TPU tunnel); jax.config wins over the env var in that case.
    # Tests must run on the local CPU with 8 virtual devices.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: recompiling ~200 jitted variants (7 robots x
# batch shapes x algorithms) dominates suite time otherwise. CPU runs use
# their OWN cache dir: XLA:CPU entries are AOT-compiled against the exact
# host machine features, and a container reset can land the repo on a
# different host generation — stale entries then fail feature validation on
# every load (cpu_aot_loader errors) or risk SIGILL. The TPU cache is
# hardware-keyed by the chip, not the host, so it stays shared.
jax.config.update(
    "jax_compilation_cache_dir",
    "/tmp/drm_tpu_jax_cache" if _ON_TPU else "/tmp/drm_cpu_jax_cache",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _bounded_live_executables():
    # XLA:CPU segfaults nondeterministically in backend_compile /
    # compilation-cache serialization once a long single-process run has
    # accumulated enough live compiled executables (a full-suite run crashed
    # at ~90%+ while every module passed in isolation). Dropping the
    # in-process jit caches at module boundaries bounds that population;
    # the persistent disk cache still avoids XLA recompiles.
    jax.clear_caches()
    yield
