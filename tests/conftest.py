"""Test config: run on CPU with 8 virtual devices so sharding/halo-exchange
tests work without a TPU pod (SURVEY.md §4.5).

The host environment force-registers a TPU platform plugin at interpreter
start and pins ``jax_platforms`` to it, so setting the env var alone is not
enough — we also update the jax config before any backend is initialized.
"""

import os

# CA3D_TPU_TESTS=1 opts out of the CPU pin so the on-TPU parity tests in
# test_tpu_kernel.py can see the real chip:
#   CA3D_TPU_TESTS=1 pytest tests/test_tpu_kernel.py
_USE_TPU = os.environ.get("CA3D_TPU_TESTS") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    # TPU executables don't embed host CPU features (see the cache note
    # below) — reuse bench.py's cache so reruns skip Mosaic compiles.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
# NO persistent compile cache for the CPU suite: XLA:CPU AOT cache entries
# record pseudo machine features (+prefer-no-scatter/-gather) that the
# loader then reports as host-feature mismatches ("could lead to SIGILL"),
# and a cached-entry run showed exactly that flakiness (segfault and a
# spurious numeric failure in render tests).  TPU runs (bench.py, tools/) keep their cache — TPU
# executables don't carry host CPU feature sets.


import pytest  # noqa: E402

_HEAVY_MODULES = {
    "test_render_fast", "test_renderer_fast", "test_render_slab",
    "test_engine", "test_engine_mesh", "test_multigroup", "test_render",
}

# Default `pytest tests/` runs the fast core set; tests marked `heavy`
# (the long interpret-mode render differentials — tens of minutes of
# XLA:CPU compile each on this 1-core box) run with CA3D_HEAVY=1.
_RUN_HEAVY = os.environ.get("CA3D_HEAVY") == "1"


def pytest_collection_modifyitems(config, items):
    if _RUN_HEAVY:
        return
    skip = pytest.mark.skip(
        reason="heavy interpret-mode test; run with CA3D_HEAVY=1"
    )
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)


def _rss_gb() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 2**30


@pytest.fixture(autouse=True)
def _clear_jax_caches_after_heavy(request):
    """Drop jit/compile caches after heavy render/engine tests once the
    process has grown.

    A full-suite process accumulates dozens of giant interpret-mode
    executables; at ~7 GB RSS the XLA:CPU compiler starts segfaulting on
    graphs that compile fine in a fresh process (observed deterministically
    at the 137th test, twice).  Clearing once RSS passes the threshold
    keeps the process compilable while preserving cross-test cache reuse
    early in the run.
    """
    yield
    mod = request.module.__name__.rsplit(".", 1)[-1]
    if mod in _HEAVY_MODULES and _rss_gb() > 2.5:
        jax.clear_caches()
