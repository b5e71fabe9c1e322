"""Test config: run on CPU with 8 virtual devices so sharding/halo-exchange
tests work without a TPU pod (SURVEY.md §4.5).

The host environment force-registers a TPU platform plugin at interpreter
start and pins ``jax_platforms`` to it, so setting the env var alone is not
enough — we also update the jax config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for the CPU suite: XLA:CPU AOT cache entries
# record pseudo machine features (+prefer-no-scatter/-gather) that the
# loader then reports as host-feature mismatches ("could lead to SIGILL"),
# and a cached-entry run showed exactly that flakiness (segfault and a
# spurious numeric failure in render tests).  TPU runs (bench.py, tools/) keep their cache — TPU
# executables don't carry host CPU feature sets.
