"""Test config: run on CPU with 8 virtual devices so sharding/halo-exchange
tests work without a TPU pod (SURVEY.md §4.5).

The host environment force-registers a TPU platform plugin at interpreter
start and pins ``jax_platforms`` to it, so setting the env var alone is not
enough — we also update the jax config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: interpret-mode kernel tests dominate suite
# latency; repeat runs hit the cache instead of recompiling.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The sitecustomize imports jax at interpreter start, BEFORE this file
# runs — the cache env var above is read too late, so set the config
# directly (this is why earlier rounds saw an almost-empty cache dir).
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
# Interpret-mode kernel graphs take minutes to compile; always persist
# them regardless of the cache's default time/size gates.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
