"""Test harness: force an 8-virtual-device CPU platform so sharding /
collective paths (psum grads, cross-replica BN) are exercised without a real
TPU pod (SURVEY.md §4).

Note: the axon TPU plugin's sitecustomize force-sets
`jax_platforms="axon,cpu"` at interpreter start, overriding the
JAX_PLATFORMS env var — so we override it back AFTER importing jax, before
any backend is initialized. Device-count forcing must still happen via
XLA_FLAGS before import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite's wall-clock on the 1-core host
# is dominated by recompiling the same tiny-shape executables every run
# (keyed by HLO hash, so staleness is impossible by construction).
_cache_dir = os.environ.get("DVDGAN_TEST_CACHE",
                            os.path.join(os.path.dirname(__file__), "..",
                                         ".cache", "jax"))
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
