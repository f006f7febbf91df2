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
# Zero min-compile-time: test executables are individually tiny.
# DVDGAN_TEST_CACHE relocates; DVDGAN_COMPILE_CACHE=off disables.
from dvdgan_tpu.utils.cache import (  # noqa: E402
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache(
    os.environ.get("DVDGAN_TEST_CACHE") or None, min_compile_secs=0.0)
