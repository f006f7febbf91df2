"""Persistent XLA compilation cache (shared by CLI, bench and tools).

Train-step executables take minutes to compile (≈2 min CPU trace+compile;
up to ~16 min through the axon remote-compile tunnel, observed round 2) and
are recompiled from scratch by every new process. JAX's persistent cache
stores serialized executables keyed by HLO hash, so a restarted trainer /
bench / profile run with unchanged code and shapes skips the compile
entirely. Staleness is impossible by construction (key = HLO); backends
whose executables can't be serialized degrade gracefully to a no-op with a
JAX warning, so enabling this is always safe.

Opt out with DVDGAN_COMPILE_CACHE=off; relocate with
DVDGAN_COMPILE_CACHE=<dir>. Default: <repo>/.cache/jax — the same
directory tests/conftest.py uses.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".cache", "jax")


_DISABLE_WORDS = ("off", "0", "none", "false", "disable", "disabled", "no")


def enable_persistent_compilation_cache(
        path: str | None = None,
        min_compile_secs: float = 1.0) -> str | None:
    """Point jax at an on-disk compilation cache. Returns the directory
    used, or None when disabled via DVDGAN_COMPILE_CACHE=off (any of
    {off,0,none,false,disable,disabled,no}, case-insensitive). An explicit
    `path` argument is a programmatic override and wins over the env
    disable — callers that force a path mean it."""
    env = os.environ.get("DVDGAN_COMPILE_CACHE", "")
    if path is None and env.lower() in _DISABLE_WORDS:
        return None
    cache_dir = path or (env if env else _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
