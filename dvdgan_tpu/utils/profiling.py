"""Tracing / profiling / numerics debugging (SURVEY.md §5.1–5.2).

The reference has none of this; the TPU rebuild gets:
  * `trace(log_dir)` — context manager around jax.profiler for TensorBoard
    profile dumps (`--profile` mode in the Trainer);
  * `timed_steps` — wall-clock per-step timing with block_until_ready, for
    the steps/sec/chip counter;
  * `nan_check_mode()` — enables jax_debug_nans (fail fast at the op that
    produced the first NaN — GAN training's most common silent failure);
  * `scope(name)` — jax.named_scope passthrough so G/DS/DT phases are
    legible in profiles.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scope(name: str):
    return jax.named_scope(name)


@contextlib.contextmanager
def nan_check_mode():
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def timed(fn, *args, sync=True, **kwargs):
    """-> (result, seconds). Blocks on the result for honest device time."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    if sync:
        jax.block_until_ready(out)
    return out, time.perf_counter() - t0


def steps_per_sec(step_fn, state, *args, iters: int = 10, warmup: int = 2
                  ) -> tuple[float, object]:
    """Measure a `state, aux = step_fn(state, *args)`-shaped function."""
    aux = None
    for _ in range(warmup):
        state, aux = step_fn(state, *args)
    jax.block_until_ready(aux)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, aux = step_fn(state, *args)
    jax.block_until_ready(aux)
    return iters / (time.perf_counter() - t0), state
