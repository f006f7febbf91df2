"""Profiling/debug utils smoke tests (SURVEY §5.1–5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvdgan_tpu.utils import profiling


def test_timed_returns_result_and_positive_time():
    f = jax.jit(lambda x: x * 2)
    out, dt = profiling.timed(f, jnp.ones(4))
    assert np.allclose(np.asarray(out), 2.0)
    assert dt > 0


def test_steps_per_sec_shape():
    @jax.jit
    def step(state, x):
        return state + 1, {"loss": (x * state).sum()}

    sps, state = profiling.steps_per_sec(step, jnp.zeros(()), jnp.ones(3),
                                         iters=3, warmup=1)
    assert sps > 0
    assert int(state) == 4  # 1 warmup + 3 timed


def test_nan_check_mode_catches_nan():
    with pytest.raises(FloatingPointError):
        with profiling.nan_check_mode():
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.zeros(())).block_until_ready()
    # and the flag is restored afterwards
    assert not jax.config.jax_debug_nans


def test_scope_is_usable():
    with profiling.scope("block"):
        y = jnp.ones(2) + 1
    assert y.shape == (2,)


def test_trace_writes_files(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        jax.jit(lambda x: x + 1)(jnp.ones(8)).block_until_ready()
    import glob
    assert glob.glob(d + "/**/*.xplane.pb", recursive=True)
