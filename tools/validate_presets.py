"""Real-chip validation of the big BASELINE presets (VERDICT r1 missing #3).

Runs genuine train steps on the device this process sees for:
  * kinetics_128  (128×128×12f)  — records scan-amortized steps/sec/chip
  * kinetics_256_48f (256×256×48f, remat) — the 48-frame memory check:
    compiles and steps at a feasible per-chip batch

Prints one JSON line per config. Like bench.py, timing chains N steps
inside one jitted scan and fetches a scalar for a true barrier (the axon
tunnel's ~20-30 ms dispatch floor otherwise dominates, CLAUDE.md).

Usage: python tools/validate_presets.py [128|256|both] [batch_128] [batch_256]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dvdgan_tpu.train import TrainConfig, create
from dvdgan_tpu.train import step as step_mod
from dvdgan_tpu.utils.config import Config, PRESETS


def run_config(name: str, batch: int, steps_per_call: int = 4,
               calls: int = 3, d_steps: int = 2) -> dict:
    cfg = Config(**dict(PRESETS[name], batch_size=batch, d_steps=d_steps))
    g_cfg, ds_cfg, dt_cfg = cfg.g_config(), cfg.ds_config(), cfg.dt_config()
    tc = TrainConfig(d_steps=d_steps, batch_size=batch)

    with jax.default_device(jax.devices("cpu")[0]):
        state = create(jax.random.PRNGKey(0), g_cfg, ds_cfg, dt_cfg, tc)
    state = jax.device_put(state, jax.devices()[0])
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(batch, cfg.n_frames, cfg.img_size,
                                 cfg.img_size, 3), jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, cfg.n_classes, batch), jnp.int32)

    one = functools.partial(step_mod.train_step, g_cfg=g_cfg, ds_cfg=ds_cfg,
                            dt_cfg=dt_cfg, tc=tc)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, real, y, key):
        def body(st, i):
            st, m = one(st, real, y, jax.random.fold_in(key, i))
            return st, m["g_loss"]
        return jax.lax.scan(body, state, jnp.arange(steps_per_call))

    t_c0 = time.perf_counter()
    state, losses = multi(state, real, y, jax.random.PRNGKey(0))
    last = float(losses[-1])
    compile_s = time.perf_counter() - t_c0

    t0 = time.perf_counter()
    for i in range(calls):
        state, losses = multi(state, real, y, jax.random.PRNGKey(100 + i))
    last = float(losses[-1])
    dt = time.perf_counter() - t0
    sps = calls * steps_per_call / dt
    return {
        "metric": f"train_steps_per_sec_per_chip_{name}",
        "value": round(sps, 4),
        "unit": "steps/sec/chip",
        "batch_per_chip": batch,
        "d_steps": d_steps,
        "compile_s": round(compile_s, 1),
        "clips_per_sec": round(sps * batch, 2),
        "final_g_loss_finite": bool(np.isfinite(last)),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    b128 = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    b256 = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    if which in ("128", "both"):
        print(json.dumps(run_config("kinetics_128", b128)))
    if which in ("256", "both"):
        print(json.dumps(run_config("kinetics_256_48f", b256,
                                    steps_per_call=2, calls=2)))


if __name__ == "__main__":
    main()
