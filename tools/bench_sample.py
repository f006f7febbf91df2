"""Inference (serving) throughput: EMA-G sampling clips/sec on the real
chip, flagship config (64×64×16f, ch=32), scan-amortized like bench.py
(the axon tunnel's per-dispatch floor would otherwise dominate).

Usage: python tools/bench_sample.py [batch ...]   (default: 8 16 32)
Prints one line per batch size: clips/s + ms/clip + TFLOPs effective.
"""

from __future__ import annotations

import functools
import sys
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SCAN_STEPS = 10
CALLS = 3


def main():
    from dvdgan_tpu.models import GConfig
    from dvdgan_tpu.ops import spectral_norm as sn
    from dvdgan_tpu.train import step as step_mod
    from dvdgan_tpu.train.state import create, TrainConfig
    from dvdgan_tpu.models import DSConfig, DTConfig

    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    g_cfg = GConfig(img_size=64, n_frames=16, ch=32, z_dim=120,
                    n_classes=101, emb_dim=120, attn_res=32)
    ds_cfg = DSConfig(img_size=64, ch=32, n_classes=101, k_frames=8)
    dt_cfg = DTConfig(img_size=64, n_frames=16, ch=32, n_classes=101)
    with jax.default_device(jax.devices("cpu")[0]):
        st = create(jax.random.PRNGKey(0), g_cfg, ds_cfg, dt_cfg,
                    TrainConfig(d_steps=1, batch_size=2))
    g_ema = jax.device_put(st["g_ema"], jax.devices()[0])
    stats = jax.device_put(st["g"]["stats"], jax.devices()[0])
    sn_u = jax.device_put(st["g"]["sn_u"], jax.devices()[0])

    for b in batches:
        @functools.partial(jax.jit, static_argnames=())
        def multi(g_ema, stats, sn_u, key):
            def body(carry, i):
                k = jax.random.fold_in(key, i)
                z = jax.random.normal(k, (b, g_cfg.z_dim), jnp.bfloat16)
                y = jax.random.randint(k, (b,), 0, g_cfg.n_classes)
                v = step_mod.sample(g_ema, stats, sn_u, z, y, g_cfg)
                # data dependency so the scan can't be elided
                return carry + v.astype(jnp.float32).mean(), i
            tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(SCAN_STEPS))
            return tot

        float(multi(g_ema, stats, sn_u, jax.random.PRNGKey(0)))  # compile
        t0 = time.perf_counter()
        for c in range(CALLS):
            float(multi(g_ema, stats, sn_u, jax.random.PRNGKey(c + 1)))
        dt = (time.perf_counter() - t0) / (CALLS * SCAN_STEPS)
        clips = b / dt
        print(f"batch {b:3d}: {clips:8.1f} clips/s  "
              f"({dt / b * 1e3:6.2f} ms/clip, {dt * 1e3:7.2f} ms/batch)")


if __name__ == "__main__":
    main()
