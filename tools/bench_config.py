"""Scan-amortized train-step bench for ARBITRARY configs (bench.py stays
the driver's fixed flagship harness; this is the experimenter's knob).

Config via env DVDGAN_BENCH="img_size=128,n_frames=12,ch=32,batch=8,
remat=0,steps=10,calls=3" (any subset; defaults = flagship). Prints one
JSON line with steps/s and clips/s.

Usage: python tools/bench_config.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import _bench_common as bc


def main():
    ov = bc.parse_overrides("DVDGAN_BENCH")
    steps = int(ov.get("steps", 10))
    calls = int(ov.get("calls", 3))
    g_cfg, ds_cfg, dt_cfg, tc, dims = bc.build_configs(ov)
    state, real, y = bc.init_state_and_batch(g_cfg, ds_cfg, dt_cfg, tc, dims)
    multi = bc.make_multi_step(g_cfg, ds_cfg, dt_cfg, tc, steps)

    import jax

    state, losses = multi(state, real, y, jax.random.PRNGKey(0))
    float(losses[-1])          # true barrier through the axon tunnel

    t0 = time.perf_counter()
    for i in range(calls):
        state, losses = multi(state, real, y, jax.random.PRNGKey(100 + i))
    float(losses[-1])
    dt = time.perf_counter() - t0
    sps = calls * steps / dt
    print(json.dumps({
        "config": (f"{dims['img']}x{dims['img']}x{dims['nf']}f"
                   f"_ch{dims['ch']}_b{dims['batch']}"),
        "steps_per_sec": round(sps, 4),
        "clips_per_sec": round(sps * dims["batch"], 2),
    }))


if __name__ == "__main__":
    main()
