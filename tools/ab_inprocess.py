"""In-process A/B of TRACE-TIME env knobs on the current device.

tools/autotune.py benches each knob value in a fresh subprocess — robust
for ANY knob, but expensive where the backend does not serialize
executables into the persistent compilation cache: through the axon remote
tunnel every subprocess pays the full startup + CPU orthogonal init +
train-step compile (~7.5 min/run measured, round 3), so a 3-rep sweep is
hours. This tool handles the TRACE-TIME knobs (every DVDGAN lowering knob
is read lazily inside the traced code as of round 4 — TRACE_TIME_KNOBS
below is the verified list) in ONE process: one shared CPU init, then per
variant a fresh jit (re-trace reads the flipped env), one warm-up + sync,
and `--reps` timed measurements that share the compiled executable — ~3×
cheaper per variant and the reps are free. A --variant naming an env var
OUTSIDE the verified list gets a loud warning: if that var is read at
module import, the flip is silently ineffective in-process and the sweep
would report distinct labels for identical configs (use tools/autotune.py
for those).

Timing methodology is bench.py's (the only honest one through the tunnel):
`--steps` train steps scanned inside one executable, `--calls` dispatches
per rep, a scalar fetch as the barrier.

    python tools/ab_inprocess.py                      # flagship shape
    python tools/ab_inprocess.py --set img_size=128,n_frames=12
    python tools/ab_inprocess.py --variant fast:DVDGAN_DT_PREPOOL=off

Measured (v5e, round 3, flagship 64×64×16f ch32 batch 8 AND 128×128×12f):
all four DT_PREPOOL × TM_FAKES combinations are within ±1% noise — the
code defaults (prepool on, tm_fakes off) are now measured, not assumed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the knobs this tool flips between traces; anything NOT in a variant's
# env is restored to unset (code default) before that variant traces.
# Every entry is VERIFIED lazily-read (function scope, re-read per trace) —
# grep for env_choice/os.environ in dvdgan_tpu before adding one.
TRACE_TIME_KNOBS = ("DVDGAN_DT_PREPOOL", "DVDGAN_TM_FAKES",
                    "DVDGAN_ATTN_PROJ", "DVDGAN_GRU_ROWPACK",
                    "DVDGAN_TPHASE_INTERLEAVE", "DVDGAN_TEMPORAL_ATTN",
                    "DVDGAN_GRU_BLOCKED", "DVDGAN_ATTN_PALLAS",
                    "DVDGAN_STEM_DW", "DVDGAN_SPHASE_INTERLEAVE",
                    "DVDGAN_UPS_GRAD_BARRIER", "DVDGAN_REMAT_SAVE",
                    "DVDGAN_GRU_BWD_MB", "DVDGAN_UPS_PALLAS",
                    "DVDGAN_TAPDOT_MIN_HW")

DEFAULT_VARIANTS = [
    ("base", {}),
    ("prepool_off", {"DVDGAN_DT_PREPOOL": "off"}),
    ("tm_on", {"DVDGAN_TM_FAKES": "on"}),
    ("prepool_off_tm_on", {"DVDGAN_DT_PREPOOL": "off",
                           "DVDGAN_TM_FAKES": "on"}),
]


def parse_variant(spec: str):
    """'name:VAR=v,VAR2=v2' (or 'name:' for code defaults) -> (name, env)."""
    name, colon, rest = spec.partition(":")
    if not colon:
        raise ValueError(
            f"variant spec {spec!r} has no ':' — a bare 'VAR=v' would "
            f"silently bench code defaults under that label; use "
            f"'name:VAR=v' (or 'name:' for code defaults)")
    from tools import _bench_common as bc
    env = bc.parse_kv(rest)   # strict: malformed segments raise
    for var in env:
        if var.startswith("DVDGAN_") and var not in TRACE_TIME_KNOBS:
            # an import-time knob flipped here would bench identical
            # configs under distinct labels (ADVICE r3) — warn loudly
            print(f"WARNING: {var} is not in the verified trace-time knob "
                  f"list; if it is read at module import the flip is "
                  f"INEFFECTIVE in-process — use tools/autotune.py "
                  f"(subprocess-per-value) for it", file=sys.stderr,
                  flush=True)
    return name, env


def run(variants, overrides: dict, reps: int, steps: int, calls: int,
        log=None) -> list:
    import jax

    from tools import _bench_common as bc

    log = log or (lambda s: print(s, file=sys.stderr, flush=True))
    g_cfg, ds_cfg, dt_cfg, tc, dims = bc.build_configs(overrides)
    state0, real, y = bc.init_state_and_batch(g_cfg, ds_cfg, dt_cfg, tc,
                                              dims)
    # one init for all variants: keep a host copy, re-place per variant
    # (the step donates its state argument)
    host_state = jax.device_get(state0)
    del state0
    dev = jax.devices()[0]
    results = []
    # every knob ANY variant touches (plus the known trace-time set) is
    # reset before each variant and restored after the sweep — a
    # user-supplied --variant var outside TRACE_TIME_KNOBS must not leak
    # into later variants or survive into the caller's env
    knobs = set(TRACE_TIME_KNOBS).union(*(env for _, env in variants))
    saved = {k: os.environ.get(k) for k in knobs}
    try:
        for name, env in variants:
            results.append(_run_variant(
                name, env, knobs, host_state, dev, g_cfg, ds_cfg, dt_cfg,
                tc, dims, real, y, reps, steps, calls, log))
    finally:
        # restore the caller's env: a later trace in this process must
        # not silently inherit the LAST variant's knobs
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return results


def _run_variant(name, env, knobs, host_state, dev, g_cfg, ds_cfg, dt_cfg,
                 tc, dims, real, y, reps, steps, calls, log):
    import jax

    from tools import _bench_common as bc

    for k in knobs:
        os.environ.pop(k, None)
    os.environ.update(env)
    state = jax.device_put(host_state, dev)
    multi = bc.make_multi_step(g_cfg, ds_cfg, dt_cfg, tc, steps)
    t0 = time.perf_counter()
    state, losses = multi(state, real, y, jax.random.PRNGKey(0))
    float(losses[-1])   # scalar fetch = the only true barrier (tunnel)
    compile_s = time.perf_counter() - t0
    rep_vals = []
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(calls):
            state, losses = multi(
                state, real, y,
                jax.random.PRNGKey(100 + r * calls + i))
        float(losses[-1])
        rep_vals.append(
            round(calls * steps / (time.perf_counter() - t0), 3))
    rec = {"variant": name, "env": env, "reps": rep_vals,
           "median": sorted(rep_vals)[len(rep_vals) // 2],
           "compile_s": round(compile_s, 1), "dims": dims}
    log(json.dumps(rec))
    return rec


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--set", dest="overrides", default="",
                   help="config overrides, bench grammar: "
                        "'img_size=128,n_frames=12,batch=8'")
    p.add_argument("--variant", action="append", default=None,
                   metavar="NAME:VAR=v[,VAR2=v2]",
                   help="override the variant list (repeatable); "
                        "default = all DT_PREPOOL × TM_FAKES combos")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--steps", type=int, default=10,
                   help="train steps scanned per executable")
    p.add_argument("--calls", type=int, default=8,
                   help="timed dispatches per rep")
    args = p.parse_args(argv)

    from tools import _bench_common as bc

    variants = ([parse_variant(v) for v in args.variant]
                if args.variant else DEFAULT_VARIANTS)
    overrides = bc.parse_kv(args.overrides)
    results = run(variants, overrides, args.reps, args.steps, args.calls)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
