"""Per-op device-time profile of the flagship train step (perf roadmap).

Runs the bench config (64×64×16f, batch 8, d_steps 2) for a few scanned
steps under jax.profiler, then aggregates the trace's device-lane events
by op category. Prints a sorted table of device-time per TRAIN STEP.

Usage: python tools/profile_step.py [out_dir]
"""

from __future__ import annotations

import collections
import functools
import glob
import gzip
import json
import os
import re
import sys

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 6


# Profiled config: flagship by default; override via env for other presets,
# e.g. DVDGAN_PROFILE="img_size=128,n_frames=12,ch=32,batch=8,remat=1".
_OVERRIDES = dict(
    kv.split("=") for kv in os.environ.get("DVDGAN_PROFILE", "").split(",")
    if "=" in kv)


def _ov(name: str, default: int) -> int:
    return int(_OVERRIDES.get(name, default))


def build_and_run(trace_dir: str) -> None:
    from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
    from dvdgan_tpu.train import TrainConfig, create
    from dvdgan_tpu.train import step as step_mod

    img = _ov("img_size", 64)
    nf = _ov("n_frames", 16)
    ch = _ov("ch", 32)
    batch = _ov("batch", 8)
    # 256px has 7 latent chunks; 112 divides by 7 (120 does not)
    g_cfg = GConfig(img_size=img, n_frames=nf, ch=ch,
                    z_dim=_ov("z_dim", 112 if img == 256 else 120),
                    n_classes=101, emb_dim=120, attn_res=32,
                    remat=bool(_ov("remat", 0)))
    ds_cfg = DSConfig(img_size=img, ch=ch, n_classes=101, k_frames=8)
    dt_cfg = DTConfig(img_size=img, n_frames=nf, ch=ch, n_classes=101)
    tc = TrainConfig(d_steps=2, batch_size=batch)
    with jax.default_device(jax.devices("cpu")[0]):
        state = create(jax.random.PRNGKey(0), g_cfg, ds_cfg, dt_cfg, tc)
    state = jax.device_put(state, jax.devices()[0])
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(batch, nf, img, img, 3), jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, 101, batch), jnp.int32)
    one = functools.partial(step_mod.train_step, g_cfg=g_cfg, ds_cfg=ds_cfg,
                            dt_cfg=dt_cfg, tc=tc)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, real, y, key):
        def body(st, i):
            st, m = one(st, real, y, jax.random.fold_in(key, i))
            return st, m["g_loss"]
        return jax.lax.scan(body, state, jnp.arange(STEPS))

    state, losses = multi(state, real, y, jax.random.PRNGKey(0))
    float(losses[-1])                     # warm + compile
    jax.profiler.start_trace(trace_dir)
    state, losses = multi(state, real, y, jax.random.PRNGKey(1))
    float(losses[-1])                     # true barrier through the tunnel
    jax.profiler.stop_trace()


_CATS = [
    ("conv", re.compile(r"conv|%conv")),
    ("matmul/dot", re.compile(r"dot|gemm|matmul")),
    ("pallas_gru", re.compile(r"gru|pallas|custom-call|mosaic", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape")),
    ("convert", re.compile(r"convert")),
    ("reduce", re.compile(r"reduce|all-reduce")),
    ("fusion(other)", re.compile(r"fusion|loop_")),
    ("dynamic", re.compile(r"dynamic|gather|scatter|select")),
]


def categorize(name: str) -> str:
    for cat, rx in _CATS:
        if rx.search(name):
            return cat
    return "other"


def parse(trace_dir: str) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found under", trace_dir)
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # the per-op device lane is the TPU pid's "XLA Ops" thread (the Steps /
    # XLA Modules lanes mirror whole-executable container spans)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = e.get("args", {}).get("name", "")
            if "TPU" in n or "/device" in n.lower() or "Chip" in n:
                dev_pids.add(e["pid"])
    op_lanes = set()
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in dev_pids
                and e.get("args", {}).get("name") == "XLA Ops"):
            op_lanes.add((e["pid"], e.get("tid")))
    # SELF time per event: trace spans nest (jit_/while containers hold the
    # real HLO ops), so per-lane we subtract each event's children from its
    # duration and aggregate self-times only.
    lanes = collections.defaultdict(list)
    for e in events:
        if (e.get("ph") == "X"
                and (e["pid"], e.get("tid")) in op_lanes):
            dur = float(e.get("dur", 0.0))   # microseconds
            if dur <= 0 or e.get("name", "$").startswith("$"):
                continue
            args = e.get("args", {})
            cat = args.get("hlo_category", "")
            long = args.get("long_name", "")[:180]
            lanes[(e["pid"], e.get("tid"))].append(
                (float(e["ts"]), dur, e.get("name", "?"), cat, long))
    per_op = collections.Counter()
    per_cat = collections.Counter()
    long_of = {}
    total = 0.0
    for lane in lanes.values():
        # sort by start asc, then duration desc → parents precede children
        lane.sort(key=lambda x: (x[0], -x[1]))
        stack = []   # (end_ts, children_dur_accumulator_index)
        child_dur = [0.0] * len(lane)
        order = []
        for idx, (ts, dur, name, cat, long) in enumerate(lane):
            while stack and ts >= stack[-1][0] - 1e-9:
                stack.pop()
            if stack:
                child_dur[stack[-1][1]] += dur
            stack.append((ts + dur, idx))
            order.append((idx, name, dur, cat, long))
        for idx, name, dur, cat, long in order:
            self_t = max(0.0, dur - child_dur[idx])
            if self_t <= 0:
                continue
            per_op[name] += self_t
            per_cat[cat or categorize(name)] += self_t
            long_of[name] = long
            total += self_t
    if total == 0:
        print("no device events; pids seen:", sorted(dev_pids))
        return
    print(f"\ndevice total: {total / 1e3 / STEPS:.2f} ms/step "
          f"({STEPS} steps traced)")
    print("\n-- by category (ms/step) --")
    for cat, us in per_cat.most_common():
        print(f"{us / 1e3 / STEPS:8.2f}  {cat}")
    print("\n-- top 30 ops (ms/step) --")
    for name, us in per_op.most_common(30):
        print(f"{us / 1e3 / STEPS:8.2f}  {name[:40]:40s} "
              f"{long_of.get(name, '')[:120]}")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_step"
    build_and_run(out)
    parse(out)


if __name__ == "__main__":
    main()
