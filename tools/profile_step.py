"""Per-op device-time profile of the flagship train step (perf roadmap).

Runs the bench config (64×64×16f, batch 8, d_steps 2) for a few scanned
steps under jax.profiler, then aggregates the trace's device-lane events
by op category. Prints a sorted table of device-time per TRAIN STEP.

Usage: python tools/profile_step.py [out_dir]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import _bench_common as bc

STEPS = 6


def build_and_run(trace_dir: str) -> None:
    import jax

    # Profiled config: flagship by default; override via env for other
    # presets, e.g. DVDGAN_PROFILE="img_size=128,n_frames=12,remat=1".
    g_cfg, ds_cfg, dt_cfg, tc, dims = bc.build_configs(
        bc.parse_overrides("DVDGAN_PROFILE"))
    state, real, y = bc.init_state_and_batch(g_cfg, ds_cfg, dt_cfg, tc, dims)
    multi = bc.make_multi_step(g_cfg, ds_cfg, dt_cfg, tc, STEPS)

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
