"""One-command performance autotune: coordinate descent over the
framework's measured A/B env knobs on the CURRENT hardware.

Every knob below selects between lowerings that are the SAME MATH
(equivalence-tested); which one is faster depends on the backend, shapes
and XLA version — e.g. the Pallas spatial-attention kernel wins in
isolation but loses in context on v5e, and `conv3d_tpair` wins at cout≥64
and regresses below. This tool replaces hand-run A/B sessions: it benches
each knob value in a fresh subprocess (robust even for knobs read at
module import — though as of round 4 every DVDGAN lowering knob is lazily
read and tools/ab_inprocess.py A/Bs them far cheaper through the axon
tunnel), keeps a change only when the median improvement beats a noise
threshold, and emits the winning environment.

    python tools/autotune.py --reps 3 --threshold 1.0 --out tuned.env
    source tuned.env && python main.py ...

The bench command must print ONE JSON line with a "value" field on its
last stdout line (bench.py's contract). DVDGAN_BENCH=... config overrides
pass through to it, so any preset shape can be tuned.

Knob provenance (defaults are the v5e flagship winners, PERF.md):
  DVDGAN_DT_PREPOOL        D-phase φ pre-pool vs per-forward pooling
  DVDGAN_TM_FAKES          time-major fake gather/pool vs batch-major
  DVDGAN_TPHASE_INTERLEAVE conv3d_tpair interleave lowering (+2.5% stack)
  DVDGAN_TEMPORAL_ATTN     temporal-attention movement (measured neutral)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

DEFAULT_KNOBS: tuple = (
    ("DVDGAN_DT_PREPOOL", ("on", "off")),
    ("DVDGAN_TM_FAKES", ("off", "on")),
    ("DVDGAN_TPHASE_INTERLEAVE", ("stack", "moveaxis")),
    ("DVDGAN_TEMPORAL_ATTN", ("fold", "einsum")),
)


def run_bench(bench_cmd: list, env_overrides: dict, reps: int,
              timeout: float) -> list:
    """`reps` fresh-subprocess runs of the bench; returns the parsed
    "value" floats. Raises on a failed run or an unparseable last line
    (a silently-skipped rep would bias the median)."""
    vals = []
    for _ in range(reps):
        env = dict(os.environ)
        env.update(env_overrides)
        r = subprocess.run(bench_cmd, env=env, timeout=timeout,
                           capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(
                f"bench failed under {env_overrides}: {r.stderr[-400:]}")
        line = r.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        if rec.get("measured_this_run") is False:
            raise RuntimeError(
                "bench reported a stale fallback value (device down) — "
                "autotune needs live measurements")
        vals.append(float(rec["value"]))
    return vals


def tune(knobs=DEFAULT_KNOBS, reps: int = 3, threshold_pct: float = 1.0,
         bench_cmd=None, timeout: float = 3600.0, log=None) -> dict:
    """Coordinate descent: bench each value of each knob on top of the
    settings chosen so far; adopt a value only when its median beats the
    current champion by > threshold_pct (run-to-run noise on the v5e
    scan-bench is ~±1%). Returns the report dict."""
    log = log or (lambda s: print(s, file=sys.stderr, flush=True))
    bench_cmd = bench_cmd or [sys.executable, "bench.py"]
    chosen: dict = {}
    base_vals = run_bench(bench_cmd, chosen, reps, timeout)
    champion = statistics.median(base_vals)
    log(f"baseline (code defaults): {champion:.3f}  reps={base_vals}")
    report = {"baseline": champion, "baseline_reps": base_vals,
              "threshold_pct": threshold_pct, "trials": []}
    for var, values in knobs:
        best_v, best_med, best_reps = None, champion, None
        for v in values:
            vals = run_bench(bench_cmd, {**chosen, var: v}, reps, timeout)
            med = statistics.median(vals)
            report["trials"].append(
                {"var": var, "value": v, "reps": vals, "median": med,
                 "env": dict(chosen)})
            log(f"  {var}={v}: {med:.3f}  reps={vals}")
            if med > best_med * (1.0 + threshold_pct / 100.0):
                best_v, best_med, best_reps = v, med, vals
        if best_v is not None:
            chosen[var] = best_v
            champion = best_med
            log(f"ADOPT {var}={best_v} -> {champion:.3f}")
        else:
            log(f"keep {var} at default (no value beat "
                f"{champion:.3f} by >{threshold_pct}%)")
    report["chosen_env"] = chosen
    report["champion"] = champion
    return report


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--reps", type=int, default=3,
                   help="bench runs per knob value (median wins)")
    p.add_argument("--threshold", type=float, default=1.0,
                   help="min median improvement (%%) to adopt a value")
    p.add_argument("--bench_cmd", default=None,
                   help="bench command (default: '<python> bench.py'); "
                        "must print a JSON line with a 'value' field")
    p.add_argument("--timeout", type=float, default=3600.0,
                   help="per-bench-run timeout (s)")
    p.add_argument("--knob", action="append", default=None,
                   metavar="VAR=v1|v2",
                   help="override the knob set (repeatable)")
    p.add_argument("--out", default=None,
                   help="write the chosen env as shell 'export' lines")
    args = p.parse_args(argv)

    knobs = DEFAULT_KNOBS
    if args.knob:
        knobs = tuple((kv.split("=", 1)[0],
                       tuple(kv.split("=", 1)[1].split("|")))
                      for kv in args.knob)
    bench_cmd = args.bench_cmd.split() if args.bench_cmd else None
    report = tune(knobs, reps=args.reps, threshold_pct=args.threshold,
                  bench_cmd=bench_cmd, timeout=args.timeout)
    print(json.dumps(report))
    if args.out:
        with open(args.out, "w") as f:
            for var, v in report["chosen_env"].items():
                f.write(f"export {var}={v}\n")
        print(f"wrote {args.out}", file=sys.stderr)
    return report


if __name__ == "__main__":
    main()
