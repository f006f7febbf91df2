"""Benchmark harness: train steps/sec/chip at 64×64×16f (the BASELINE.json
metric), measured on the real device this process sees.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "steps/sec/chip", "vs_baseline": N}

Baseline note (BASELINE.md "vs_baseline derivation"): the reference repo
publishes no throughput and the reference mount is empty, so the V100
per-device number CANNOT be measured here. `vs_baseline` is computed
against a FLOP-derived UPPER BOUND of the reference's throughput
(2.07 TFLOP/step ÷ ~8 TFLOPS achievable fp32 conv on V100 ≈ 3.9 steps/s),
making the reported ratio a LOWER BOUND on the true speedup; the JSON line
carries "baseline_source" so nobody mistakes it for a measurement. The
target is vs_baseline ≥ 5.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import jax

from tools import _bench_common as bc


def wait_for_device(total_s: float, probe_timeout: float = 120.0) -> None:
    """Block until the JAX backend initializes, retrying through transient
    axon-tunnel outages (observed failure modes: init HANGS, or raises
    UNAVAILABLE after minutes). Probes in a SUBPROCESS so a hung init
    can be timed out without wedging this process; only when a probe
    succeeds does the in-process backend init proceed."""
    deadline = time.monotonic() + total_s
    attempt = 0
    # the probe must see a NON-CPU device: in an env where the axon plugin
    # never registered (e.g. PYTHONPATH without the sitecustomize) backend
    # init "succeeds" on the host CPU and bench would silently record a
    # bogus steps/sec/chip number. DVDGAN_BENCH_ALLOW_CPU=1 opts out for
    # local debugging.
    allow_cpu = os.environ.get("DVDGAN_BENCH_ALLOW_CPU", "") == "1"
    probe_src = ("import jax, sys; d = jax.devices(); "
                 "sys.exit(0 if d and (%s or d[0].platform != 'cpu') "
                 "else 3)" % allow_cpu)
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                timeout=probe_timeout, capture_output=True)
            if r.returncode == 0:
                return
            if r.returncode == 3:
                raise RuntimeError(
                    "backend initialized but only CPU devices are visible "
                    "- refusing to report a steps/sec/chip number from the "
                    "host CPU (set DVDGAN_BENCH_ALLOW_CPU=1 to override)")
            err = r.stderr.decode(errors="replace")[-200:]
        except subprocess.TimeoutExpired:
            err = f"device probe hung > {probe_timeout:.0f}s"
        if time.monotonic() > deadline:
            raise RuntimeError(
                f"backend unavailable after {attempt} probes over "
                f"{total_s:.0f}s; last: {err}")
        print(f"bench: device probe {attempt} failed ({err.strip()}); "
              "retrying in 30s", file=sys.stderr, flush=True)
        time.sleep(30)

# FLOP-derived UPPER bound on the fp32 PyTorch reference at this config on
# one V100 (derivation in BASELINE.md) — dividing by an upper bound makes
# vs_baseline a LOWER bound on the true ratio.
REF_V100_STEPS_PER_SEC_UPPER_BOUND = 3.9

BATCH_PER_CHIP = 8
STEPS_PER_CALL = 10   # lax.scan of train steps inside ONE executable:
#                       amortizes the axon tunnel's ~20-30 ms per-execute
#                       dispatch floor, which otherwise dominates and hides
#                       the actual device step time
CALLS = 8    # timed host-loop calls (one final scalar fetch = ONE ~35 ms
#              tunnel sync amortized over CALLS*STEPS_PER_CALL steps: 8
#              halves the sync's ~2% drag vs 4; dispatches overlap device
#              compute so more calls cost nothing else). Raising CALLS
#              keeps the cached executable (scan length unchanged).


_LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH_LAST_GOOD.json")

# Exactly ONE JSON line may ever reach stdout. The watchdog (below) and the
# main path race only through emit_line(), which flips _emitted under a lock.
_emit_lock = threading.Lock()
_emitted = False


def emit_line(line: dict) -> bool:
    """Print the one JSON line, first caller wins. Returns False if some
    other path already printed (the caller should NOT print anything)."""
    global _emitted
    with _emit_lock:
        if _emitted:
            return False
        _emitted = True
    print(json.dumps(line), flush=True)
    return True


def start_watchdog(deadline_s: float) -> threading.Timer:
    """Round 4 post-mortem (VERDICT r4 missing #1): the driver killed
    bench.py at ~30 min with ZERO stdout — the fallback only guarded
    "device never came up", and the 3600 s device wait plus an unbounded
    compile meant fallback_line was mathematically unreachable in every
    slow failure mode. This watchdog makes the one-line contract
    unconditional: a daemon timer that, `deadline_s` after process start,
    prints the last-good fallback line and hard-exits 0. os._exit (not
    sys.exit) because the main thread may be wedged inside a remote
    compile RPC that never returns and cannot be interrupted."""
    def _fire():
        if emit_line(fallback_line(
                f"bench deadline {deadline_s:.0f}s expired "
                "(device wait, compile, or run overran; see "
                "DVDGAN_BENCH_DEADLINE_S)")):
            sys.stdout.flush()
        os._exit(0)
    t = threading.Timer(deadline_s, _fire)
    t.daemon = True
    t.start()
    return t


def fallback_line(reason: str) -> dict:
    """Device never came up: report the last committed ON-CHIP measurement
    instead of nothing, UNAMBIGUOUSLY labeled as not measured by this run
    (axon outages lasting 11+ hours were observed in round 2 — a missing
    number and a silently-failed bench are worse than a labeled stale one).
    If no last-good record exists (fresh checkout) or it is corrupt, still
    honor the one-JSON-line stdout contract with a labeled error record
    rather than a traceback."""
    try:
        with open(_LAST_GOOD) as f:
            rec = json.load(f)
        if not isinstance(rec, dict) or "value" not in rec:
            raise ValueError("last-good record malformed")
    except (OSError, ValueError) as e:
        return {
            "metric": "train_steps_per_sec_per_chip_64x64x16f",
            "value": None,
            "unit": "steps/sec/chip",
            "vs_baseline": None,
            "measured_this_run": False,
            "error": f"device unavailable and no last-good record: {e}",
            "stale_reason": reason,
        }
    rec["measured_this_run"] = False
    rec["stale_reason"] = reason
    return rec


def record_last_good(line: dict) -> None:
    """Best-effort: persist a fresh on-chip measurement for fallback_line."""
    try:
        rec = dict(line)
        rec["measured_on"] = time.strftime("%Y-%m-%d")
        with open(_LAST_GOOD, "w") as f:
            f.write(json.dumps(rec, indent=1) + "\n")
    except OSError as e:
        print(f"bench: could not persist last-good record: {e}",
              file=sys.stderr)


def wait_budget(deadline_s: float) -> float:
    """Device-wait budget: the env wait (default 300 s — riding out an
    hours-long axon outage inside ONE bench process is pointless when the
    driver kills at ~30 min with zero stdout) capped so at least 600 s of
    the deadline is reserved for compile+run. The reserve matters for the
    COLD-CACHE case: if the wait ate the deadline, the watchdog would
    kill the fresh ~5–16-min remote compile mid-flight, the persistent
    cache would never warm (XLA writes it only on compile completion),
    and every later run would repeat the kill — a stale-fallback
    livelock. 600 s covers the observed fresh flagship compile (~150 s)
    with 4× margin."""
    return min(float(os.environ.get("DVDGAN_BENCH_WAIT_S", "300")),
               max(deadline_s - 600.0, 60.0))


def main():
    # Overall wall-clock deadline covering wait+compile+run. Default
    # 1500 s: under the driver's ~30-min budget (which killed round 4's
    # bench with zero stdout) while fitting a fresh ~16-min remote
    # compile after the (capped) device wait — see wait_budget.
    deadline_s = float(os.environ.get("DVDGAN_BENCH_DEADLINE_S", "1500"))
    start_watchdog(deadline_s)
    wait_s = wait_budget(deadline_s)
    try:
        wait_for_device(wait_s)
    except RuntimeError as e:
        emit_line(fallback_line(str(e)))
        return
    from dvdgan_tpu.utils.cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    # the FIXED flagship config (no env overrides here — this is the
    # driver's harness); built by the same shared builder the profile and
    # config-bench tools use so they can never drift (tools/_bench_common)
    g_cfg, ds_cfg, dt_cfg, tc, dims = bc.build_configs(
        {"batch": BATCH_PER_CHIP})
    # init on the host CPU (QR-based orthogonal init compiles slowly on the
    # device and isn't what's being measured), then place on the chip
    state, real, y = bc.init_state_and_batch(g_cfg, ds_cfg, dt_cfg, tc, dims)
    multi_step = bc.make_multi_step(g_cfg, ds_cfg, dt_cfg, tc,
                                    STEPS_PER_CALL)

    state, losses = multi_step(state, real, y, jax.random.PRNGKey(0))
    # NOTE: fetch a scalar to the host for a true barrier —
    # block_until_ready alone does not synchronize through the axon
    # remote-execution tunnel (measured: returns in ~0.1 ms while the
    # device is still running).
    float(losses[-1])

    t0 = time.perf_counter()
    for i in range(CALLS):
        state, losses = multi_step(state, real, y,
                                   jax.random.PRNGKey(100 + i))
    float(losses[-1])
    dt = time.perf_counter() - t0
    ITERS = CALLS * STEPS_PER_CALL

    sps = ITERS / dt
    line = {
        "metric": "train_steps_per_sec_per_chip_64x64x16f",
        "value": round(sps, 4),
        "unit": "steps/sec/chip",
        "vs_baseline": round(sps / REF_V100_STEPS_PER_SEC_UPPER_BOUND, 4),
        "baseline_source": "flop-bound-estimate",  # see BASELINE.md
        "measured_this_run": True,
    }
    record_last_good(line)
    emit_line(line)


if __name__ == "__main__":
    main()
