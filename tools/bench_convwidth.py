"""Isolated conv2d width sweep — closes the round-1 "pad channel counts to
lane width" carry-over (VERDICT r3 missing #5) with a measurement.

Hypothesis under test: if a C-channel 3×3 conv's wall time were flat in C
up to the 128-lane width (i.e. the MXU processes 128 lanes regardless and
narrow convs waste the rest), then zero-padding the generator's 32/64-wide
tail levels to 128 would be ~free in time — and the padding candidate
would deserve an in-context experiment. If instead time scales ~with
FLOPs (C²), padding a FIXED model's channels only adds discarded compute
and HBM traffic, and the candidate retires.

Method: for each width C, chain data-dependent 3×3 SAME convs
(tokens, 64, 64, C) bf16 inside ONE jitted lax.fori_loop at TWO iteration
counts (iters and 5*iters) and report the SLOPE — the per-execute constant
(~25 ms tunnel dispatch floor; block_until_ready does not synchronize, a
scalar fetch is the barrier) cancels in the difference. Reports ms/conv and
effective TFLOPS. `tokens` defaults to 8 (the flagship B; the generator's
64×64 level sees B·T tokens in the batch dim but per-frame convs see B).

Usage: python tools/bench_convwidth.py [--tokens 8] [--iters 50]
       [--widths 16,32,64,128,256] [--hw 64] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--tokens", type=int, default=8)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--widths", default="16,32,64,128,256")
    p.add_argument("--hw", type=int, default=64)
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvdgan_tpu.utils.cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    widths = [int(w) for w in args.widths.split(",")]
    hw, b, iters = args.hw, args.tokens, args.iters
    dn = jax.lax.conv_dimension_numbers(
        (b, hw, hw, widths[0]), (3, 3, widths[0], widths[0]),
        ("NHWC", "HWIO", "NHWC"))
    rows = []
    for c in widths:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, hw, hw, c) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, c, c) * (0.3 / (3 * c ** 0.5)),
                        jnp.bfloat16)

        def make_chain(n):
            @jax.jit
            def chain(x, w):
                def body(_, y):
                    y = jax.lax.conv_general_dilated(
                        y, w, (1, 1), "SAME", dimension_numbers=dn)
                    # keep magnitudes bounded without adding matmul work
                    return y * jnp.bfloat16(0.5)
                return jax.lax.fori_loop(0, n, body, x)
            return chain

        # Two iteration counts; the SLOPE (t_hi - t_lo) / (hi - lo) cancels
        # the constant per-execute cost (~25 ms tunnel dispatch floor +
        # sync), which otherwise dominates and fakes a flat-in-C region
        # (first run of this tool measured 0.5 ms/conv at EVERY width —
        # exactly 25 ms / 50 iters of floor, not conv time).
        lo, hi = iters, 5 * iters
        chains = {n: make_chain(n) for n in (lo, hi)}
        best = {}
        for n, chain in chains.items():
            out = chain(x, w)
            float(out.sum())                  # barrier (compile + warm-up)
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = chain(x, w)
                float(out.sum())              # true barrier via scalar fetch
                dt = time.perf_counter() - t0
                best[n] = min(best.get(n, dt), dt)
        ms_per_conv = (best[hi] - best[lo]) * 1e3 / (hi - lo)
        flops = 2 * 9 * b * hw * hw * c * c
        rows.append({
            "c": c,
            "ms_per_conv": round(ms_per_conv, 4),
            "tflops_eff": round(flops / (ms_per_conv * 1e-3) / 1e12, 2),
            "rel_time_vs_prev": (round(ms_per_conv / rows[-1]["ms_per_conv"], 2)
                                 if rows else None),
        })
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    print(json.dumps(rows))
    return rows


if __name__ == "__main__":
    main()
