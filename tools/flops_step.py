"""Report the train step's XLA-counted FLOPs (TFLOP/step) for a bench
config — the denominator of the "effective TFLOPS = FLOP/step × steps/s"
efficiency claims in README/PERF (SURVEY §6 perf baselines).

Lowering is abstract (jax.eval_shape builds the state pytree without
running the slow QR orthogonal init), then the step is compiled for the
current backend and XLA's post-optimization cost analysis is read. The
count therefore reflects the SHIPPED lowering (temporal-pair convs,
phase-decomposed upsamples, rowpack, …), not the naive graph.

Usage: python tools/flops_step.py [--set img_size=64,ch=64,...]
Prints one JSON line: {"dims": ..., "tflop_per_step": N, ...}.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--set", dest="overrides", default="",
                   help="bench override grammar: 'img_size=64,ch=64'")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dvdgan_tpu.train import create, step as step_mod
    from dvdgan_tpu.utils.cache import enable_persistent_compilation_cache
    from tools import _bench_common as bc

    enable_persistent_compilation_cache()
    g_cfg, ds_cfg, dt_cfg, tc, dims = bc.build_configs(
        bc.parse_kv(args.overrides))

    state_shapes = jax.eval_shape(
        lambda k: create(k, g_cfg, ds_cfg, dt_cfg, tc), jax.random.PRNGKey(0))
    real = jax.ShapeDtypeStruct(
        (dims["batch"], dims["nf"], dims["img"], dims["img"], 3),
        jnp.bfloat16)
    y = jax.ShapeDtypeStruct((dims["batch"],), jnp.int32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    one = functools.partial(step_mod.train_step, g_cfg=g_cfg, ds_cfg=ds_cfg,
                            dt_cfg=dt_cfg, tc=tc)
    compiled = jax.jit(one).lower(state_shapes, real, y, key).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    out = {
        "dims": dims,
        "backend": jax.devices()[0].platform,
        "tflop_per_step": round(flops / 1e12, 3),
        "bytes_accessed_gb": round(
            float(ca.get("bytes accessed", float("nan"))) / 2**30, 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
