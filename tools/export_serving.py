"""Export the EMA-G sampler as a portable serialized-StableHLO artifact.

Production serving story (SURVEY §3.4 inference path): `jax.export` lowers
the jitted sampler — EMA weights, eval-mode BN and frozen SN `u` baked in
as constants — to a self-contained StableHLO module that runs WITHOUT this
repo's model code (and, with --platforms tpu,cpu, on either backend):

    from jax import export
    fn = export.deserialize(open("g_sampler.shlo", "rb").read())
    clips = fn.call(z, y)            # z (B, z_dim) f32, y (B,) int32
    #                                  -> (B, T, H, W, 3) in [-1, 1]
    # DVD-GAN-FP artifacts additionally take cond (B, cond_frames, H, W, 3)

The artifact matches `Trainer.sample` at the same inputs to float
reassociation tolerance (weights are folded as constants, so XLA fuses
slightly differently than the runtime-argument path; round-trip tested
in tests/test_tools.py).

Usage:
  python tools/export_serving.py --preset ucf101_64 --out_dir runs/ucf \
      [--pretrained_model N] --export_path g_sampler.shlo \
      [--serve_batch 8] [--platforms tpu,cpu]

Any model flag accepted by main.py pins the architecture; the checkpoint
is resolved exactly like --mode sample (latest under --out_dir, or
--pretrained_model N).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def export_sampler(state, g_cfg, batch: int,
                   platforms=("cpu",), dtype: str = "float32") -> bytes:
    """Serialize the EMA-G sampler for `batch`-clip requests. Params are
    closed over (constants in the artifact); inputs are (z, y[, cond]).

    batch == 0 exports a BATCH-POLYMORPHIC artifact (jax.export symbolic
    dimension): one compile at export time, any request batch >= 1 at
    serve time. A fixed batch bakes the shape (XLA can specialize layouts
    slightly better); 0 is the deployment-friendly default for request
    servers with variable fan-in.

    dtype == "bfloat16" bakes the weight constants in bf16 and computes
    the whole forward in bf16 (the training compute dtype): the artifact
    is ~half the bytes and the weight HBM traffic halves at serve time.
    The artifact INTERFACE stays f32 in / f32 out either way — the cast
    happens inside. Output drift vs the f32 artifact is bf16-mantissa
    level on tanh-bounded [-1,1] video (tested ~<=3e-2 max abs)."""
    import jax
    import jax.numpy as jnp

    from dvdgan_tpu.train import step as step_mod
    from jax import export as jexport

    if dtype not in ("float32", "bfloat16"):
        raise ValueError(f"dtype must be float32|bfloat16, got {dtype!r}")
    compute = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32

    g_ema = jax.device_get(state["g_ema"])
    g_stats = jax.device_get(state["g"]["stats"])
    sn_u = jax.device_get(state["g"]["sn_u"])
    if compute == jnp.bfloat16:
        def cast_tree(t):
            return jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                t)
        # params + SN u in bf16 (σ drift is mantissa-level on unit-norm u);
        # BN running stats stay f32 — eval-mode normalization folds them
        # into scale/shift before the cast to compute dtype
        g_ema, sn_u = cast_tree(g_ema), cast_tree(sn_u)

    bdim = jexport.symbolic_shape("b")[0] if batch == 0 else batch
    if g_cfg.cond_frames > 0:
        def serve(z, y, cond):
            v = step_mod.sample(g_ema, g_stats, sn_u, z.astype(compute), y,
                                g_cfg=g_cfg,
                                cond_video=cond.astype(compute))
            return v.astype(jnp.float32)
        args = (jax.ShapeDtypeStruct((bdim, g_cfg.z_dim), jnp.float32),
                jax.ShapeDtypeStruct((bdim,), jnp.int32),
                jax.ShapeDtypeStruct((bdim, g_cfg.cond_frames,
                                      g_cfg.img_size, g_cfg.img_size, 3),
                                     jnp.float32))
    else:
        def serve(z, y):
            v = step_mod.sample(g_ema, g_stats, sn_u, z.astype(compute), y,
                                g_cfg=g_cfg)
            return v.astype(jnp.float32)
        args = (jax.ShapeDtypeStruct((bdim, g_cfg.z_dim), jnp.float32),
                jax.ShapeDtypeStruct((bdim,), jnp.int32))

    exported = jexport.export(jax.jit(serve),
                              platforms=list(platforms))(*args)
    return bytes(exported.serialize())


def main(argv=None) -> str:
    import jax

    from dvdgan_tpu.train import checkpoint as ckpt
    from dvdgan_tpu.train import state as train_state
    from dvdgan_tpu.utils import config as config_mod
    from dvdgan_tpu.utils.cache import enable_persistent_compilation_cache

    parser = config_mod.build_parser()
    parser.add_argument("--export_path", required=True,
                        help="output file for the serialized artifact")
    parser.add_argument("--serve_batch", type=int, default=8,
                        help="clips per serving request (baked shape); "
                             "0 = batch-polymorphic artifact")
    parser.add_argument("--platforms", default="tpu,cpu",
                        help="comma-separated lowering platforms")
    parser.add_argument("--serve_dtype", default="float32",
                        choices=("float32", "bfloat16"),
                        help="weight/compute dtype baked into the artifact "
                             "(interface stays f32 either way); bfloat16 "
                             "halves artifact size and weight HBM traffic")
    args = parser.parse_args(argv)
    cfg = config_mod.config_from_args(args)
    enable_persistent_compilation_cache()

    g_cfg = cfg.g_config()
    template = train_state.create(jax.random.PRNGKey(cfg.seed), g_cfg,
                                  cfg.ds_config(), cfg.dt_config(),
                                  cfg.train_config())
    ckpt_dir = os.path.join(cfg.out_dir, "checkpoints")
    step = cfg.pretrained_model
    if step is None:
        step = ckpt.latest_step(ckpt_dir)
    if step is not None:
        state = ckpt.restore(ckpt_dir, step, template)
        print(f"exporting checkpoint step {step}")
    else:
        state = template
        print("WARNING: no checkpoint found — exporting the random init")

    blob = export_sampler(state, g_cfg, args.serve_batch,
                          platforms=[p.strip() for p in
                                     args.platforms.split(",") if p.strip()],
                          dtype=args.serve_dtype)
    with open(args.export_path, "wb") as f:
        f.write(blob)
    print(f"wrote {len(blob)} bytes to {args.export_path} "
          f"(batch {args.serve_batch}, platforms {args.platforms})")
    return args.export_path


if __name__ == "__main__":
    main()
