"""Import a PyTorch DVD-GAN checkpoint into a dvdgan_tpu train state.

Migration path for users of the torch reference (SURVEY.md §2.14/§3.5: the
reference torch.saves per-model state-dicts keyed by step): convert G / DS /
DT state_dicts into this framework's parameter pytrees and write a full
Orbax train-state checkpoint that `--pretrained_model <step>` resumes from.

Accepted input layout: the module naming of tools/torch_twin.py (the
documented reference-semantics interchange format — G.grus/G.blocks/...,
DS.blocks/DS.head, DT.blocks/DT.head). Checkpoints written by a repo with
different module names need a one-line key-rename pass first; state dicts
wrapped by torch.nn.utils.spectral_norm are handled (``*.weight_orig`` is
taken as the raw weight; the ``weight_u``/``weight_v`` power-iteration
vectors are dropped and re-converged here via --sn_warmup).

What the reference checkpoint does NOT contain is created fresh: optimizer
states (zero-initialized Adam moments), SN u vectors (random init +
`--sn_warmup` power iterations so σ estimates are converged at resume), EMA
params (copied from G unless --g_ema_ckpt is given), BN running stats beyond
those stored per-module, and the step counter (--step).

Usage:
  python tools/import_torch_checkpoint.py --preset ucf101_64 \
      --g_ckpt G.pth [--g_ema_ckpt G_ema.pth] --ds_ckpt DS.pth \
      --dt_ckpt DT.pth --out_dir runs/imported [--step 0] [--sn_warmup 30]

Any model flag accepted by main.py (--img_size, --ch, ...) can be passed to
pin the architecture the state dicts must match; load_state_dict(strict)
raises on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_state_dict(path: str):
    """Load a state_dict from .pth/.pt (torch.load) or .npz. Unwraps common
    {'state_dict': ...} containers and spectral-norm wrapper keys."""
    import torch
    if path.endswith(".npz"):
        raw = {k: torch.from_numpy(v) for k, v in np.load(path).items()}
    else:
        raw = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(raw, dict) and "state_dict" in raw \
                and isinstance(raw["state_dict"], dict):
            raw = raw["state_dict"]
    sd = {}
    for k, v in raw.items():
        if k.endswith(".weight_u") or k.endswith(".weight_v"):
            continue                       # re-converged via --sn_warmup
        if k.endswith(".weight_orig"):
            k = k[: -len("_orig")]
        sd[k] = v
    return sd


def convert(g_sd, ds_sd, dt_sd, g_cfg, ds_cfg, dt_cfg):
    """state_dicts (twin naming) -> (g_params, g_stats, ds_params, dt_params),
    all float32 numpy pytrees shaped exactly like the init() trees."""
    from tools import torch_twin as tw

    g = tw.Generator(g_cfg)
    g.load_state_dict(g_sd, strict=True)
    g_params, g_stats = tw.export_generator(g)

    ds = tw.SpatialDiscriminator(ds_cfg)
    ds.load_state_dict(ds_sd, strict=True)
    ds_params = tw.export_ds(ds)

    dt = tw.TemporalDiscriminator(dt_cfg)
    dt.load_state_dict(dt_sd, strict=True)
    dt_params = tw.export_dt(dt)
    return g_params, g_stats, ds_params, dt_params


def build_state(cfg, g_params, g_stats, ds_params, dt_params,
                g_ema_params=None, step: int = 0, sn_warmup: int = 30,
                seed: int = 0):
    """Assemble a full train-state pytree around the imported params."""
    import jax
    import jax.numpy as jnp

    from dvdgan_tpu.ops import spectral_norm as sn
    from dvdgan_tpu.train import state as train_state

    tc = cfg.train_config()
    as_f32 = lambda tree: jax.tree.map(  # noqa: E731
        lambda a: jnp.asarray(a, jnp.float32), tree)
    g_params = as_f32(g_params)
    state = train_state.create(jax.random.PRNGKey(seed), cfg.g_config(),
                               cfg.ds_config(), cfg.dt_config(), tc)
    state["g"]["params"] = g_params
    state["g"]["stats"] = as_f32(g_stats)
    state["ds"]["params"] = as_f32(ds_params)
    state["dt"]["params"] = as_f32(dt_params)
    state["g_ema"] = (as_f32(g_ema_params) if g_ema_params is not None
                      else jax.tree.map(jnp.copy, g_params))
    state["step"] = jnp.asarray(step, jnp.int32)

    # converge the fresh SN u vectors against the imported weights so the
    # first resumed steps normalize with an accurate σ (n_iter chained
    # power-iteration steps == the same steps spread over training steps)
    if sn_warmup > 0:
        for model in ("g", "ds", "dt"):
            _, u = sn.sn_normalize(state[model]["params"],
                                   state[model]["sn_u"], update=True,
                                   n_iter=sn_warmup)
            state[model]["sn_u"] = u
    return state


def main(argv=None) -> str:
    from dvdgan_tpu.train import checkpoint
    from dvdgan_tpu.utils import config as config_mod

    parser = config_mod.build_parser()
    parser.add_argument("--g_ckpt", required=True,
                        help="torch G state_dict (.pth/.pt/.npz)")
    parser.add_argument("--ds_ckpt", required=True)
    parser.add_argument("--dt_ckpt", required=True)
    parser.add_argument("--g_ema_ckpt", default="",
                        help="optional EMA-G state_dict (default: copy of G)")
    parser.add_argument("--step", type=int, default=0, dest="import_step",
                        help="step number to store the checkpoint under")
    parser.add_argument("--sn_warmup", type=int, default=30)
    args = parser.parse_args(argv)
    cfg = config_mod.config_from_args(args)

    g_cfg, ds_cfg, dt_cfg = cfg.g_config(), cfg.ds_config(), cfg.dt_config()
    g_sd = _load_state_dict(args.g_ckpt)
    ds_sd = _load_state_dict(args.ds_ckpt)
    dt_sd = _load_state_dict(args.dt_ckpt)
    g_params, g_stats, ds_params, dt_params = convert(
        g_sd, ds_sd, dt_sd, g_cfg, ds_cfg, dt_cfg)

    g_ema = None
    if args.g_ema_ckpt:
        from tools import torch_twin as tw
        ge = tw.Generator(g_cfg)
        ge.load_state_dict(_load_state_dict(args.g_ema_ckpt), strict=True)
        g_ema, _ = tw.export_generator(ge)

    state = build_state(cfg, g_params, g_stats, ds_params, dt_params,
                        g_ema_params=g_ema, step=args.import_step,
                        sn_warmup=args.sn_warmup, seed=cfg.seed)
    ckpt_dir = os.path.join(cfg.out_dir, "checkpoints")
    checkpoint.save(ckpt_dir, args.import_step, state)
    print(f"imported checkpoint -> {ckpt_dir}/{args.import_step} "
          f"(resume with --out_dir {cfg.out_dir} "
          f"--pretrained_model {args.import_step})")
    return ckpt_dir


if __name__ == "__main__":
    main()
