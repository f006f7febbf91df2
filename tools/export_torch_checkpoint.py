"""Export a dvdgan_tpu train-state checkpoint to PyTorch state_dicts.

The inverse of tools/import_torch_checkpoint.py: load an Orbax checkpoint
(the train-state pytree) and write torch `.pth` state_dicts for G, EMA-G,
DS and DT in the tools/torch_twin.py module naming — loadable by any torch
implementation following that layout (see the twin's docstring for the
documented layout contract). Round-trip (import ∘ export) is bit-exact on
params; tested in tests/test_import_torch.py.

Usage:
  python tools/export_torch_checkpoint.py --preset ucf101_64 \
      --out_dir runs/ucf --pretrained_model 100000 --export_dir /tmp/torch

Writes <export_dir>/{G,G_ema,DS,DT}.pth. Model flags must match the
checkpoint's architecture (same contract as resuming).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_state(state: dict, g_cfg, ds_cfg, dt_cfg, export_dir: str) -> list:
    import numpy as np

    import jax
    import torch

    from tools import torch_twin as tw

    os.makedirs(export_dir, exist_ok=True)
    to_np = lambda tree: jax.tree.map(  # noqa: E731
        lambda a: np.asarray(a, np.float32), tree)
    written = []

    for name, params in (("G", state["g"]["params"]),
                         ("G_ema", state["g_ema"])):
        m = tw.Generator(g_cfg)
        tw.load_generator(m, to_np(params), to_np(state["g"]["stats"]))
        path = os.path.join(export_dir, f"{name}.pth")
        torch.save(m.state_dict(), path)
        written.append(path)

    mds = tw.SpatialDiscriminator(ds_cfg)
    tw.load_ds(mds, to_np(state["ds"]["params"]))
    path = os.path.join(export_dir, "DS.pth")
    torch.save(mds.state_dict(), path)
    written.append(path)

    mdt = tw.TemporalDiscriminator(dt_cfg)
    tw.load_dt(mdt, to_np(state["dt"]["params"]), dt_cfg.n_3d_blocks)
    path = os.path.join(export_dir, "DT.pth")
    torch.save(mdt.state_dict(), path)
    written.append(path)
    return written


def main(argv=None) -> list:
    import jax

    from dvdgan_tpu.train import checkpoint, state as train_state
    from dvdgan_tpu.utils import config as config_mod

    parser = config_mod.build_parser()
    parser.add_argument("--export_dir", required=True)
    args = parser.parse_args(argv)
    cfg = config_mod.config_from_args(args)
    g_cfg, ds_cfg, dt_cfg = cfg.g_config(), cfg.ds_config(), cfg.dt_config()

    ckpt_dir = os.path.join(cfg.out_dir, "checkpoints")
    step = cfg.pretrained_model
    if step is None:
        step = checkpoint.latest_step(ckpt_dir)
        if step is None:
            raise SystemExit(f"no checkpoints under {ckpt_dir}")
    template = train_state.create(jax.random.PRNGKey(0), g_cfg, ds_cfg,
                                  dt_cfg, cfg.train_config())
    state = checkpoint.restore(ckpt_dir, step, template)
    written = export_state(state, g_cfg, ds_cfg, dt_cfg, args.export_dir)
    print(f"exported step {step} -> " + ", ".join(written))
    return written


if __name__ == "__main__":
    main()
