"""Shared config/harness builders for bench.py, tools/profile_step.py and
tools/bench_config.py — ONE place defines the benched model and the scan
harness, so the profiled model can never silently drift from the benched
one (they previously each hand-built the configs).

Override grammar (the value of an env var like DVDGAN_BENCH /
DVDGAN_PROFILE): "img_size=128,n_frames=12,ch=32,batch=8,remat=1" — any
subset; defaults are the flagship bench config (64×64×16f, ch 32, batch 8,
d_steps 2).
"""

from __future__ import annotations

import functools
import os
from typing import Optional


def parse_kv(raw: str) -> dict:
    """'k=v,k2=v2' -> dict (single owner of the override grammar).

    STRICT: a non-empty segment without '=' raises — silently dropping it
    would bench/profile the wrong configuration under a label claiming the
    knob was set (the silent-knob-typo class layers.env_choice guards
    against at import time)."""
    out = {}
    for kv in raw.split(","):
        if not kv:
            continue
        if "=" not in kv:
            raise ValueError(
                f"malformed override segment {kv!r} in {raw!r} — "
                f"expected 'KEY=value'")
        k, v = kv.split("=", 1)
        out[k] = v
    return out


def parse_overrides(env_var: str) -> dict:
    return parse_kv(os.environ.get(env_var, ""))


def build_configs(ov: Optional[dict] = None):
    """-> (g_cfg, ds_cfg, dt_cfg, tc, dims) with dims = dict(img, nf, ch,
    batch). `ov` is a parse_overrides() dict (string values)."""
    from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
    from dvdgan_tpu.train import TrainConfig

    ov = ov or {}

    def iv(name: str, default: int) -> int:
        return int(ov.get(name, default))

    img = iv("img_size", 64)
    nf = iv("n_frames", 16)
    ch = iv("ch", 32)
    batch = iv("batch", 8)
    # 256px has 7 hierarchical-latent chunks; 112 divides by 7 (120 does not)
    g_cfg = GConfig(img_size=img, n_frames=nf, ch=ch,
                    z_dim=iv("z_dim", 112 if img == 256 else 120),
                    n_classes=101, emb_dim=120,
                    attn_res=iv("attn_res", 32),
                    remat=bool(iv("remat", 0)))
    ds_cfg = DSConfig(img_size=img, ch=ch, n_classes=101, k_frames=8)
    dt_cfg = DTConfig(img_size=img, n_frames=nf, ch=ch, n_classes=101)
    tc = TrainConfig(d_steps=iv("d_steps", 2), batch_size=batch,
                     grad_accum=iv("grad_accum", 1))
    return g_cfg, ds_cfg, dt_cfg, tc, dict(img=img, nf=nf, ch=ch, batch=batch)


def init_state_and_batch(g_cfg, ds_cfg, dt_cfg, tc, dims: dict, seed: int = 0):
    """CPU init (QR orthogonal init compiles slowly on the chip) →
    device_put, plus a fixed synthetic bf16 batch on the device."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dvdgan_tpu.train import create
    from dvdgan_tpu.utils.cache import enable_persistent_compilation_cache

    # every harness built through here (bench.py, profile_step.py,
    # bench_config.py) gets the persistent compile cache — restarted runs
    # skip the ~2-16 min train-step compile
    enable_persistent_compilation_cache()

    with jax.default_device(jax.devices("cpu")[0]):
        state = create(jax.random.PRNGKey(seed), g_cfg, ds_cfg, dt_cfg, tc)
    state = jax.device_put(state, jax.devices()[0])
    rng = np.random.RandomState(seed)
    real = jnp.asarray(
        rng.randn(dims["batch"], dims["nf"], dims["img"], dims["img"], 3),
        jnp.bfloat16)
    y = jnp.asarray(rng.randint(0, 101, dims["batch"]), jnp.int32)
    return state, real, y


def make_multi_step(g_cfg, ds_cfg, dt_cfg, tc, steps: int):
    """Jitted lax.scan of `steps` train steps in ONE dispatch — the only
    honest timing through the axon tunnel (block_until_ready does not
    synchronize there; fetch a scalar from the returned losses for a true
    barrier). Returns f(state, real, y, key) -> (state, g_losses (steps,))."""
    import jax
    import jax.numpy as jnp

    from dvdgan_tpu.train import step as step_mod

    one = functools.partial(step_mod.train_step, g_cfg=g_cfg, ds_cfg=ds_cfg,
                            dt_cfg=dt_cfg, tc=tc)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, real, y, key):
        def body(st, i):
            st, m = one(st, real, y, jax.random.fold_in(key, i))
            return st, m["g_loss"]
        return jax.lax.scan(body, state, jnp.arange(steps))

    return multi
