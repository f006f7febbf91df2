"""The jitted alternating G/D training step (SURVEY.md §3.1 hot loop).

One call = d_steps discriminator updates + 1 generator update + EMA, all
inside a single traced function (the d_steps loop is unrolled — d_steps is a
static hyper-parameter, SURVEY §7 hard-part #2). Under data parallelism the
whole function runs inside shard_map and `axis_name` threads the mesh axis
into gradient psum and cross-replica BN.

RNG contract (SURVEY §7 hard-part #5 — pinned for reproducibility):
  per step key splits into, in order:
    [d-step i: z_i, real-frame-idx_i, fake-frame-idx_i] for i < d_steps,
    then [g: z_g, fake-frame-idx_g].
  Frame indices are sampled per-clip, uniform WITHOUT replacement
  (jax.random.permutation of T, take first k), independently for real and
  fake batches.

Spectral-norm / BN update contract (documented deviation from the torch
reference, where any train-mode forward mutates — ops/spectral_norm.py):
  * a model's SN `u` advances exactly once per ITS OWN optimizer update;
  * G's BN running stats update only in the G phase (fakes for D training
    still normalize with batch statistics, but the running-stat write is
    discarded);
  * D sees batch-stat-normalized fakes in both phases.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.models import discriminator, generator
from dvdgan_tpu.ops import losses, resize
from dvdgan_tpu.ops import spectral_norm as sn
from dvdgan_tpu.train import state as train_state
from dvdgan_tpu.train.state import TrainConfig


def sample_frame_indices(key: jax.Array, b: int, t: int, k: int) -> jax.Array:
    """(B, k) per-clip frame indices, uniform without replacement."""
    keys = jax.random.split(key, b)
    perm = jax.vmap(lambda kk: jax.random.permutation(kk, t))(keys)
    return perm[:, :k]


def take_frames(video: jax.Array, idx: jax.Array) -> jax.Array:
    """video: (B, T, H, W, C), idx: (B, k) -> (B, k, H, W, C)."""
    return jax.vmap(lambda v, i: v[i])(video, idx)


def _mean_if_parallel(tree, axis_name):
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def train_step(state: dict, real: jax.Array, y: jax.Array, key: jax.Array,
               g_cfg: GConfig, ds_cfg: DSConfig, dt_cfg: DTConfig,
               tc: TrainConfig,
               axis_name: Optional[str] = None) -> tuple[dict, dict]:
    """(state, real (B,T,H,W,3) in [-1,1], y (B,), key) -> (state, metrics).

    Static args: the three model configs + TrainConfig + axis_name. Intended
    use: functools.partial(...) then jit with donate_argnums=(0,) — or wrap
    in shard_map via parallel.make_parallel_train_step.
    """
    b, t = real.shape[:2]
    k = ds_cfg.k_frames
    g_opt = train_state.g_optimizer(tc)
    d_opt = train_state.d_optimizer(tc)
    metrics: dict[str, jax.Array] = {}

    keys = jax.random.split(key, 3 * tc.d_steps + 2)

    # G's params and sn_u are constant across the whole D phase, so (a) the
    # σ-normalization of G is computed ONCE (the σ math is ~70 small
    # matvecs — latency-bound; recomputing per D step is pure overhead),
    # and (b) ALL d_steps fake batches come from ONE G forward at batch
    # d_steps·B — fewer sequential ConvGRU scan iterations and better MXU
    # fill than d_steps back-to-back forwards. Each D step keeps its own z
    # stream (RNG contract unchanged). Framework numerics contract: the
    # fake-generation batch statistics pool over all d_steps batches
    # (analogous to cross-replica BN pooling over devices).
    g_sn, _ = sn.sn_normalize(state["g"]["params"], state["g"]["sn_u"],
                              update=False, compute_dtype=real.dtype)
    z_all = jnp.concatenate(
        [jax.random.normal(keys[3 * i], (b, g_cfg.z_dim), real.dtype)
         for i in range(tc.d_steps)])
    y_all = jnp.tile(y, tc.d_steps)
    fake_all, _ = generator.apply(g_sn, state["g"]["stats"], z_all, y_all,
                                  g_cfg, train=True, axis_name=axis_name)
    fake_all = jax.lax.stop_gradient(fake_all)

    # ---------------------------------------------------- D phase ×d_steps --
    for i in range(tc.d_steps):
        _, kreal_f, kfake_f = keys[3 * i:3 * i + 3]
        fake = fake_all[i * b:(i + 1) * b]

        idx_r = sample_frame_indices(kreal_f, b, t, k)
        idx_f = sample_frame_indices(kfake_f, b, t, k)
        real_frames = take_frames(real, idx_r)
        fake_frames = take_frames(fake, idx_f)
        real_half = resize.avg_pool_2x_video(real)
        fake_half = resize.avg_pool_2x_video(fake)

        def d_loss_fn(d_params):
            ds_sn, ds_u = sn.sn_normalize(d_params["ds"],
                                          state["ds"]["sn_u"], update=True,
                                          compute_dtype=real.dtype)
            dt_sn, dt_u = sn.sn_normalize(d_params["dt"],
                                          state["dt"]["sn_u"], update=True,
                                          compute_dtype=real.dtype)
            ds_r = discriminator.ds_apply(ds_sn, real_frames, y, ds_cfg)
            ds_f = discriminator.ds_apply(ds_sn, fake_frames, y, ds_cfg)
            dt_r = discriminator.dt_apply(dt_sn, real_half, y, dt_cfg)
            dt_f = discriminator.dt_apply(dt_sn, fake_half, y, dt_cfg)
            l_ds = losses.d_hinge(ds_r, ds_f)
            l_dt = losses.d_hinge(dt_r, dt_f)
            return l_ds + l_dt, (l_ds, l_dt, ds_u, dt_u)

        d_params = {"ds": state["ds"]["params"], "dt": state["dt"]["params"]}
        (d_loss, (l_ds, l_dt, ds_u, dt_u)), d_grads = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(d_params))
        d_grads = _mean_if_parallel(d_grads, axis_name)

        upd_ds, opt_ds = d_opt.update(d_grads["ds"], state["ds"]["opt"],
                                      state["ds"]["params"])
        upd_dt, opt_dt = d_opt.update(d_grads["dt"], state["dt"]["opt"],
                                      state["dt"]["params"])
        state = dict(state)
        state["ds"] = {"params": _apply(state["ds"]["params"], upd_ds),
                       "sn_u": ds_u, "opt": opt_ds}
        state["dt"] = {"params": _apply(state["dt"]["params"], upd_dt),
                       "sn_u": dt_u, "opt": opt_dt}
        if i == tc.d_steps - 1:
            metrics.update(d_loss=d_loss, d_loss_s=l_ds, d_loss_t=l_dt)

    # -------------------------------------------------------- G phase ×1 ----
    kz_g, kfake_g = keys[3 * tc.d_steps:3 * tc.d_steps + 2]
    z_g = jax.random.normal(kz_g, (b, g_cfg.z_dim), real.dtype)
    idx_g = sample_frame_indices(kfake_g, b, t, k)

    ds_sn, _ = sn.sn_normalize(state["ds"]["params"], state["ds"]["sn_u"],
                               update=False, compute_dtype=real.dtype)
    dt_sn, _ = sn.sn_normalize(state["dt"]["params"], state["dt"]["sn_u"],
                               update=False, compute_dtype=real.dtype)

    def g_loss_fn(g_params):
        g_sn, g_u = sn.sn_normalize(g_params, state["g"]["sn_u"], update=True,
                                    compute_dtype=real.dtype)
        fake, g_stats = generator.apply(g_sn, state["g"]["stats"], z_g, y,
                                        g_cfg, train=True,
                                        axis_name=axis_name)
        s_ds = discriminator.ds_apply(ds_sn, take_frames(fake, idx_g), y,
                                      ds_cfg)
        s_dt = discriminator.dt_apply(dt_sn, resize.avg_pool_2x_video(fake),
                                      y, dt_cfg)
        g_loss = losses.g_hinge(s_ds) + losses.g_hinge(s_dt)
        return g_loss, (g_u, g_stats)

    (g_loss, (g_u, g_stats)), g_grads = (
        jax.value_and_grad(g_loss_fn, has_aux=True)(state["g"]["params"]))
    g_grads = _mean_if_parallel(g_grads, axis_name)

    upd_g, opt_g = g_opt.update(g_grads, state["g"]["opt"],
                                state["g"]["params"])
    new_g_params = _apply(state["g"]["params"], upd_g)
    step = state["step"]
    state = dict(state)
    state["g"] = {"params": new_g_params, "stats": g_stats, "sn_u": g_u,
                  "opt": opt_g}
    state["g_ema"] = train_state.ema_update(
        state["g_ema"], new_g_params, tc.ema_decay, step, tc.ema_start)
    state["step"] = step + 1
    metrics["g_loss"] = g_loss
    return state, metrics


def _apply(params, updates):
    return jax.tree.map(lambda p, u: p + u, params, updates)


def make_train_step(g_cfg: GConfig, ds_cfg: DSConfig, dt_cfg: DTConfig,
                    tc: TrainConfig, axis_name: Optional[str] = None,
                    donate: bool = True):
    """Bind the static config and jit. Returns f(state, real, y, key)."""
    f = functools.partial(train_step, g_cfg=g_cfg, ds_cfg=ds_cfg,
                          dt_cfg=dt_cfg, tc=tc, axis_name=axis_name)
    if axis_name is not None:
        return f  # caller wraps in shard_map then jits
    return jax.jit(f, donate_argnums=(0,) if donate else ())


def sample(g_params_ema: dict, g_stats: dict, sn_u: dict, z: jax.Array,
           y: jax.Array, g_cfg: GConfig) -> jax.Array:
    """Inference path (SURVEY §3.4): EMA weights, eval-mode BN (running
    stats), SN applied with frozen u. Returns (B, T, H, W, 3) in [-1, 1]."""
    g_sn, _ = sn.sn_normalize(g_params_ema, sn_u, update=False,
                              compute_dtype=z.dtype)
    video, _ = generator.apply(g_sn, g_stats, z, y, g_cfg, train=False)
    return video
