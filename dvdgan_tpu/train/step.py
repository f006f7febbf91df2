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
  fake batches. `rng_shards=r` draws every stream in r equal per-group
  chunks with per-group folded keys — the exact streams an r-way
  data-parallel run consumes (parallel/mesh.py folds the same way), so a
  single device can replay a DP run for equivalence testing.

Spectral-norm / BN update contract (documented deviation from the torch
reference, where any train-mode forward mutates — ops/spectral_norm.py):
  * a model's SN `u` advances exactly once per ITS OWN optimizer update;
  * G's BN running stats update only in the G phase (fakes for D training
    still normalize with batch statistics, but the running-stat write is
    discarded);
  * D sees batch-stat-normalized fakes in both phases.

Gradient accumulation (tc.grad_accum = k > 1): the per-device batch is
split into k equal micro-batches; each optimizer update consumes the MEAN
of the k micro-gradients. All RNG streams are drawn at FULL batch and
sliced, so turning accumulation on/off never changes the z / frame-index
streams. Fake generation for the D phase stays ONE full-batch G forward
(forward-only memory is transient; the k× memory win is in the gradient
passes) — therefore the D-phase updates are EXACTLY the full-batch updates
(up to float reassociation of the mean; tested). The G phase recomputes
G per micro-batch, so G's CBN normalizes over micro-batch statistics — the
same per-shard-BN semantics as the torch reference's DataParallel — which
is the one documented deviation from the k=1 step.

Time-axis context parallelism (`time_axis` set, SURVEY §5.7): DT — and
only DT — runs time-sharded via parallel/time_shard.py. Each (data, time)
device holds the full clip (G and DS are replicated along `time`); for DT
it slices its own T/n_time window, exchanges 1-frame halos over ICI, and
the per-clip score is psum'd over `time` inside dt_apply. Because every
rank then computes the identical loss from the psum'd score, the per-rank
parameter cotangents come out n_time× their own partial (psum transposes
to psum); the pmean over (data, time) in the gradient reduction restores
exactly Σ_ranks partial — grads match the unsharded step (tested on the
8-CPU mesh, 4 data × 2 time).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.models import discriminator, generator
from dvdgan_tpu.ops import losses
from dvdgan_tpu.ops import resize
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


def take_frames_tm(video_tm: jax.Array, idx: jax.Array) -> jax.Array:
    """video_tm: (T, B, H, W, C), idx: (B, k) -> (B, k, H, W, C).

    Exactly take_frames(moveaxis(video_tm, 0, 1), idx) WITHOUT
    materializing the batch-major full clip: gathers k of T frames
    straight out of the generator's native time-major layout (each output
    frame has exactly one source, so the backward is a disjoint scatter —
    no accumulation-order drift vs the transpose path)."""
    return jax.vmap(lambda v, i: v[i], in_axes=(1, 0))(video_tm, idx)


def _mean_if_parallel(tree, axes: tuple):
    if not axes:
        return tree
    return jax.lax.pmean(tree, axes if len(axes) > 1 else axes[0])


def _micro(x: jax.Array, k: int) -> jax.Array:
    """(B, ...) -> (k, B/k, ...) stacked micro-batches."""
    return x.reshape(k, x.shape[0] // k, *x.shape[1:])


def _accum_grads(loss_fn, params, micro_args, k: int):
    """Mean gradient over k micro-batches via lax.scan (activations live
    for ONE micro-batch at a time — the memory point of accumulation).
    loss_fn(params, *args) -> (loss, aux). Returns (grads, losses (k,),
    aux_stacked)."""
    def body(acc, inp):
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, *inp)
        return jax.tree.map(jnp.add, acc, g), (loss, aux)

    zero = jax.tree.map(jnp.zeros_like, params)
    acc, (ls, auxes) = jax.lax.scan(body, zero, micro_args)
    return jax.tree.map(lambda a: a / k, acc), ls, auxes


def train_step(state: dict, real: jax.Array, y: jax.Array, key: jax.Array,
               g_cfg: GConfig, ds_cfg: DSConfig, dt_cfg: DTConfig,
               tc: TrainConfig,
               axis_name: Optional[str] = None,
               time_axis: Optional[str] = None,
               rng_shards: Optional[int] = None) -> tuple[dict, dict]:
    """(state, real (B,T,H,W,3) in [-1,1], y (B,), key) -> (state, metrics).

    Static args: the three model configs + TrainConfig + axis names. Intended
    use: functools.partial(...) then jit with donate_argnums=(0,) — or wrap
    in shard_map via parallel.make_parallel_train_step.
    """
    b, t = real.shape[:2]
    # DVD-GAN-FP ([P] §3.2): the clip's first cond_frames are G's real
    # prefix; G generates the remaining t_gen frames. DS samples frames
    # from the GENERATED portion only; DT scores the full clip (real
    # prefix + generated continuation for fakes).
    cf = g_cfg.cond_frames
    t_gen = t - cf
    if t_gen != g_cfg.n_frames:
        raise ValueError(
            f"clip length {t} != cond_frames {cf} + n_frames "
            f"{g_cfg.n_frames}")
    cond = real[:, :cf] if cf else None
    real_gen = real[:, cf:]
    k = ds_cfg.k_frames
    ka = tc.grad_accum
    if b % ka:
        raise ValueError(f"batch {b} not divisible by grad_accum {ka}")
    grad_axes = tuple(a for a in (axis_name, time_axis) if a is not None)
    g_opt = train_state.g_optimizer(tc)
    d_opt = train_state.d_optimizer(tc)
    metrics: dict[str, jax.Array] = {}

    # ---- RNG streams: full-batch draws, optionally in rng_shards groups ----
    n_keys = 3 * tc.d_steps + 2
    if rng_shards is None:
        keys = jax.random.split(key, n_keys)

        def draw_z(i: int) -> jax.Array:
            return jax.random.normal(keys[i], (b, g_cfg.z_dim), real.dtype)

        def draw_idx(i: int) -> jax.Array:
            return sample_frame_indices(keys[i], b, t_gen, k)
    else:
        r = rng_shards
        if b % r:
            raise ValueError(f"batch {b} not divisible by rng_shards {r}")
        gkeys = jax.vmap(
            lambda g: jax.random.split(jax.random.fold_in(key, g), n_keys)
        )(jnp.arange(r))                                    # (r, n_keys, 2)

        def draw_z(i: int) -> jax.Array:
            zs = jax.vmap(lambda kk: jax.random.normal(
                kk, (b // r, g_cfg.z_dim), real.dtype))(gkeys[:, i])
            return zs.reshape(b, g_cfg.z_dim)

        def draw_idx(i: int) -> jax.Array:
            ix = jax.vmap(lambda kk: sample_frame_indices(
                kk, b // r, t_gen, k))(gkeys[:, i])
            return ix.reshape(b, k)

    # ---- DT scoring: plain, or time-sharded CP (SURVEY §5.7) --------------
    # clips are passed at FULL resolution — the φ 2× avg-pool happens inside
    # dt_apply (discriminator.py), once per forward. Exception: the D phase
    # pre-pools real + all fakes ONCE per step (pooled=True) — φ is
    # per-frame and linear, so this is bitwise the in-forward pool at
    # (d_steps-1)× less real-clip pooling. CP keeps full-res clips (the
    # halo exchange slices before pooling).
    def dt_score(dt_sn, full_clip, yy, pooled=False):
        if time_axis is None:
            return discriminator.dt_apply(dt_sn, full_clip, yy, dt_cfg,
                                          pooled=pooled)
        from dvdgan_tpu.parallel import time_shard
        n = jax.lax.axis_size(time_axis)
        tl = full_clip.shape[1] // n
        shard = jax.lax.dynamic_slice_in_dim(
            full_clip, jax.lax.axis_index(time_axis) * tl, tl, axis=1)
        return time_shard.dt_apply_time_sharded(dt_sn, shard, yy, dt_cfg,
                                                time_axis)

    # G's params and sn_u are constant across the whole D phase, so (a) the
    # σ-normalization of G is computed ONCE (the σ math is ~70 small
    # matvecs — latency-bound; recomputing per D step is pure overhead),
    # and (b) ALL d_steps fake batches come from ONE G forward at batch
    # d_steps·B — fewer sequential ConvGRU scan iterations and better MXU
    # fill than d_steps back-to-back forwards. Each D step keeps its own z
    # stream (RNG contract unchanged). Framework numerics contract: the
    # fake-generation batch statistics pool over all d_steps batches
    # (analogous to cross-replica BN pooling over devices).
    # A/B (tools/ab_fake_stats.py, 2000 steps on-chip, synthetic
    # 64px/8f/ch16 d_steps=2): pooled vs per_step both train stably with
    # comparable random-I3D FVD (4.92 vs 4.12, same order) — no evidence
    # the pooling changes dynamics materially; tc.fake_gen="per_step"
    # selects the reference's per-forward stats when exact parity matters.
    if tc.fake_gen not in ("pooled", "per_step"):
        raise ValueError(f"fake_gen must be 'pooled' or 'per_step', "
                         f"got {tc.fake_gen!r}")
    # Time-major fake consumption (DVDGAN_TM_FAKES=on, A/B knob,
    # exact math): G's internal layout is (T, B, ...); its final
    # transpose to (B, T, ...) moves a full-res C=3 tensor — the most
    # lane-hostile copy on TPU (3 of 128 lanes). But the D inputs only
    # ever see k of T gathered frames (DS) and a φ-pooled clip (DT), so
    # with the knob on the generator returns time-major and the gather /
    # pool happen FIRST: the transpose that remains moves 4× (DT) /
    # T/k× (DS) fewer bytes. Off under time-axis CP (the halo slice
    # expects the public layout).
    from dvdgan_tpu.ops.layers import env_choice
    tm_fakes = time_axis is None and env_choice(
        "DVDGAN_TM_FAKES", "off", ("on", "off")) == "on"
    g_sn, _ = sn.sn_normalize(state["g"]["params"], state["g"]["sn_u"],
                              update=False, compute_dtype=real.dtype)
    if tc.fake_gen == "pooled":
        z_all = jnp.concatenate([draw_z(3 * i) for i in range(tc.d_steps)])
        y_all = jnp.tile(y, tc.d_steps)
        cond_all = (jnp.tile(cond, (tc.d_steps, 1, 1, 1, 1)) if cf else None)
        fake_all, _ = generator.apply(g_sn, state["g"]["stats"], z_all,
                                      y_all, g_cfg, train=True,
                                      axis_name=axis_name,
                                      cond_video=cond_all,
                                      time_major_out=tm_fakes)
    else:   # "per_step": the reference's per-batch CBN statistics
        fake_all = jnp.concatenate([
            generator.apply(g_sn, state["g"]["stats"], draw_z(3 * i), y,
                            g_cfg, train=True, axis_name=axis_name,
                            cond_video=cond,
                            time_major_out=tm_fakes)[0]
            for i in range(tc.d_steps)], axis=1 if tm_fakes else 0)
    fake_all = jax.lax.stop_gradient(fake_all)

    # D-phase φ pre-pooling (skipped under time-axis CP — the halo
    # exchange needs full-res shards): real and all d_steps fake clips
    # are pooled once here; dt_score gets pooled=True below. No gradient
    # flows through these pools (real is data, fakes are stop_gradient'd).
    # DVDGAN_DT_PREPOOL=off restores per-forward pooling (A/B knob; the
    # math is identical either way — this is purely a scheduling choice).
    pre_pooled = time_axis is None and env_choice(
        "DVDGAN_DT_PREPOOL", "on", ("on", "off")) == "on"
    if pre_pooled:
        real_dt = resize.avg_pool_2x_video(real)
        # positional pool over axes (-3,-2): valid for both the public
        # (B,T,H,W,C) layout and the time-major (T,B,H,W,C) one
        fake_all_dt = resize.avg_pool_2x_video(fake_all)
        cond_dt = real_dt[:, :cf] if cf else None
    else:
        real_dt, fake_all_dt, cond_dt = real, fake_all, cond

    # ---------------------------------------------------- D phase ×d_steps --
    for i in range(tc.d_steps):
        idx_r = draw_idx(3 * i + 1)
        idx_f = draw_idx(3 * i + 2)
        real_frames = take_frames(real_gen, idx_r)
        if tm_fakes:
            sl = slice(i * b, (i + 1) * b)
            fake_frames = take_frames_tm(fake_all[:, sl], idx_f)
            fake_dt = jnp.moveaxis(fake_all_dt[:, sl], 0, 1)
        else:
            fake = fake_all[i * b:(i + 1) * b]
            fake_dt = fake_all_dt[i * b:(i + 1) * b]
            fake_frames = take_frames(fake, idx_f)
        fake_full = (jnp.concatenate([cond_dt, fake_dt], axis=1)
                     if cf else fake_dt)

        def d_loss_fn(d_params, rf, ff, rh, fh, yy):
            ds_sn, ds_u = sn.sn_normalize(d_params["ds"],
                                          state["ds"]["sn_u"], update=True,
                                          compute_dtype=real.dtype)
            dt_sn, dt_u = sn.sn_normalize(d_params["dt"],
                                          state["dt"]["sn_u"], update=True,
                                          compute_dtype=real.dtype)
            # real and fake share ONE forward per discriminator: D has no
            # batch-coupled ops (no BN), so concat-then-split is exactly
            # the two separate passes — at 2× the conv batch (better MXU
            # fill at these widths) and half the op count
            bb_ = rf.shape[0]
            yy2 = jnp.concatenate([yy, yy])
            ds_both = discriminator.ds_apply(
                ds_sn, jnp.concatenate([rf, ff]), yy2, ds_cfg)
            dt_both = dt_score(dt_sn, jnp.concatenate([rh, fh]), yy2,
                               pooled=pre_pooled)
            # (rh/fh are the DT clips — φ-pooled unless CP keeps them
            # full-res; kept as separate args so the grad_accum
            # micro-slicing stays per-stream)
            l_ds = losses.d_hinge(ds_both[:bb_], ds_both[bb_:])
            l_dt = losses.d_hinge(dt_both[:bb_], dt_both[bb_:])
            return l_ds + l_dt, (l_ds, l_dt, ds_u, dt_u)

        d_params = {"ds": state["ds"]["params"], "dt": state["dt"]["params"]}
        if ka == 1:
            (d_loss, (l_ds, l_dt, ds_u, dt_u)), d_grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(
                    d_params, real_frames, fake_frames, real_dt, fake_full, y))
        else:
            micro = tuple(_micro(x, ka) for x in (
                real_frames, fake_frames, real_dt, fake_full, y))
            d_grads, ls, auxes = _accum_grads(d_loss_fn, d_params, micro, ka)
            d_loss = ls.mean()
            l_ds = auxes[0].mean()
            l_dt = auxes[1].mean()
            # u depends only on params — identical every micro; take last
            ds_u = jax.tree.map(lambda x: x[-1], auxes[2])
            dt_u = jax.tree.map(lambda x: x[-1], auxes[3])
        d_grads = _mean_if_parallel(d_grads, grad_axes)

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
            if tc.log_grad_norms:
                metrics["d_grad_norm"] = _global_norm(d_grads)

    # -------------------------------------------------------- G phase ×1 ----
    z_g = draw_z(3 * tc.d_steps)
    idx_g = draw_idx(3 * tc.d_steps + 1)

    ds_sn, _ = sn.sn_normalize(state["ds"]["params"], state["ds"]["sn_u"],
                               update=False, compute_dtype=real.dtype)
    dt_sn, _ = sn.sn_normalize(state["dt"]["params"], state["dt"]["sn_u"],
                               update=False, compute_dtype=real.dtype)

    def g_loss_fn(g_params, z_j, idx_j, y_j, cond_j=None):
        g_sn, g_u = sn.sn_normalize(g_params, state["g"]["sn_u"], update=True,
                                    compute_dtype=real.dtype)
        fake, g_stats = generator.apply(g_sn, state["g"]["stats"], z_j, y_j,
                                        g_cfg, train=True,
                                        axis_name=axis_name,
                                        cond_video=cond_j,
                                        time_major_out=tm_fakes)
        if tm_fakes:
            # gather / φ-pool in G's native time-major layout, transpose
            # the 4×-smaller pooled clip (exact math; pool commutes with
            # concat per-frame, so cond pools separately for FP)
            s_ds = discriminator.ds_apply(
                ds_sn, take_frames_tm(fake, idx_j), y_j, ds_cfg)
            fake_pooled = jnp.moveaxis(resize.avg_pool_2x_video(fake), 0, 1)
            dt_in = (jnp.concatenate(
                [resize.avg_pool_2x_video(cond_j), fake_pooled], axis=1)
                if cf else fake_pooled)
            s_dt = dt_score(dt_sn, dt_in, y_j, pooled=True)
        else:
            s_ds = discriminator.ds_apply(ds_sn, take_frames(fake, idx_j),
                                          y_j, ds_cfg)
            dt_in = (jnp.concatenate([cond_j, fake], axis=1) if cf else fake)
            s_dt = dt_score(dt_sn, dt_in, y_j)
        g_loss = losses.g_hinge(s_ds) + losses.g_hinge(s_dt)
        return g_loss, (g_u, g_stats)

    if ka == 1:
        (g_loss, (g_u, g_stats)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(
                state["g"]["params"], z_g, idx_g, y, cond))
    else:
        fields = (z_g, idx_g, y) + ((cond,) if cf else ())
        micro = tuple(_micro(x, ka) for x in fields)
        g_grads, ls, auxes = _accum_grads(g_loss_fn, state["g"]["params"],
                                          micro, ka)
        g_loss = ls.mean()
        g_u = jax.tree.map(lambda x: x[-1], auxes[0])
        # running-stat update is linear in the batch moments, so the mean
        # over micros == one update with the mean micro-moment
        g_stats = jax.tree.map(lambda x: x.mean(axis=0), auxes[1])
    g_grads = _mean_if_parallel(g_grads, grad_axes)

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
    if tc.log_grad_norms:
        metrics["g_grad_norm"] = _global_norm(g_grads)
    return state, metrics


def _global_norm(grads) -> jax.Array:
    """l2 norm over the whole gradient tree (in f32: bf16 squares of
    O(1e-2) grads underflow)."""
    return jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in jax.tree.leaves(grads)))


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


def scan_steps(step_fn, steps_per_call: int, donate: bool = True):
    """Chunked stepping: lax.scan `steps_per_call` train steps inside ONE
    jitted call, amortizing the per-dispatch overhead the host loop pays
    every step (~4 ms/dispatch on v5e, 20-30 ms through remote tunnels —
    the same trick bench.py uses to measure honestly).

    `step_fn` is the UNJITTED per-step callable (train_step bound to its
    configs, or the shard_map'd parallel step). Returns
    f(state, reals, ys, base_key, start_step) with a leading
    `steps_per_call` axis on reals/ys; step j consumes
    fold_in(base_key, start_step + j) — the trainer's exact per-step key
    contract — derived ON DEVICE (host-side fold_in would cost one
    dispatch round-trip per step, which is the overhead being amortized).
    Metrics come back stacked along the step axis; callers should slice
    them lazily (each host-side slice is a dispatch)."""

    def multi(state, reals, ys, base_key, start_step):
        def body(st, xs):
            r, y, j = xs
            st, m = step_fn(st, r, y, jax.random.fold_in(base_key, j))
            return st, m
        steps = start_step + jnp.arange(steps_per_call)
        return jax.lax.scan(body, state, (reals, ys, steps))

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def sample(g_params_ema: dict, g_stats: dict, sn_u: dict, z: jax.Array,
           y: jax.Array, g_cfg: GConfig,
           cond_video: Optional[jax.Array] = None) -> jax.Array:
    """Inference path (SURVEY §3.4): EMA weights, eval-mode BN (running
    stats), SN applied with frozen u. Returns (B, T, H, W, 3) in [-1, 1]
    (the generated frames; for FP pass cond_video — the real prefix is not
    re-emitted)."""
    g_sn, _ = sn.sn_normalize(g_params_ema, sn_u, update=False,
                              compute_dtype=z.dtype)
    video, _ = generator.apply(g_sn, g_stats, z, y, g_cfg, train=False,
                               cond_video=cond_video)
    return video
