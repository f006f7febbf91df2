"""Generator G (SURVEY.md §2.6, [R model/Generator.py] behaviorally).

Pipeline (per SURVEY §3.2): z ∼ N(0,1) split into per-level chunks
(hierarchical latent); shared class embedding concatenated into each chunk
for CBN conditioning; SNLinear seeds a 4×4×(ch·m₀) map; then per level —
ConvGRU over the T frames at the current resolution (lax.scan), per-frame
GResBlock upsampling 2× (time folded into batch for the conv stack) — with
separable spatio-temporal self-attention at `attn_res`; final BN → ReLU →
SNConv3×3 → tanh.

TPU-first layout decisions:
  * activations are (B, T, H, W, C) channels-last; all per-frame compute
    reshapes to ((B·T), H, W, C) so convolutions see one big batch (MXU
    likes large batched convs, SURVEY §7 design stance);
  * the only sequential axis is the ConvGRU scan; everything else is
    batch-parallel;
  * params/stats are separate pytrees; spectral norm is applied by the
    caller via ops.spectral_norm.sn_normalize BEFORE apply (hoisted tree
    pass) — apply never mutates.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from dvdgan_tpu.models.config import GConfig
from dvdgan_tpu.ops import attention, convgru, layers, norm, resblocks


def _remat_save() -> str:
    """Trace-time A/B knob (lazy read; fresh-closure caveat as
    layers._tphase_interleave) selecting WHICH named intermediates the
    per-level remat may keep instead of recomputing:
      "none"    — plain jax.checkpoint (recompute everything; the round-1
                  policy that makes 256px/48f fit at batch 1)
      "gru"     — save each level's ConvGRU output sequence ("gru_hs"):
                  the backward skips re-running the SEQUENTIAL scans /
                  Pallas kernels (only the batch-parallel gate input convs
                  recompute as the custom-VJP residuals). ~185 MB of bf16
                  residuals at 256px/48f batch 1.
      "ups"     — save each upsample2x_conv3x3 output ("ups_out"): the
                  backward skips recomputing the phase-interleave pad/copy
                  chains the 256px profile pinned (~385 MB there).
      "gru+ups" — both (~570 MB).
    Exact math either way — a checkpoint policy changes only what is
    recomputed, and recompute is deterministic (bitwise-tested).

    MEASURED DEFAULT "gru+ups" (v5e, 2026-08-20, ab_inprocess 3 reps,
    256px/48f batch 1 — the one shipped remat config): none 2.489 /
    gru 2.512 / ups 2.536 / gru+ups 2.558 steps/s (+2.8%, additive,
    all rep spreads <0.1%); the grad-accum batch-4 variant also fits
    and speeds up (see PERF.md session 14). Set DVDGAN_REMAT_SAVE=none
    to reclaim the residual HBM on memory-tight custom configs."""
    return layers.env_choice("DVDGAN_REMAT_SAVE", "gru+ups",
                             ("none", "gru", "ups", "gru+ups"))


def init(key: jax.Array, cfg: GConfig) -> tuple[dict, dict]:
    """Returns (params, stats). Orthogonal init everywhere (SURVEY §2.18)."""
    n = cfg.n_levels
    keys = jax.random.split(key, 2 * n + 4)
    c0 = cfg.ch * cfg.mults[0]

    levels = []
    stats_levels = []
    for i in range(n):
        cin, cout = cfg.level_channels(i)
        kg, kb = keys[2 * i], keys[2 * i + 1]
        levels.append({
            "gru": convgru.convgru_init(kg, cin),
            "block": resblocks.gresblock_init(kb, cin, cout, cfg.cond_dim),
        })
        stats_levels.append(resblocks.gresblock_stats_init(cin, cout))

    c_last = cfg.ch * cfg.mults[-1]
    params = {
        "embed": layers.embedding_init(keys[2 * n], cfg.n_classes, cfg.emb_dim),
        "seed": layers.linear_init(
            keys[2 * n + 1], cfg.chunk_dim,
            cfg.base_res * cfg.base_res * c0),
        "levels": levels,
        "out_bn": norm.bn_init(keys[2 * n + 2], c_last),
        "out_conv": layers.conv2d_init(keys[2 * n + 3], 3, c_last, 3),
    }
    if cfg.attn_res is not None and cfg.attn_res <= cfg.img_size:
        # attention applies to the output of the level that reaches attn_res
        c_attn = cfg.ch * cfg.mults[_attn_level_index(cfg) + 1]
        kattn = jax.random.split(keys[2 * n + 3])[0]
        params["attn"] = attention.separable_attn_init(kattn, c_attn)

    if cfg.cond_frames > 0:
        params["fp_enc"] = _fp_encoder_init(
            jax.random.split(keys[2 * n + 2])[1], cfg)

    stats = {"levels": stats_levels, "out_bn": norm.stats_init(c_last)}
    return params, stats


def _fp_encoder_init(key: jax.Array, cfg: GConfig) -> dict:
    """DVD-GAN-FP frame encoder: a strided-conv pyramid from img_size down
    to base_res whose stage at resolution 4·2^i has exactly level i's GRU
    input channels (ch·mults[i]) — its per-frame features warm up that
    level's recurrent state. All kernels named 'w' → spectrally normalized
    by the tree pass like the rest of G."""
    n = cfg.n_levels
    keys = jax.random.split(key, n + 1)
    stem_c = cfg.ch * cfg.mults[n - 1]
    stages = [layers.conv2d_init(keys[0], 3, 3, stem_c)]
    cin = stem_c
    # downsample img -> img/2 -> ... -> 4; the stage landing at 4·2^i
    # emits ch·mults[i] channels (i = n-1 ... 0)
    for j, i in enumerate(range(n - 1, -1, -1)):
        cout = cfg.ch * cfg.mults[i]
        stages.append(layers.conv2d_init(keys[j + 1], 3, cin, cout))
        cin = cout
    return {"stages": stages}


def _fp_encode(params: dict, cond: jax.Array, cfg: GConfig) -> list:
    """cond: (B, C, H, W, 3) in [-1,1] -> per-level time-major feature
    sequences [(C, B, 4·2^i, 4·2^i, ch·m[i]) for i in 0..n_levels-1]."""
    b, c_frames = cond.shape[:2]
    n = cfg.n_levels
    x = cond.reshape(b * c_frames, cfg.img_size, cfg.img_size, 3)
    stages = params["fp_enc"]["stages"]
    x = jax.nn.relu(layers.conv2d(stages[0], x))
    taps: dict[int, jax.Array] = {}
    for j, i in enumerate(range(n - 1, -1, -1)):
        x = jax.nn.relu(layers.conv2d(stages[j + 1], x, stride=2))
        taps[i] = x
    out = []
    for i in range(n):
        t = taps[i]
        r = t.shape[1]
        out.append(jnp.moveaxis(
            t.reshape(b, c_frames, r, r, t.shape[-1]), 1, 0))
    return out


def _attn_level_index(cfg: GConfig) -> int:
    """Index of the upsampling level whose OUTPUT resolution == attn_res."""
    res = cfg.base_res
    for i in range(cfg.n_levels):
        res *= 2
        if res == cfg.attn_res:
            return i
    raise ValueError(f"attn_res={cfg.attn_res} not on the resolution path")


def apply(params: dict, stats: dict, z: jax.Array, y: jax.Array,
          cfg: GConfig, train: bool,
          axis_name: Optional[str] = None,
          cond_video: Optional[jax.Array] = None,
          time_major_out: bool = False) -> tuple[jax.Array, dict]:
    """G(z, y[, cond]) -> (video (B, T, H, W, 3) in [-1, 1], new_stats).

    z: (B, z_dim) float; y: (B,) int32 class ids. `train` is static.
    With cfg.cond_frames > 0 (DVD-GAN-FP), cond_video is the (B,
    cond_frames, H, W, 3) real prefix; each level's ConvGRU warms up by
    scanning over its encoded features and the output is the n_frames
    GENERATED continuation (the prefix is not re-emitted).

    time_major_out=True returns (T, B, H, W, 3) — the INTERNAL layout,
    skipping the final transpose. Consumers that subsample or pool the
    clip anyway (the train step's D inputs) can do so time-major and
    transpose the much smaller result: the full-clip C=3 transpose is
    lane-hostile on TPU (3 of 128 lanes) and shows up as measurable
    copy time in the step profile.
    """
    b = z.shape[0]
    t = cfg.n_frames
    n = cfg.n_levels
    dtype = z.dtype

    e = layers.embedding(params["embed"], y).astype(dtype)     # (B, emb)
    chunks = jnp.split(z, n + 1, axis=-1)

    c0 = cfg.ch * cfg.mults[0]
    x = layers.linear(params["seed"], chunks[0])
    x = x.reshape(b, cfg.base_res, cfg.base_res, c0)
    # broadcast the latent seed over time, TIME-MAJOR: the internal layout
    # is (T, B, H, W, C) end-to-end so the per-level ConvGRU scans consume
    # and produce leading-axis time with NO transpose copies; only the
    # final video transposes to the public (B, T, ...) layout once.
    x_seq = jnp.broadcast_to(x[None], (t, b) + x.shape[1:])

    attn_idx = (_attn_level_index(cfg)
                if "attn" in params else -1)

    if cfg.cond_frames > 0:
        if cond_video is None:
            raise ValueError("cond_frames > 0 requires cond_video")
        enc_seqs = _fp_encode(params, cond_video.astype(dtype), cfg)
    else:
        enc_seqs = [None] * n

    def level_body(lvl, lvl_stats, x_seq, cond, enc_seq, i):
        cond_tb = jnp.tile(cond, (t, 1))                       # (T*B, cond)
        if enc_seq is not None:
            # FP warm-up: the level's own GRU scans the encoded prefix;
            # its final hidden state seeds the generation scan
            warm = checkpoint_name(
                convgru.convgru(lvl["gru"], enc_seq, time_major=True),
                "gru_hs")
            h0 = warm[-1]
        else:
            h0 = None
        # level 0's generation input is the seed broadcast over time —
        # the GRU input conv runs once and broadcasts (exact, 1/T FLOPs)
        h_seq = checkpoint_name(
            convgru.convgru(lvl["gru"], x_seq, h0=h0,
                            time_major=True,
                            x_static=(i == 0)),                # (T,B,H,W,C)
            "gru_hs")
        hw = h_seq.shape[2]
        h = h_seq.reshape(t * b, hw, hw, h_seq.shape[-1])      # fold time
        h, s = resblocks.gresblock(
            lvl["block"], lvl_stats, h, cond_tb,
            train=train, upsample=True, axis_name=axis_name)
        x_seq = h.reshape(t, b, 2 * hw, 2 * hw, h.shape[-1])
        if i == attn_idx:
            x_seq = attention.separable_attn(params["attn"], x_seq,
                                             time_major=True)
        return x_seq, s

    if cfg.remat:
        # recompute each level's activations in backward: HBM footprint of
        # the backward drops from O(levels · T · H · W · C) to one level's
        # worth — what makes the 48-frame / 256px configs fit (SURVEY §5.7).
        # DVDGAN_REMAT_SAVE buys back targeted recompute (the sequential
        # GRU scans / the interleave glue) with named saveables when the
        # config has HBM headroom — see _remat_save.
        save = _remat_save()
        if save == "none":
            level_body = jax.checkpoint(level_body, static_argnums=(5,))
        else:
            names = {"gru": ("gru_hs",), "ups": ("ups_out",),
                     "gru+ups": ("gru_hs", "ups_out")}[save]
            level_body = jax.checkpoint(
                level_body, static_argnums=(5,),
                policy=jax.checkpoint_policies.save_only_these_names(*names))

    new_stats_levels = []
    for i in range(n):
        cond = jnp.concatenate([chunks[i + 1], e], axis=-1)    # (B, cond)
        x_seq, s = level_body(params["levels"][i], stats["levels"][i],
                              x_seq, cond, enc_seqs[i], i)
        new_stats_levels.append(s)

    hw = x_seq.shape[2]
    h = x_seq.reshape(t * b, hw, hw, x_seq.shape[-1])
    h, s_out = norm.bn(params["out_bn"], stats["out_bn"], h,
                       train=train, axis_name=axis_name)
    h = jax.nn.relu(h)
    h = layers.conv2d(params["out_conv"], h)
    video = jnp.tanh(h.astype(jnp.float32)).astype(dtype)
    video = video.reshape(t, b, hw, hw, 3)
    if not time_major_out:
        video = jnp.moveaxis(video, 0, 1)

    return video, {"levels": new_stats_levels, "out_bn": s_out}
