"""Primitive parameterized layers: linear, conv2d, conv3d, embedding.

Pure functions over explicit param dicts. Conventions chosen for the TPU:

  * Activations are channels-last: images (N, H, W, C), videos
    (N, T, H, W, C) — the layout XLA:TPU tiles onto the (8,128)/(16,128)
    vector registers and the MXU without transposes.
  * Kernels are HWIO / DHWIO; linears are (in, out).
  * Compute dtype follows the activation dtype (bf16 in production);
    parameters are stored float32 and cast at use. Outputs keep the
    activation dtype: the MXU accumulates bf16 contractions in float32
    internally and rounds once on output (requesting a float32 output via
    preferred_element_type breaks the conv transpose rule under jax.grad
    when inputs are bf16 — verified on TPU v5e, jax 0.9).

Reference parity: these replace the reference's torch.nn.Conv2d/Conv3d/Linear
/Embedding uses ([R module/*.py], SURVEY.md §2) — there, lowered to cuDNN;
here, to XLA:TPU convolutions on the MXU.
"""

from __future__ import annotations

import itertools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from dvdgan_tpu.core import init as winit

Params = dict

def env_choice(var: str, default: str, allowed: tuple) -> str:
    """Read an A/B env knob, REFUSING unknown values — a typo'd value would
    otherwise silently select whichever lowering the string comparisons
    fall through to (the class of bug the round-2 fake_gen typo-path fix
    addressed)."""
    v = os.environ.get(var, default)
    if v not in allowed:
        raise ValueError(f"{var}={v!r}: must be one of {allowed}")
    return v


def _tphase_interleave() -> str:
    """Trace-time A/B knob (read lazily at each trace so
    tools/ab_inprocess.py can flip it between jits in one process —
    CAVEAT: jax.jit caches the traced jaxpr per FUNCTION OBJECT, so a flip
    only takes effect on a jit of a FRESH closure; re-jitting the same
    function object reuses the old trace. make_multi_step builds a fresh
    closure per variant; verified on-chip by lowered-HLO diff, r4):
      "stack"    — per-phase channel slices stacked on a new time-minor axis
      "moveaxis" — reshape → moveaxis(phase, 2) → reshape (one transpose)
    Both are the same math (bitwise, tested); they steer XLA toward
    different copy emissions in the BACKWARD (the forward interleave fuses
    into the consumer convs either way, but the cotangent un-interleave
    materializes: moveaxis emits 6-D transpose copies, stack emits strided
    slices). MEASURED (v5e flagship scan-bench, 3 runs each, 2026-08-17):
    stack 24.96/25.02/25.01 vs moveaxis 24.34/24.39/24.41 steps/s (+2.5%);
    re-swept in-process 2026-08-19 (4-knob sweep): stack still the winner."""
    return env_choice("DVDGAN_TPHASE_INTERLEAVE", "stack",
                      ("stack", "moveaxis"))


# ---------------------------------------------------------------- linear ----

def linear_init(key, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    p = {"w": winit.orthogonal(key, (in_dim, out_dim))}
    if use_bias:
        p["b"] = winit.zeros((out_dim,))
    return p


def linear(p: Params, x: jax.Array) -> jax.Array:
    w = p["w"].astype(x.dtype)
    y = jnp.dot(x, w)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------- conv2d ----

def conv2d_init(key, k: int, cin: int, cout: int, use_bias: bool = True) -> Params:
    p = {"w": winit.orthogonal(key, (k, k, cin, cout))}
    if use_bias:
        p["b"] = winit.zeros((cout,))
    return p


def conv2d(p: Params, x: jax.Array, stride: int = 1, padding: str = "SAME"
           ) -> jax.Array:
    """x: (N, H, W, C) -> (N, H', W', C_out)."""
    w = p["w"].astype(x.dtype)
    if (stride == 1 and padding == "SAME" and w.shape[:2] == (3, 3)
            and w.shape[2] <= _STEM_DW_MAX_CIN
            and _stem_dw() in ("im2col", "tapdot")):
        y = _conv2d_stem(x, w)
    else:
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------- small-cin weight gradient ----
#
# XLA lowers a conv's WEIGHT gradient as another convolution whose
# contraction feature dim is the forward's cin. For the from-RGB stem convs
# (cin = 3) that grad-conv fills 3 of the MXU's 128 lanes: profiled at
# 256px/48f, DT's two stem dW fusions ran 5.9 ms EACH at 0.7% MXU — ~3% of
# the whole train step in two ops. The im2col form computes the same sums
# as ONE tall matmul instead: dW[taps·cin, cout] = cols[tokens, taps·cin]^T
# · g[tokens, cout], with K = tokens (millions) giving full MXU depth; the
# shifted-window cols tensor costs one taps× HBM pass. Forward and
# input-grad are unchanged (the SAME lax conv ops autodiff emits); only
# dW's summation ORDER changes (matmul reassociation — same exactness
# class as the tpair/rowpack rewrites, grads tested against autodiff).
# Trace-time knob DVDGAN_STEM_DW=im2col|conv — MEASURED LOSER, default
# conv; see _stem_dw for the numbers and the lane-starved-concat analysis.

_STEM_DW_MAX_CIN = 4

# tapdot's measured win is the 256px DT 3-D stem, which runs at 128×128
# spatial (+3.4% with both its instances flipped). NEITHER dimensionality
# nor token count separates win from loss on their own: 2-D stems lose
# everywhere tested (flagship −1.2%), and the 128px D-phase DT stem has
# the SAME 786k token count as a winning 256px instance but runs at
# 64×64 spatial and loses ~10%. The empirical discriminator across all
# six measured stem instances is the stem's SPATIAL map: wins at 128²,
# losses at ≤64². The "auto" default therefore engages tapdot only for
# 3-D stems whose spatial map is ≥ _TAPDOT_MIN_HW on both axes.
_TAPDOT_MIN_HW = 128


def _tapdot_min_hw() -> int:
    """Trace-time override of the auto boundary (A/B + custom-config
    tuning knob)."""
    v = os.environ.get("DVDGAN_TAPDOT_MIN_HW")
    if v is None:
        return _TAPDOT_MIN_HW
    try:
        return int(v)
    except ValueError:
        raise ValueError(f"DVDGAN_TAPDOT_MIN_HW={v!r}: must be an int")


def _stem_hw_ok(shape) -> bool:
    """True when the stem input's spatial map (last two dims before
    channels) meets the auto boundary."""
    th = _tapdot_min_hw()
    return int(shape[-3]) >= th and int(shape[-2]) >= th


def _stem_dw() -> str:
    """Trace-time A/B knob (lazy read per trace; fresh-closure caveat as
    _tphase_interleave). MEASURED LOSER (v5e 256px/48f ab_inprocess,
    3 reps, 2026-08-20): im2col 2.409 vs conv 2.474 steps/s (−2.6%,
    non-overlapping reps) — the tall matmul is fast, but building its
    cols operand means reading/writing a taps× copy of the stem input
    at cin=3 of 128 LANES (the concat inherits the exact lane
    starvation the rewrite was meant to escape), and that traffic
    exceeds the 5.9 ms grad-conv it replaces. Default conv (XLA's
    lowering); knob + equivalence tests kept for re-measurement if a
    lane-major cols layout is ever built.

    "tapdot" (r5): the cols-free third form — one (tokens, cin)ᵀ·
    (tokens, cout) dot_general PER TAP, K = tokens at full MXU depth,
    no taps×-concat intermediate. MEASURED (v5e ab_inprocess, 3 reps,
    2026-08-20): 256px/48f **2.628 vs 2.557 (+2.8%) — WIN**; 128px/12f
    6.40 vs 7.316 (−12.5%) and flagship 25.37 vs 25.68 (−1.2%) —
    LOSERS. Strongly token-count-dependent, so the default "auto"
    engages tapdot only when the stem's token count reaches
    _TAPDOT_MIN_TOKENS (the 256px DT stem has 786k tokens and wins;
    the 128px one has 393k and loses badly) and keeps XLA's grad-conv
    below it — at the shipped presets "auto" is bitwise-identical to
    the old default everywhere except 256px."""
    return env_choice("DVDGAN_STEM_DW", "auto", ("auto", "im2col",
                                                 "conv", "tapdot"))


def _sphase_interleave() -> str:
    """Trace-time A/B knob for upsample2x_conv3x3's 2×2 spatial phase
    interleave (lazy read; fresh-closure caveat as _tphase_interleave):
      "stack"   — double stack + reshape (backward: slice-grad pads)
      "scatter" — strided .at[::2].set into zeros (backward: strided
                  gathers)
    Same math (equivalence-tested both ways)."""
    return env_choice("DVDGAN_SPHASE_INTERLEAVE", "stack",
                      ("stack", "scatter"))


def _ups_pallas() -> str:
    """Trace-time knob for the fused Pallas upsample kernel
    (kernels/ups2x_fused.py — phase conv + interleave in one pass, the
    256px glue-cluster attack):
      "off"  — lax phase conv + stack interleave (measured default)
      "fwd"  — Pallas forward, recompute lax backward
      "full" — Pallas forward + Pallas backward (dxp/dwall accumulation)
    Same math all three ways (oracle + gradient equivalence tested)."""
    return env_choice("DVDGAN_UPS_PALLAS", "off", ("off", "fwd", "full"))


def _ups_grad_barrier() -> str:
    """Trace-time A/B knob: grad_barrier on upsample2x_conv3x3's output —
    materializes the incoming cotangent before the interleave backward so
    XLA can't drag the slice-grad pad fusion into the next layer's
    ReLU-mask layout (the 256px profile shows those fused pads copied
    TWICE through exotic layouts)."""
    return env_choice("DVDGAN_UPS_GRAD_BARRIER", "off", ("on", "off"))


def _dw_im2col(x_pad: jax.Array, g: jax.Array, offsets, out_shape, dtype):
    """dW via one tall matmul. x_pad: spatially padded input; g: output
    cotangent; offsets: per-tap start indices into x_pad (tap-major,
    cin stays minor). Accumulates in f32 (the MXU's native accumulator —
    XLA's grad-conv does the same)."""
    spatial = g.shape[1:-1]
    cols = jnp.concatenate(
        [jax.lax.slice(x_pad,
                       (0, *off, 0),
                       (x_pad.shape[0], *(o + s for o, s in zip(off, spatial)),
                        x_pad.shape[-1]))
         for off in offsets], axis=-1)
    tokens = int(np.prod(g.shape[:-1]))
    dw = jax.lax.dot_general(
        cols.reshape(tokens, -1), g.reshape(tokens, g.shape[-1]),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dw.reshape(out_shape).astype(dtype)


def _dw_tapdot(x_pad: jax.Array, g: jax.Array, offsets, out_shape, dtype):
    """dW as one dot_general PER TAP — no cols concat: each tap's shifted
    window feeds the matmul directly ((tokens, cin)ᵀ·(tokens, cout),
    K = tokens full MXU depth, f32 accumulate). Same sums as the conv /
    im2col forms up to reassociation."""
    spatial = g.shape[1:-1]
    tokens = int(np.prod(g.shape[:-1]))
    gf = g.reshape(tokens, g.shape[-1])
    dws = []
    for off in offsets:
        sl = jax.lax.slice(
            x_pad, (0, *off, 0),
            (x_pad.shape[0], *(o + s for o, s in zip(off, spatial)),
             x_pad.shape[-1]))
        dws.append(jax.lax.dot_general(
            sl.reshape(tokens, -1), gf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dw = jnp.stack(dws)
    return dw.reshape(out_shape).astype(dtype)


def _make_stem_conv(nd: int):
    """Build the custom-vjp stride-1 SAME k=3 conv for nd spatial dims."""
    dn = ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NDHWC", "DHWIO", "NDHWC")
    ones = (1,) * nd

    def fwd_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=ones, padding="SAME",
            dimension_numbers=dn)

    @jax.custom_vjp
    def stem_conv(x, w):
        return fwd_conv(x, w)

    def _fwd(x, w):
        return fwd_conv(x, w), (x, w)

    def _bwd(res, g):
        x, w = res
        # dx: exactly the transposed conv autodiff emits (flip taps, swap
        # cin/cout) — unchanged from plain autodiff.
        w_t = jnp.swapaxes(jnp.flip(w, tuple(range(nd))), -1, -2)
        dx = jax.lax.conv_general_dilated(
            g, w_t, window_strides=ones, padding="SAME",
            dimension_numbers=dn)
        # dW: im2col matmul or per-tap dots (see block comment above).
        pad = [(0, 0)] + [(1, 1)] * nd + [(0, 0)]
        x_pad = jnp.pad(x, pad)
        offsets = list(itertools.product(range(3), repeat=nd))
        mode = _stem_dw()
        if mode == "tapdot" or (mode == "auto" and _stem_hw_ok(g.shape)):
            dw = _dw_tapdot(x_pad, g, offsets, w.shape, w.dtype)
        else:
            dw = _dw_im2col(x_pad, g, offsets, w.shape, w.dtype)
        return dx, dw

    stem_conv.defvjp(_fwd, _bwd)
    return stem_conv


_conv2d_stem = _make_stem_conv(2)
_conv3d_stem = _make_stem_conv(3)


# ---------------------------------------------------------------- conv3d ----

def conv3d_init(key, k: tuple[int, int, int], cin: int, cout: int,
                use_bias: bool = True) -> Params:
    kt, kh, kw = k
    p = {"w": winit.orthogonal(key, (kt, kh, kw, cin, cout))}
    if use_bias:
        p["b"] = winit.zeros((cout,))
    return p


def conv3d(p: Params, x: jax.Array, stride: tuple[int, int, int] = (1, 1, 1),
           padding: str = "SAME") -> jax.Array:
    """x: (N, T, H, W, C) -> (N, T', H', W', C_out). Used by DT's first
    blocks (SURVEY.md §2.8): 3×3×3 kernels, NDHWC/DHWIO on the MXU."""
    w = p["w"].astype(x.dtype)
    if (stride == (1, 1, 1) and padding == "SAME"
            and w.shape[:3] == (3, 3, 3)
            and w.shape[3] <= _STEM_DW_MAX_CIN
            and (_stem_dw() in ("im2col", "tapdot")
                 or (_stem_dw() == "auto" and _stem_hw_ok(x.shape)))):
        y = _conv3d_stem(x, w)
    else:
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=stride,
            padding=padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def upsample2x_conv3x3(p: Params, x: jax.Array) -> jax.Array:
    """EXACTLY nearest-upsample-2× followed by a SAME 3×3 conv — computed
    as ONE 2×2-kernel VALID conv with 4 output phases + an interleave.

    Nearest-up duplicates every pixel, so the 3×3 conv over the upsampled
    grid re-reads each source pixel with duplicated taps: per output phase
    (p, q) ∈ {0,1}² the 3 taps collapse to 2 per dimension
    (⌊(2i+p+a)/2⌋ hits only two distinct source rows), giving per-phase
    2×2 kernels that are SUMS of the original taps:
        rows p=0: [w0, w1+w2]      rows p=1: [w0+w1, w2]   (same per cols)
    16·C·C MACs per source pixel instead of 36·C·C — 2.25× fewer FLOPs,
    bit-exact up to float reassociation (zero-pad boundaries included;
    equivalence + gradients tested against the up→conv oracle).
    """
    w = p["w"]                                        # (3, 3, Cin, Cout)
    cout = w.shape[-1]
    r0 = jnp.stack([w[0], w[1] + w[2]])               # (2, 3, Cin, Cout)
    r1 = jnp.stack([w[0] + w[1], w[2]])

    def cols(r):
        return (jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1),
                jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1))

    w00, w01 = cols(r0)
    w10, w11 = cols(r1)                               # each (2, 2, Cin, Cout)
    wall = jnp.concatenate([w00, w01, w10, w11], axis=-1).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ups_mode = _ups_pallas()
    if ups_mode != "off":
        from dvdgan_tpu.kernels import ups2x_fused
        cin = x.shape[-1]
        if ups2x_fused.fits_fwd(x.shape[1], x.shape[2], cin, cout,
                                x.dtype.itemsize):
            # interpreted on CPU (tests exercise the real routing; the
            # knob's default-off keeps production CPU paths on lax)
            out = ups2x_fused.ups2x(wall.reshape(4 * cin, 4 * cout), xp,
                                    ups_mode == "full",
                                    jax.default_backend() == "cpu")
            if _ups_grad_barrier() == "on":
                out = grad_barrier(out)
            if "b" in p:
                out = out + p["b"].astype(x.dtype)
            return checkpoint_name(out, "ups_out")
    y = jax.lax.conv_general_dilated(
        xp, wall, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (N, H+1, W+1, 4Cout)
    n, hp1, wp1, _ = y.shape
    h, wd = hp1 - 1, wp1 - 1
    y00 = y[:, :h, :wd, 0 * cout:1 * cout]
    y01 = y[:, :h, 1:, 1 * cout:2 * cout]
    y10 = y[:, 1:, :wd, 2 * cout:3 * cout]
    y11 = y[:, 1:, 1:, 3 * cout:4 * cout]
    if _sphase_interleave() == "scatter":
        # strided scatters: the BACKWARD of .at[::2].set is a strided
        # GATHER per phase — no slice-grad pads to lay out (the stack
        # variant's backward emits pad fusions whose exotic layouts cost
        # two full-tensor copies each at the 256px top level).
        out = jnp.zeros((n, 2 * h, 2 * wd, cout), y.dtype)
        out = out.at[:, 0::2, 0::2].set(y00).at[:, 0::2, 1::2].set(y01)
        out = out.at[:, 1::2, 0::2].set(y10).at[:, 1::2, 1::2].set(y11)
    else:
        top = jnp.stack([y00, y01], axis=3)           # (N, H, W, 2, Cout)
        bot = jnp.stack([y10, y11], axis=3)
        out = jnp.stack([top, bot], axis=2)           # (N, H, 2, W, 2, Cout)
        out = out.reshape(n, 2 * h, 2 * wd, cout)
    if _ups_grad_barrier() == "on":
        out = grad_barrier(out)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    # remat saveable tag: identity outside jax.checkpoint; under the
    # generator's DVDGAN_REMAT_SAVE=ups|gru+ups policy the interleaved
    # output is SAVED so the backward never recomputes the phase-interleave
    # pad/copy chains (the 256px profile's largest forward-glue cluster).
    return checkpoint_name(out, "ups_out")


def conv2d_rowpair(p: Params, x: jax.Array) -> jax.Array:
    """EXACTLY conv2d (3×3, SAME, stride 1) as an output ROW-PAIR conv:
    adjacent output rows become one 2·Cout-channel conv (rows 2r and 2r+1
    from the widened window X[2r-1..2r+2]; kernel rows zero-padded to 4,
    row stride 2), interleaved back. The 2-D analog of conv3d_tpair —
    doubles MXU lane fill for narrow-Cout convs at 4/3× nominal FLOPs.
    Requires even H."""
    if x.shape[1] % 2:
        raise ValueError(f"conv2d_rowpair needs even H, got {x.shape[1]}")
    w = p["w"]                                     # (3, 3, Cin, Cout)
    co = w.shape[-1]
    even = jnp.pad(w, ((0, 1),) + ((0, 0),) * 3)   # rows [w0,w1,w2,0]
    odd = jnp.pad(w, ((1, 0),) + ((0, 0),) * 3)    # rows [0,w0,w1,w2]
    wall = jnp.concatenate([even, odd], axis=-1).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, wall, window_strides=(2, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, h2, wd, _ = y.shape
    y = jnp.stack([y[..., :co], y[..., co:]], axis=2)   # (N, H/2, 2, W, C)
    y = y.reshape(n, 2 * h2, wd, co)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv3d_tpair(p: Params, x: jax.Array) -> jax.Array:
    """EXACTLY conv3d (3×3×3, SAME, stride 1) computed as a temporal
    OUTPUT-PAIR conv: two adjacent output frames become one 2·Cout-channel
    conv (kernel taps zero-padded to 4, temporal stride 2), then the pair
    interleaves back into the time axis.

    Why: DT's 3-D convs have Cout = 32/64 — half (or a quarter) of the
    MXU's 128 output lanes, which caps them at 25-50% of peak. Pairing
    doubles the lane fill for 4/3× the nominal FLOPs (the padded taps are
    zeros but still scheduled): a net win iff the conv was lane-bound.
    Phase kernels: even outputs Y[2t] read X[2t-1..2t+1] (taps [w0,w1,w2,0]
    of the widened window X[2t-1..2t+2]); odd outputs Y[2t+1] read
    X[2t..2t+2] (taps [0,w0,w1,w2]). Bit-exact up to float reassociation
    (oracle + gradient equivalence tested). Requires even T.
    """
    y = conv3d_tpair_core(p["w"], x, time_pad=(1, 1))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv3d_tpair_core(w: jax.Array, x: jax.Array,
                      time_pad: tuple[int, int]) -> jax.Array:
    """The output-pair lowering shared by conv3d_tpair (time_pad=(1,1),
    SAME semantics) and the time-CP halo conv (time_pad=(0,0): x already
    carries 1-frame halos, so stride-2 windows from the left halo cover
    exactly the local output frames). No bias."""
    return conv3d_tphase_core(w, x, 2, time_pad)


def conv3d_tphase_core(w: jax.Array, x: jax.Array, n_phases: int,
                       time_pad: tuple[int, int]) -> jax.Array:
    """Generalized temporal output-phasing of a kt=3 conv3d: n adjacent
    output frames become one n·Cout-channel conv with temporal stride n.
    Output nτ+p reads inputs nτ+p-1..nτ+p+1, i.e. kernel positions
    p..p+2 of the widened (3+n-1)-tap window starting at nτ-1 — so phase
    p's kernel is w zero-padded with p leading and n-1-p trailing taps.
    The SAME-padding arithmetic is n-independent: pad (1,1) gives exactly
    T/n windows. n=2 doubles lane fill at 4/3× FLOPs (Cout=64); n=4
    quadruples it at 2× FLOPs (Cout=32). Exact math; requires T % n == 0.
    No bias."""
    if (x.shape[1] + sum(time_pad) - 2) % n_phases:
        # would silently truncate trailing output frames otherwise
        raise ValueError(
            f"temporal length {x.shape[1]} (+pad {time_pad}) not divisible "
            f"into {n_phases}-frame output phases")
    co = w.shape[-1]
    phases = [jnp.pad(w, ((p, n_phases - 1 - p),) + ((0, 0),) * 4)
              for p in range(n_phases)]
    wall = jnp.concatenate(phases, axis=-1).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, wall, window_strides=(n_phases, 1, 1),
        padding=(time_pad, (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    n, tn, h, wd, _ = y.shape
    if _tphase_interleave() == "stack":
        parts = [y[..., p * co:(p + 1) * co] for p in range(n_phases)]
        y = jnp.stack(parts, axis=2)                # (N, T/n, n, H, W, C)
    else:
        y = y.reshape(n, tn, h, wd, n_phases, co)   # phase-major blocks
        y = jnp.moveaxis(y, 4, 2)                   # (N, T/n, n, H, W, C)
    return y.reshape(n, tn * n_phases, h, wd, co)


@jax.custom_vjp
def grad_barrier(x: jax.Array) -> jax.Array:
    """Identity whose BACKWARD materializes the cotangent (optimization
    barrier on the gradient only; forward fuses freely).

    Use between a wide conv and a narrow-channel stem conv: without it XLA
    fuses both backward convs into one kOutput fusion whose output layout
    is dictated by the tiny cin-3 input-grad (batch-minor, 3-channel lanes),
    dragging the wide conv's input-grad to ~14% MXU (profiled 1.62 ms for
    27.9 GFLOP at the DT stem vs ~0.6 ms for the same-size weight-grad)."""
    return x


def _gb_fwd(x):
    return x, None


def _gb_bwd(_, g):
    return (jax.lax.optimization_barrier(g),)


grad_barrier.defvjp(_gb_fwd, _gb_bwd)


# ------------------------------------------------------------- embedding ----

def embedding_init(key, n: int, dim: int) -> Params:
    # BigGAN initializes embeddings orthogonally and spectrally normalizes
    # them; leaf name 'emb' opts into the SN pass (ops/spectral_norm.py).
    return {"emb": winit.orthogonal(key, (n, dim))}


def embedding(p: Params, idx: jax.Array) -> jax.Array:
    """idx: int array (...,) -> (..., dim). take() not one-hot matmul: the
    table is tiny and gather is cheaper than an (N × n_class) matmul."""
    return jnp.take(p["emb"], idx, axis=0)
