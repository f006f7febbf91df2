"""PyTorch twin of the DVD-GAN models — an INDEPENDENT reference-semantics
implementation used for cross-framework verification.

Why this exists: the reference mount is empty (SURVEY.md provenance notice),
so "bitwise-comparable sampling vs the reference" (BASELINE north star,
VERDICT round-1 missing #7) cannot be checked against the actual torch repo.
The next-best evidence is this file: the same math written a second time, in
PyTorch's native idiom (NCHW activations, OIHW kernels, concat-kernel
ConvGRU, naive upsample→conv / conv→pool orderings, nn.BatchNorm2d), from
the behavioral spec in SURVEY.md §2 — NOT from the JAX code's structure.
tests/test_torch_parity.py loads identical weights into both frameworks and
demands agreement, which cross-checks, in particular, every layout
convention (HWIO↔OIHW, channels-last↔NCHW, reshape orders) and every
algebraic rewrite the TPU path makes:

  * ConvGRU hoisted input/hidden conv halves  == concat-kernel formulation
  * phase-decomposed upsample2x_conv3x3       == F.interpolate → Conv2d
  * pooled-then-1×1 skip convs in D blocks    == Conv2d → F.avg_pool2d
  * folded (B·T) batch CBN                    == per-frame nn.BatchNorm2d
    over the same folded batch

This module is also the documented interchange format for
tools/import_torch_checkpoint.py: a torch checkpoint whose state_dict uses
these module names can be converted into a dvdgan_tpu parameter pytree.

Torch is CPU-only in this environment; everything here is float32 and
test-scale. Not imported by the production package.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------- modules ----


class ConvGRUCell(nn.Module):
    """Classic ConvGRU with concat-kernel convs (SURVEY.md §2.3):
    rz = σ(Conv3×3([x, h])); c = tanh(Conv3×3'([x, r⊙h]));
    h' = (1−z)⊙h + z⊙c.  r is the first C gate channels, z the second."""

    def __init__(self, c: int):
        super().__init__()
        self.gates = nn.Conv2d(2 * c, 2 * c, 3, padding=1)
        self.cand = nn.Conv2d(2 * c, c, 3, padding=1)

    def forward(self, x, h):
        rz = torch.sigmoid(self.gates(torch.cat([x, h], dim=1)))
        r, z = rz.chunk(2, dim=1)
        c = torch.tanh(self.cand(torch.cat([x, r * h], dim=1)))
        return (1.0 - z) * h + z * c


class ConditionalNorm(nn.Module):
    """Class-conditional BN (SURVEY.md §2.2): BN without affine params, then
    per-sample γ = 1 + W_g·cond, β = W_b·cond (zero-centered linears)."""

    def __init__(self, cond_dim: int, c: int):
        super().__init__()
        self.bn = nn.BatchNorm2d(c, affine=False)
        self.gamma = nn.Linear(cond_dim, c, bias=False)
        self.beta = nn.Linear(cond_dim, c, bias=False)

    def forward(self, x, cond):
        y = self.bn(x)
        g = 1.0 + self.gamma(cond)
        b = self.beta(cond)
        return y * g[:, :, None, None] + b[:, :, None, None]


class GResBlock(nn.Module):
    """BigGAN-style G block (SURVEY.md §2.4), the naive operation order:
    CBN→ReLU→[nearest-up 2×]→Conv3×3→CBN→ReLU→Conv3×3;
    skip = [nearest-up]→Conv1×1 (identity if channels match)."""

    def __init__(self, cin: int, cout: int, cond_dim: int, upsample: bool):
        super().__init__()
        self.upsample = upsample
        self.cbn1 = ConditionalNorm(cond_dim, cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.cbn2 = ConditionalNorm(cond_dim, cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.skip = (nn.Conv2d(cin, cout, 1) if cin != cout else None)

    def forward(self, x, cond):
        h = F.relu(self.cbn1(x, cond))
        if self.upsample:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
        h = self.conv1(h)
        h = F.relu(self.cbn2(h, cond))
        h = self.conv2(h)
        sc = x
        if self.upsample:
            sc = F.interpolate(sc, scale_factor=2, mode="nearest")
        if self.skip is not None:
            sc = self.skip(sc)
        return h + sc


class DBlock(nn.Module):
    """Pre-activation D block (SURVEY.md §2.7), naive order:
    [ReLU]→Conv3×3→ReLU→Conv3×3→[avgpool 2×];
    skip = Conv1×1→[avgpool]  (first/from-RGB variant: avgpool→Conv1×1)."""

    def __init__(self, cin: int, cout: int, down: bool, first: bool = False):
        super().__init__()
        self.down, self.first = down, first
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.skip = (nn.Conv2d(cin, cout, 1) if (first or cin != cout)
                     else None)

    def forward(self, x):
        h = x if self.first else F.relu(x)
        h = self.conv2(F.relu(self.conv1(h)))
        if self.down:
            h = F.avg_pool2d(h, 2)
        sc = x
        if self.first:
            if self.down:
                sc = F.avg_pool2d(sc, 2)
            if self.skip is not None:
                sc = self.skip(sc)
        else:
            if self.skip is not None:
                sc = self.skip(sc)
            if self.down:
                sc = F.avg_pool2d(sc, 2)
        return h + sc


class DBlock3d(nn.Module):
    """3-D variant for DT's leading blocks (SURVEY.md §2.8): 3×3×3 convs,
    spatial-only pooling. Input NCTHW."""

    def __init__(self, cin: int, cout: int, down: bool, first: bool = False):
        super().__init__()
        self.down, self.first = down, first
        self.conv1 = nn.Conv3d(cin, cout, 3, padding=1)
        self.conv2 = nn.Conv3d(cout, cout, 3, padding=1)
        self.skip = (nn.Conv3d(cin, cout, 1) if (first or cin != cout)
                     else None)

    @staticmethod
    def _pool(x):  # spatial-only 2× mean pool on NCTHW
        return F.avg_pool3d(x, (1, 2, 2))

    def forward(self, x):
        h = x if self.first else F.relu(x)
        h = self.conv2(F.relu(self.conv1(h)))
        if self.down:
            h = self._pool(h)
        sc = x
        if self.first:
            if self.down:
                sc = self._pool(sc)
            if self.skip is not None:
                sc = self.skip(sc)
        else:
            if self.skip is not None:
                sc = self.skip(sc)
            if self.down:
                sc = self._pool(sc)
        return h + sc


class AttnPass(nn.Module):
    """One SAGAN-style single-head pass (SURVEY.md §2.5): θ C→C/8, φ C→C/8,
    g C→C/2, out C/2→C (all bias-free 1×1 ≡ Linear over channels), softmax
    without 1/√d, residual through learnable scalar γ (init 0)."""

    def __init__(self, c: int):
        super().__init__()
        self.theta = nn.Linear(c, c // 8, bias=False)
        self.phi = nn.Linear(c, c // 8, bias=False)
        self.g = nn.Linear(c, c // 2, bias=False)
        self.out = nn.Linear(c // 2, c, bias=False)
        self.gamma = nn.Parameter(torch.zeros(()))

    def forward(self, x_tokens, kv_tokens):
        q = self.theta(x_tokens)                       # (N, L, C/8)
        k = self.phi(kv_tokens)                        # (N, L', C/8)
        v = self.g(kv_tokens)                          # (N, L', C/2)
        attn = torch.softmax(q @ k.transpose(1, 2), dim=-1)
        return self.gamma * self.out(attn @ v)


class SeparableAttn(nn.Module):
    """Separable spatio-temporal attention: spatial pass per frame (keys and
    values 2×2-max-pooled), then temporal pass per spatial location.
    Input (B, T, C, H, W)."""

    def __init__(self, c: int):
        super().__init__()
        self.spatial = AttnPass(c)
        self.temporal = AttnPass(c)

    def forward(self, x):
        b, t, c, h, w = x.shape
        xs = x.reshape(b * t, c, h * w).transpose(1, 2)       # (BT, HW, C)
        grid = xs.transpose(1, 2).reshape(b * t, c, h, w)
        kv = F.max_pool2d(grid, 2).reshape(b * t, c, -1).transpose(1, 2)
        xs = xs + self.spatial(xs, kv)
        x = xs.transpose(1, 2).reshape(b, t, c, h, w)
        xt = x.permute(0, 3, 4, 1, 2).reshape(b * h * w, t, c)
        xt = xt + self.temporal(xt, xt)
        x = xt.reshape(b, h, w, t, c).permute(0, 3, 4, 1, 2)
        return x


class FPEncoder(nn.Module):
    """DVD-GAN-FP frame encoder (models/generator._fp_encoder_init): a
    strided-conv pyramid from img_size down to base_res; the stage landing
    at resolution 4·2^i emits level i's GRU input channels. The stride-2
    convs replicate XLA's asymmetric SAME padding on even inputs
    (pad (0,1) per spatial dim) via explicit F.pad — torch's symmetric
    padding=1 would shift the window grid."""

    def __init__(self, cfg):
        super().__init__()
        n = cfg.n_levels
        stem_c = cfg.ch * cfg.mults[n - 1]
        stages = [nn.Conv2d(3, stem_c, 3, padding=1)]
        cin = stem_c
        for i in range(n - 1, -1, -1):
            stages.append(nn.Conv2d(cin, cfg.ch * cfg.mults[i], 3,
                                    padding=0, stride=2))
            cin = cfg.ch * cfg.mults[i]
        self.stages = nn.ModuleList(stages)
        self.n = n

    def forward(self, cond):
        # cond (B, C_frames, H, W, 3) channels-last -> {level: (B*Cf, C, r, r)}
        b, cf = cond.shape[:2]
        x = cond.reshape(b * cf, *cond.shape[2:]).permute(0, 3, 1, 2)
        x = F.relu(self.stages[0](x))
        taps = {}
        for j, i in enumerate(range(self.n - 1, -1, -1)):
            x = F.relu(self.stages[j + 1](F.pad(x, (0, 1, 0, 1))))
            taps[i] = x
        return taps, b, cf


class Generator(nn.Module):
    """Reference-semantics G (SURVEY.md §2.6/§3.2). Takes the dvdgan_tpu
    GConfig for its topology so both frameworks build identical shapes.
    With cfg.cond_frames > 0 (DVD-GAN-FP) each level's ConvGRU warms up
    over the encoded real prefix before the generation unroll."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        n = cfg.n_levels
        c0 = cfg.ch * cfg.mults[0]
        self.embed = nn.Embedding(cfg.n_classes, cfg.emb_dim)
        self.seed = nn.Linear(cfg.chunk_dim,
                              cfg.base_res * cfg.base_res * c0)
        self.grus = nn.ModuleList()
        self.blocks = nn.ModuleList()
        for i in range(n):
            cin, cout = cfg.level_channels(i)
            self.grus.append(ConvGRUCell(cin))
            self.blocks.append(GResBlock(cin, cout, cfg.cond_dim,
                                         upsample=True))
        c_last = cfg.ch * cfg.mults[-1]
        self.attn = None
        if cfg.attn_res is not None and cfg.attn_res <= cfg.img_size:
            self.attn_level = int(math.log2(cfg.attn_res // cfg.base_res)) - 1
            c_attn = cfg.ch * cfg.mults[self.attn_level + 1]
            self.attn = SeparableAttn(c_attn)
        self.fp_enc = FPEncoder(cfg) if cfg.cond_frames > 0 else None
        self.out_bn = nn.BatchNorm2d(c_last)
        self.out_conv = nn.Conv2d(c_last, 3, 3, padding=1)

    def forward(self, z, y, cond_video=None):
        cfg = self.cfg
        b = z.shape[0]
        t = cfg.n_frames
        n = cfg.n_levels
        e = self.embed(y)
        chunks = torch.chunk(z, n + 1, dim=-1)
        c0 = cfg.ch * cfg.mults[0]
        enc_taps = None
        if self.fp_enc is not None:
            enc_taps, _, n_cond = self.fp_enc(cond_video)
        # the seed vector lays out as (H, W, C) row-major — the same memory
        # order the channels-last framework reshapes into
        x = self.seed(chunks[0]).view(b, cfg.base_res, cfg.base_res, c0)
        x = x.permute(0, 3, 1, 2).contiguous()         # NCHW
        frames = [x] * t                               # broadcast over time
        for i in range(n):
            cond = torch.cat([chunks[i + 1], e], dim=-1)
            h = torch.zeros_like(frames[0])
            if enc_taps is not None:
                # warm-up: scan the level's GRU over the encoded prefix
                tap = enc_taps[i]                      # (B*Cf, C, r, r)
                cc = tap.shape[1]
                r = tap.shape[-1]
                seq = tap.reshape(b, n_cond, cc, r, r)
                hw = torch.zeros_like(seq[:, 0])
                for j in range(n_cond):
                    hw = self.grus[i](seq[:, j], hw)
                h = hw
            outs = []
            for xt in frames:                          # sequential ConvGRU
                h = self.grus[i](xt, h)
                outs.append(h)
            # fold time-major (T·B) for the per-frame block, matching the
            # TPU path's fold order so batch-stat math sees the same batch
            hcat = torch.cat(outs, dim=0)
            cond_tb = cond.repeat(t, 1)
            hcat = self.blocks[i](hcat, cond_tb)
            frames = list(hcat.chunk(t, dim=0))
            if self.attn is not None and i == self.attn_level:
                clip = torch.stack(frames, dim=1)      # (B, T, C, H, W)
                clip = self.attn(clip)
                frames = [clip[:, j] for j in range(t)]
        hcat = torch.cat(frames, dim=0)
        hcat = self.out_conv(F.relu(self.out_bn(hcat)))
        video = torch.tanh(hcat)
        tb = video.reshape(t, b, *video.shape[1:])     # (T, B, 3, H, W)
        return tb.permute(1, 0, 3, 4, 2).contiguous()  # (B, T, H, W, 3)


class ProjectionHead(nn.Module):
    """ψ·feats + embed(y)·feats (Miyato projection discriminator)."""

    def __init__(self, feat_dim: int, n_classes: int):
        super().__init__()
        self.psi = nn.Linear(feat_dim, 1)
        self.proj = nn.Embedding(n_classes, feat_dim)

    def forward(self, feats, y):
        return self.psi(feats)[:, 0] + (self.proj(y) * feats).sum(-1)


class SpatialDiscriminator(nn.Module):
    """DS (SURVEY.md §2.7): scores k full-res frames, sums per clip."""

    def __init__(self, cfg):
        super().__init__()
        m = cfg.mults
        n_down = len(m) - 1
        blocks = [DBlock(3, cfg.ch * m[0], down=n_down > 0, first=True)]
        for i in range(1, len(m)):
            blocks.append(DBlock(cfg.ch * m[i - 1], cfg.ch * m[i],
                                 down=i < n_down))
        self.blocks = nn.ModuleList(blocks)
        self.head = ProjectionHead(cfg.feat_dim, cfg.n_classes)

    def forward(self, frames, y):
        # frames (B, k, H, W, 3) channels-last, y (B,)
        b, k = frames.shape[:2]
        x = frames.reshape(b * k, *frames.shape[2:]).permute(0, 3, 1, 2)
        for blk in self.blocks:
            x = blk(x)
        feats = F.relu(x).sum(dim=(2, 3))
        scores = self.head(feats, y.repeat_interleave(k))
        return scores.view(b, k).sum(dim=1)


class TemporalDiscriminator(nn.Module):
    """DT (SURVEY.md §2.8): φ = spatial 2× avg-pool, n_3d_blocks leading
    3-D blocks, 2-D tail, scores summed over frames."""

    def __init__(self, cfg):
        super().__init__()
        m = cfg.mults
        self.n3 = cfg.n_3d_blocks
        n_down = len(m) - 1
        blocks = []
        for i in range(len(m)):
            cin = 3 if i == 0 else cfg.ch * m[i - 1]
            cout = cfg.ch * m[i]
            cls = DBlock3d if i < self.n3 else DBlock
            blocks.append(cls(cin, cout, down=i < n_down, first=i == 0))
        self.blocks = nn.ModuleList(blocks)
        self.head = ProjectionHead(cfg.feat_dim, cfg.n_classes)

    def forward(self, clip, y):
        # clip (B, T, H, W, 3) channels-last full-res, y (B,)
        b, t = clip.shape[:2]
        x = clip.permute(0, 1, 4, 2, 3)                          # (B,T,3,H,W)
        x = x.reshape(b * t, *x.shape[2:])
        x = F.avg_pool2d(x, 2)                                   # φ
        x = x.reshape(b, t, *x.shape[1:]).transpose(1, 2)        # NCTHW
        for blk in self.blocks[:self.n3]:
            x = blk(x)
        x = x.transpose(1, 2).reshape(b * t, *x.shape[1:2] + x.shape[3:])
        for blk in self.blocks[self.n3:]:
            x = blk(x)
        feats = F.relu(x).sum(dim=(2, 3))
        scores = self.head(feats, y.repeat_interleave(t))
        return scores.view(b, t).sum(dim=1)


# ------------------------------------------------- weight interchange --------
# The dvdgan_tpu ↔ torch layout contract, in one place:
#   conv2d  HWIO (kh,kw,ci,co)      <-> OIHW  : transpose(3,2,0,1)
#   conv3d  DHWIO (kt,kh,kw,ci,co)  <-> OIDHW : transpose(4,3,0,1,2)
#   linear  (in,out)                <-> (out,in): .T
#   embedding (n,dim)               <-> (n,dim): identity


def _t(a) -> torch.Tensor:
    return torch.from_numpy(np.asarray(a, np.float32).copy())


def set_conv2d(mod: nn.Conv2d, p: dict) -> None:
    mod.weight.data = _t(p["w"]).permute(3, 2, 0, 1).contiguous()
    if "b" in p:
        mod.bias.data = _t(p["b"])
    elif mod.bias is not None:
        mod.bias.data.zero_()


def set_conv3d(mod: nn.Conv3d, p: dict) -> None:
    mod.weight.data = _t(p["w"]).permute(4, 3, 0, 1, 2).contiguous()
    if "b" in p:
        mod.bias.data = _t(p["b"])
    elif mod.bias is not None:
        mod.bias.data.zero_()


def set_linear(mod: nn.Linear, p: dict) -> None:
    mod.weight.data = _t(p["w"]).T.contiguous()
    if "b" in p:
        mod.bias.data = _t(p["b"])
    elif mod.bias is not None:
        mod.bias.data.zero_()


def set_gru(mod: ConvGRUCell, p: dict) -> None:
    """Assemble concat-kernel convs from the hoisted x/h halves: the concat
    conv's input channels [0,C) read x (gates_x/cand_x) and [C,2C) read h
    (gates_h / cand_h, the r⊙h operand for cand). Biases live on the x half."""
    gx = _t(p["gates_x"]["w"]).permute(3, 2, 0, 1)
    gh = _t(p["gates_h"]["w"]).permute(3, 2, 0, 1)
    mod.gates.weight.data = torch.cat([gx, gh], dim=1).contiguous()
    mod.gates.bias.data = _t(p["gates_x"]["b"])
    cx = _t(p["cand_x"]["w"]).permute(3, 2, 0, 1)
    ch = _t(p["cand_h"]["w"]).permute(3, 2, 0, 1)
    mod.cand.weight.data = torch.cat([cx, ch], dim=1).contiguous()
    mod.cand.bias.data = _t(p["cand_x"]["b"])


def set_cbn(mod: ConditionalNorm, p: dict, stats: dict) -> None:
    set_linear(mod.gamma, p["gamma"])
    set_linear(mod.beta, p["beta"])
    mod.bn.running_mean.data = _t(stats["mean"])
    mod.bn.running_var.data = _t(stats["var"])


def set_bn(mod: nn.BatchNorm2d, p: dict, stats: dict) -> None:
    mod.weight.data = _t(p["scale"])
    mod.bias.data = _t(p["bias"])
    mod.running_mean.data = _t(stats["mean"])
    mod.running_var.data = _t(stats["var"])


def set_gresblock(mod: GResBlock, p: dict, stats: dict) -> None:
    set_cbn(mod.cbn1, p["cbn1"], stats["bn1"])
    set_conv2d(mod.conv1, p["conv1"])
    set_cbn(mod.cbn2, p["cbn2"], stats["bn2"])
    set_conv2d(mod.conv2, p["conv2"])
    if mod.skip is not None:
        set_conv2d(mod.skip, p["skip"])


def set_dblock(mod: DBlock, p: dict) -> None:
    set_conv2d(mod.conv1, p["conv1"])
    set_conv2d(mod.conv2, p["conv2"])
    if mod.skip is not None:
        set_conv2d(mod.skip, p["skip"])


def set_dblock3d(mod: DBlock3d, p: dict) -> None:
    set_conv3d(mod.conv1, p["conv1"])
    set_conv3d(mod.conv2, p["conv2"])
    if mod.skip is not None:
        set_conv3d(mod.skip, p["skip"])


def set_attn_pass(mod: AttnPass, p: dict) -> None:
    set_linear(mod.theta, p["theta"])
    set_linear(mod.phi, p["phi"])
    set_linear(mod.g, p["g"])
    set_linear(mod.out, p["out"])
    mod.gamma.data = _t(p["gamma"])


def set_separable_attn(mod: SeparableAttn, p: dict) -> None:
    set_attn_pass(mod.spatial, p["spatial"])
    set_attn_pass(mod.temporal, p["temporal"])


def set_head(mod: ProjectionHead, p: dict) -> None:
    set_linear(mod.psi, p["psi"])
    mod.proj.weight.data = _t(p["proj"]["emb"])


def load_generator(mod: Generator, params: dict, stats: dict) -> None:
    """Copy a dvdgan_tpu G pytree (params, stats) into the twin. Pass the
    SN-normalized params (sn_normalize(update=False)) to compare against the
    training-forward weights."""
    mod.embed.weight.data = _t(params["embed"]["emb"])
    set_linear(mod.seed, params["seed"])
    for i, lvl in enumerate(params["levels"]):
        set_gru(mod.grus[i], lvl["gru"])
        set_gresblock(mod.blocks[i], lvl["block"], stats["levels"][i])
    if mod.attn is not None:
        set_separable_attn(mod.attn, params["attn"])
    if mod.fp_enc is not None:
        for stage_mod, stage_p in zip(mod.fp_enc.stages,
                                      params["fp_enc"]["stages"]):
            set_conv2d(stage_mod, stage_p)
    set_bn(mod.out_bn, params["out_bn"], stats["out_bn"])
    set_conv2d(mod.out_conv, params["out_conv"])


def load_ds(mod: SpatialDiscriminator, params: dict) -> None:
    for i, blk in enumerate(params["blocks"]):
        set_dblock(mod.blocks[i], blk)
    set_head(mod.head, params["head"])


def load_dt(mod: TemporalDiscriminator, params: dict, n_3d_blocks: int
            ) -> None:
    for i, blk in enumerate(params["blocks"]):
        if i < n_3d_blocks:
            set_dblock3d(mod.blocks[i], blk)
        else:
            set_dblock(mod.blocks[i], blk)
    set_head(mod.head, params["head"])


# ------------------------------------------------ torch -> pytree export ----
# Inverses of the set_* loaders: read a twin module (e.g. after
# load_state_dict of a reference-layout torch checkpoint) back into
# dvdgan_tpu parameter pytrees. Used by tools/import_torch_checkpoint.py.


def _n(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def get_conv2d(mod: nn.Conv2d) -> dict:
    p = {"w": _n(mod.weight).transpose(2, 3, 1, 0)}       # OIHW -> HWIO
    if mod.bias is not None:
        p["b"] = _n(mod.bias)
    return p


def get_conv3d(mod: nn.Conv3d) -> dict:
    p = {"w": _n(mod.weight).transpose(2, 3, 4, 1, 0)}    # OIDHW -> DHWIO
    if mod.bias is not None:
        p["b"] = _n(mod.bias)
    return p


def get_linear(mod: nn.Linear) -> dict:
    p = {"w": _n(mod.weight).T.copy()}                    # (out,in) -> (in,out)
    if mod.bias is not None:
        p["b"] = _n(mod.bias)
    return p


def get_gru(mod: ConvGRUCell) -> dict:
    """Split the concat-kernel convs back into hoisted x/h halves (input
    channels [0,C) are the x kernel, [C,2C) the h kernel; biases go to the
    x halves, matching convgru_init's bias placement)."""
    c = mod.cand.weight.shape[0]
    gw = _n(mod.gates.weight)                             # (2C, 2C, 3, 3)
    cw = _n(mod.cand.weight)                              # (C, 2C, 3, 3)
    return {
        "gates_x": {"w": gw[:, :c].transpose(2, 3, 1, 0),
                    "b": _n(mod.gates.bias)},
        "gates_h": {"w": gw[:, c:].transpose(2, 3, 1, 0)},
        "cand_x": {"w": cw[:, :c].transpose(2, 3, 1, 0),
                   "b": _n(mod.cand.bias)},
        "cand_h": {"w": cw[:, c:].transpose(2, 3, 1, 0)},
    }


def get_cbn(mod: ConditionalNorm) -> tuple[dict, dict]:
    """(params, stats). The stored running var is copied VERBATIM: both
    frameworks normalize eval-mode activations with the stored value as-is
    (the biased/unbiased distinction only affects train-time accumulation)."""
    p = {"gamma": get_linear(mod.gamma), "beta": get_linear(mod.beta)}
    s = {"mean": _n(mod.bn.running_mean), "var": _n(mod.bn.running_var)}
    return p, s


def get_bn(mod: nn.BatchNorm2d) -> tuple[dict, dict]:
    p = {"scale": _n(mod.weight), "bias": _n(mod.bias)}
    s = {"mean": _n(mod.running_mean), "var": _n(mod.running_var)}
    return p, s


def get_gresblock(mod: GResBlock) -> tuple[dict, dict]:
    cbn1, bn1 = get_cbn(mod.cbn1)
    cbn2, bn2 = get_cbn(mod.cbn2)
    p = {"cbn1": cbn1, "conv1": get_conv2d(mod.conv1),
         "cbn2": cbn2, "conv2": get_conv2d(mod.conv2)}
    if mod.skip is not None:
        p["skip"] = get_conv2d(mod.skip)
    return p, {"bn1": bn1, "bn2": bn2}


def get_dblock(mod: DBlock) -> dict:
    p = {"conv1": get_conv2d(mod.conv1), "conv2": get_conv2d(mod.conv2)}
    if mod.skip is not None:
        p["skip"] = get_conv2d(mod.skip)
    return p


def get_dblock3d(mod: DBlock3d) -> dict:
    p = {"conv1": get_conv3d(mod.conv1), "conv2": get_conv3d(mod.conv2)}
    if mod.skip is not None:
        p["skip"] = get_conv3d(mod.skip)
    return p


def get_attn_pass(mod: AttnPass) -> dict:
    return {"theta": get_linear(mod.theta), "phi": get_linear(mod.phi),
            "g": get_linear(mod.g), "out": get_linear(mod.out),
            "gamma": _n(mod.gamma)}


def get_head(mod: ProjectionHead) -> dict:
    return {"psi": get_linear(mod.psi),
            "proj": {"emb": _n(mod.proj.weight)}}


def export_generator(mod: Generator) -> tuple[dict, dict]:
    """Twin G -> (params, stats) pytrees shaped exactly like generator.init's."""
    params = {
        "embed": {"emb": _n(mod.embed.weight)},
        "seed": get_linear(mod.seed),
        "levels": [],
        "out_bn": None, "out_conv": get_conv2d(mod.out_conv),
    }
    stats = {"levels": [], "out_bn": None}
    for gru, blk in zip(mod.grus, mod.blocks):
        bp, bs = get_gresblock(blk)
        params["levels"].append({"gru": get_gru(gru), "block": bp})
        stats["levels"].append(bs)
    obn, obs = get_bn(mod.out_bn)
    params["out_bn"], stats["out_bn"] = obn, obs
    if mod.attn is not None:
        params["attn"] = {"spatial": get_attn_pass(mod.attn.spatial),
                          "temporal": get_attn_pass(mod.attn.temporal)}
    if mod.fp_enc is not None:
        params["fp_enc"] = {
            "stages": [get_conv2d(s) for s in mod.fp_enc.stages]}
    return params, stats


def export_ds(mod: SpatialDiscriminator) -> dict:
    return {"blocks": [get_dblock(b) for b in mod.blocks],
            "head": get_head(mod.head)}


def export_dt(mod: TemporalDiscriminator) -> dict:
    blocks = [get_dblock3d(b) if isinstance(b, DBlock3d) else get_dblock(b)
              for b in mod.blocks]
    return {"blocks": blocks, "head": get_head(mod.head)}
