"""Independent PyTorch twins of the EVAL scoring networks (I3D, C3D).

Round-2 verdict, missing #1: the published-FVD/IS path's correctness rested
on name/shape validation alone — a transposed kernel or wrong BN eps in a
converter would pass every existing test and silently corrupt published
numbers. These twins extend the torch-twin discipline (tools/torch_twin.py)
to the eval stack: each network is written HERE in reference idiom (NCTHW,
nn.Conv3d, TF-SAME padding computed per layer) from the published
architecture tables — I3D: Carreira & Zisserman 2017, inflated
Inception-v1; C3D: Tran et al. 2015 — with state_dict names matching the
checkpoints the converters accept (pytorch-i3d / DavideA-c3d naming). The
parity tests (tests/test_eval_twins.py) load ONE random state_dict into
both frameworks through the REAL converters and demand forward agreement,
which verifies every converter transpose, the BN epsilon, the SAME-padding
geometry, the fc6 column permutation, and the logits-head algebra at once.

Test harness only — not part of the shipped package; torch stays a
dev-dependency (CPU wheel in this sandbox).
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


# --------------------------------------------------------------------- I3D --

def _tf_same_pad(x: torch.Tensor, kernel, stride) -> torch.Tensor:
    """TF/XLA 'SAME' padding for NCTHW: total pad per dim =
    max((ceil(in/s)-1)*s + k - in, 0), extra on the TRAILING side (this
    asymmetry at even kernels/strides is exactly what a fixed nn.Conv3d
    `padding=` cannot express — the pytorch-i3d port pads the same way)."""
    pads = []
    for i, (k, s) in enumerate(zip(kernel, stride)):
        size = x.shape[2 + i]
        out = -(-size // s)
        total = max((out - 1) * s + k - size, 0)
        pads.append((total // 2, total - total // 2))
    # F.pad wants (W_lo, W_hi, H_lo, H_hi, T_lo, T_hi)
    flat = [p for pair in reversed(pads) for p in pair]
    return F.pad(x, flat)


class Unit3D(nn.Module):
    """Conv3d (no bias) + BatchNorm3d(eps=1e-3, stored stats) + ReLU,
    TF-SAME padded — the I3D building block."""

    def __init__(self, cin: int, cout: int, kernel=(1, 1, 1),
                 stride=(1, 1, 1), use_bn: bool = True,
                 use_relu: bool = True, bias: bool = False):
        super().__init__()
        self.kernel, self.stride = kernel, stride
        self.conv3d = nn.Conv3d(cin, cout, kernel, stride, padding=0,
                                bias=bias)
        self.bn = nn.BatchNorm3d(cout, eps=1e-3) if use_bn else None
        self.use_relu = use_relu

    def forward(self, x):
        x = self.conv3d(_tf_same_pad(x, self.kernel, self.stride))
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.use_relu else x


class _SamePool(nn.Module):
    def __init__(self, window, stride):
        super().__init__()
        self.window, self.stride = window, stride
        self.pool = nn.MaxPool3d(window, stride)

    def forward(self, x):
        return self.pool(_tf_same_pad(x, self.window, self.stride))


class Mixed(nn.Module):
    """Inception block; child names (b0, b1a, ...) match the converter's
    torch-style naming `Mixed_xx.b0.conv3d.weight`."""

    def __init__(self, cin: int, spec):
        super().__init__()
        b0, b1a, b1b, b2a, b2b, b3b = spec
        self.b0 = Unit3D(cin, b0)
        self.b1a = Unit3D(cin, b1a)
        self.b1b = Unit3D(b1a, b1b, (3, 3, 3))
        self.b2a = Unit3D(cin, b2a)
        self.b2b = Unit3D(b2a, b2b, (3, 3, 3))
        self.pool = _SamePool((3, 3, 3), (1, 1, 1))
        self.b3b = Unit3D(cin, b3b)

    def forward(self, x):
        return torch.cat([self.b0(x), self.b1b(self.b1a(x)),
                          self.b2b(self.b2a(x)), self.b3b(self.pool(x))], 1)


class I3DTwin(nn.Module):
    """Inflated Inception-v1, pytorch-i3d state_dict naming. The logits
    head is the LITERAL published graph: avg_pool3d window (2, S, S)
    stride 1 VALID over Mixed_5c (S = whatever the spatial size is; 7 at
    the 224 protocol), 1×1×1 logits conv, mean over the temporal
    positions — the graph dvdgan_tpu.eval.i3d.apply re-derives as a
    weighted temporal mean of spatially-pooled features."""

    def __init__(self):
        super().__init__()
        from dvdgan_tpu.eval.i3d import _MIXED, TOPOLOGY
        self._order = []
        for name, kind, spec in TOPOLOGY:
            if kind == "conv":
                k, stride, cin, cout = spec
                mod = Unit3D(cin, cout, k, stride)
            elif kind == "pool":
                window, stride = spec
                mod = _SamePool(window, stride)
            else:
                mod = Mixed(spec, _MIXED[name])
            setattr(self, name, mod)
            self._order.append(name)
        self.logits = Unit3D(1024, 400, use_bn=False, use_relu=False,
                             bias=True)

    def forward(self, video: torch.Tensor, feature: str = "logits"):
        """video (B, T, H, W, 3) in [-1, 1] — same contract as
        eval.i3d.apply(resize=None)."""
        x = video.permute(0, 4, 1, 2, 3)                 # NCTHW
        for name in self._order:
            x = getattr(self, name)(x)
        if feature == "avgpool":
            return x.mean(dim=(2, 3, 4))
        t, s1, s2 = x.shape[2:]
        x = F.avg_pool3d(x, (min(2, t), s1, s2), stride=1)  # VALID
        x = self.logits(x)                               # (B, 400, T-1, 1, 1)
        return x.mean(dim=(2, 3, 4))


# --------------------------------------------------------------------- C3D --

class C3DTwin(nn.Module):
    """C3D (Tran et al. 2015), DavideA/c3d-pytorch state_dict naming:
    conv1..conv5b 3×3×3 pad 1, the published pool stack (pool5 pads H/W by
    1), NCDHW-flattened fc6 → fc7 → fc8. Input contract matches
    eval.c3d.apply(resize=None, input_mean=None): (B, 16, 112, 112, 3) in
    [-1, 1], rescaled to [0, 255] inside."""

    def __init__(self, n_classes: int = 101):
        super().__init__()
        from dvdgan_tpu.eval.c3d import _CONVS, FC_DIM, FLAT_DIM
        for name, cin, cout in _CONVS:
            setattr(self, name, nn.Conv3d(cin, cout, 3, padding=1))
        self.pool1 = nn.MaxPool3d((1, 2, 2), (1, 2, 2))
        self.pool2 = nn.MaxPool3d(2, 2)
        self.pool3 = nn.MaxPool3d(2, 2)
        self.pool4 = nn.MaxPool3d(2, 2)
        self.pool5 = nn.MaxPool3d(2, 2, padding=(0, 1, 1))
        self.fc6 = nn.Linear(FLAT_DIM, FC_DIM)
        self.fc7 = nn.Linear(FC_DIM, FC_DIM)
        self.fc8 = nn.Linear(FC_DIM, n_classes)

    def forward(self, video: torch.Tensor, feature: str = "logits",
                input_bgr: bool = False):
        x = (video + 1.0) * 127.5
        if input_bgr:
            x = x.flip(-1)
        x = x.permute(0, 4, 1, 2, 3)                     # NCTHW
        x = self.pool1(F.relu(self.conv1(x)))
        x = self.pool2(F.relu(self.conv2(x)))
        x = F.relu(self.conv3b(F.relu(self.conv3a(x))))
        x = self.pool3(x)
        x = F.relu(self.conv4b(F.relu(self.conv4a(x))))
        x = self.pool4(x)
        x = F.relu(self.conv5b(F.relu(self.conv5a(x))))
        x = self.pool5(x)
        x = x.flatten(1)                                 # (B, 8192) CTHW
        x = F.relu(self.fc6(x))
        if feature == "fc6":
            return x
        x = F.relu(self.fc7(x))
        if feature == "fc7":
            return x
        return self.fc8(x)


# ----------------------------------------------------------- Inception-v3 --

class BasicConv2d(nn.Module):
    """torchvision inception building block: conv (no bias) + BN(eps 1e-3)
    + ReLU; child names .conv/.bn match its state_dict."""

    def __init__(self, cin, cout, kernel, stride=1, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, stride, padding, bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _same_pad2d(kernel):
    kh, kw = kernel if isinstance(kernel, tuple) else (kernel, kernel)
    return (kh // 2, kw // 2)


class _InceptionMixed(nn.Module):
    """One Mixed block in torchvision forward structure; branch children
    are named from the shared spec table so state_dict keys line up."""

    def __init__(self, name: str, kind: str, cin: int, extra):
        super().__init__()
        from dvdgan_tpu.eval.inception import _branches
        self.kind = kind
        for bname, k, stride, padding, bcin, bcout in _branches(kind, cin,
                                                                extra):
            pad = _same_pad2d(k) if padding == "SAME" else 0
            setattr(self, bname, BasicConv2d(bcin, bcout, k, stride, pad))

    def forward(self, x):
        avg = lambda v: F.avg_pool2d(v, 3, 1, 1)         # noqa: E731
        mx = lambda v: F.max_pool2d(v, 3, 2)             # noqa: E731
        if self.kind == "A":
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                self.branch_pool(avg(x))], 1)
        if self.kind == "B":
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(
                    self.branch3x3dbl_1(x))),
                mx(x)], 1)
        if self.kind == "C":
            b1 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            b2 = self.branch7x7dbl_5(self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(
                    self.branch7x7dbl_1(x)))))
            return torch.cat([self.branch1x1(x), b1, b2,
                              self.branch_pool(avg(x))], 1)
        if self.kind == "D":
            b0 = self.branch3x3_2(self.branch3x3_1(x))
            b1 = self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x))))
            return torch.cat([b0, b1, mx(x)], 1)
        # E
        h = self.branch3x3_1(x)
        b1 = torch.cat([self.branch3x3_2a(h), self.branch3x3_2b(h)], 1)
        h = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        b2 = torch.cat([self.branch3x3dbl_3a(h), self.branch3x3dbl_3b(h)], 1)
        return torch.cat([self.branch1x1(x), b1, b2,
                          self.branch_pool(avg(x))], 1)


class InceptionV3Twin(nn.Module):
    """Inception-v3, torchvision state_dict naming (aux head omitted — the
    converter drops it). Input (B, H, W, 3) in [-1, 1], same contract as
    eval.inception.apply(resize=None)."""

    def __init__(self):
        super().__init__()
        from dvdgan_tpu.eval.inception import _MIXED, _STEM
        self._stem = []
        for spec in _STEM:
            if len(spec) == 1:
                self._stem.append(spec[0])
                continue
            name, k, stride, padding, cin, cout = spec
            pad = _same_pad2d(k) if padding == "SAME" else 0
            setattr(self, name, BasicConv2d(cin, cout, k, stride, pad))
            self._stem.append(name)
        self._mixed = []
        for name, kind, cin, extra in _MIXED:
            setattr(self, name, _InceptionMixed(name, kind, cin, extra))
            self._mixed.append(name)
        self.fc = nn.Linear(2048, 1000)

    def forward(self, images: torch.Tensor, feature: str = "pool"):
        x = images.permute(0, 3, 1, 2)                   # NCHW
        for name in self._stem:
            x = (F.max_pool2d(x, 3, 2) if name.startswith("maxpool")
                 else getattr(self, name)(x))
        for name in self._mixed:
            x = getattr(self, name)(x)
        x = x.mean(dim=(2, 3))                           # (B, 2048)
        if feature == "pool":
            return x
        return self.fc(x)


def randomize_bn_stats(module: nn.Module, seed: int = 0) -> None:
    """Give every BatchNorm nontrivial stored stats/affine params so a
    parity test actually exercises the eps/scale/offset math (fresh torch
    BN has mean=0, var=1, γ=1, β=0 — identity modulo eps)."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
            n = m.num_features
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(n, generator=g) * 0.2)
                m.running_var.copy_(torch.rand(n, generator=g) * 1.5 + 0.25)
                m.weight.copy_(torch.randn(n, generator=g) * 0.2 + 1.0)
                m.bias.copy_(torch.randn(n, generator=g) * 0.2)
