"""Genuine Inception-v3 feature network for FID / frame-level IS.

The paper ([P] §4) reports IS/FID for Kinetics synthesis; published FID
embeds frames with Inception-v3 pool features (2048-d). Like eval/i3d.py,
this is the REAL topology (torchvision inception_v3 module names and
shapes) so converted pretrained weights map by NAME — a random-init run
is possible but labeled non-comparable by the callers.

Inference-only: conv + BN(eps 1e-3, stored moments) + ReLU per unit, one
jit, channels-last NHWC. Input (B, H, W, 3) in [-1, 1], bilinearly
resized to 299 (the published FID preprocessing) unless resize=None.
Feature endpoints: "pool" (2048-d pre-logits global average — the FID
embedding) or "logits" (1000-d).

The topology tables below are the single source of truth shared by init,
apply, the converter (tools/convert_inception_weights.py) and the tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
NUM_CLASSES = 1000
FEATURE_DIMS = {"pool": 2048, "logits": NUM_CLASSES}

# stem: (name, kernel (kh,kw), stride, padding, cin, cout) or pool marker
_STEM = (
    ("Conv2d_1a_3x3", (3, 3), 2, "VALID", 3, 32),
    ("Conv2d_2a_3x3", (3, 3), 1, "VALID", 32, 32),
    ("Conv2d_2b_3x3", (3, 3), 1, "SAME", 32, 64),
    ("maxpool1",),
    ("Conv2d_3b_1x1", (1, 1), 1, "VALID", 64, 80),
    ("Conv2d_4a_3x3", (3, 3), 1, "VALID", 80, 192),
    ("maxpool2",),
)

# Mixed blocks: (name, kind, cin, extra)
#   A: extra = pool_features; out = 224 + pf
#   B: out = cin + 480
#   C: extra = c7; out = 768
#   D: out = cin + 512
#   E: out = 2048
_MIXED = (
    ("Mixed_5b", "A", 192, 32),
    ("Mixed_5c", "A", 256, 64),
    ("Mixed_5d", "A", 288, 64),
    ("Mixed_6a", "B", 288, None),
    ("Mixed_6b", "C", 768, 128),
    ("Mixed_6c", "C", 768, 160),
    ("Mixed_6d", "C", 768, 160),
    ("Mixed_6e", "C", 768, 192),
    ("Mixed_7a", "D", 768, None),
    ("Mixed_7b", "E", 1280, None),
    ("Mixed_7c", "E", 2048, None),
)

# per-kind branch conv specs: (branch_name, kernel, stride, padding,
# cin_expr, cout) — cin_expr: "in" (block input) or an int or a previous
# branch's cout by name.
def _branches(kind: str, cin: int, extra) -> list:
    if kind == "A":
        return [
            ("branch1x1", (1, 1), 1, "SAME", cin, 64),
            ("branch5x5_1", (1, 1), 1, "SAME", cin, 48),
            ("branch5x5_2", (5, 5), 1, "SAME", 48, 64),
            ("branch3x3dbl_1", (1, 1), 1, "SAME", cin, 64),
            ("branch3x3dbl_2", (3, 3), 1, "SAME", 64, 96),
            ("branch3x3dbl_3", (3, 3), 1, "SAME", 96, 96),
            ("branch_pool", (1, 1), 1, "SAME", cin, extra),
        ]
    if kind == "B":
        return [
            ("branch3x3", (3, 3), 2, "VALID", cin, 384),
            ("branch3x3dbl_1", (1, 1), 1, "SAME", cin, 64),
            ("branch3x3dbl_2", (3, 3), 1, "SAME", 64, 96),
            ("branch3x3dbl_3", (3, 3), 2, "VALID", 96, 96),
        ]
    if kind == "C":
        c7 = extra
        return [
            ("branch1x1", (1, 1), 1, "SAME", cin, 192),
            ("branch7x7_1", (1, 1), 1, "SAME", cin, c7),
            ("branch7x7_2", (1, 7), 1, "SAME", c7, c7),
            ("branch7x7_3", (7, 1), 1, "SAME", c7, 192),
            ("branch7x7dbl_1", (1, 1), 1, "SAME", cin, c7),
            ("branch7x7dbl_2", (7, 1), 1, "SAME", c7, c7),
            ("branch7x7dbl_3", (1, 7), 1, "SAME", c7, c7),
            ("branch7x7dbl_4", (7, 1), 1, "SAME", c7, c7),
            ("branch7x7dbl_5", (1, 7), 1, "SAME", c7, 192),
            ("branch_pool", (1, 1), 1, "SAME", cin, 192),
        ]
    if kind == "D":
        return [
            ("branch3x3_1", (1, 1), 1, "SAME", cin, 192),
            ("branch3x3_2", (3, 3), 2, "VALID", 192, 320),
            ("branch7x7x3_1", (1, 1), 1, "SAME", cin, 192),
            ("branch7x7x3_2", (1, 7), 1, "SAME", 192, 192),
            ("branch7x7x3_3", (7, 1), 1, "SAME", 192, 192),
            ("branch7x7x3_4", (3, 3), 2, "VALID", 192, 192),
        ]
    # E
    return [
        ("branch1x1", (1, 1), 1, "SAME", cin, 320),
        ("branch3x3_1", (1, 1), 1, "SAME", cin, 384),
        ("branch3x3_2a", (1, 3), 1, "SAME", 384, 384),
        ("branch3x3_2b", (3, 1), 1, "SAME", 384, 384),
        ("branch3x3dbl_1", (1, 1), 1, "SAME", cin, 448),
        ("branch3x3dbl_2", (3, 3), 1, "SAME", 448, 384),
        ("branch3x3dbl_3a", (1, 3), 1, "SAME", 384, 384),
        ("branch3x3dbl_3b", (3, 1), 1, "SAME", 384, 384),
        ("branch_pool", (1, 1), 1, "SAME", cin, 192),
    ]


def param_shapes() -> dict:
    """{flat_key: shape}; flat keys are '/'-joined (the npz layout)."""
    out = {}

    def unit(prefix, k, cin, cout):
        out[f"{prefix}/w"] = (*k, cin, cout)
        for s in ("scale", "offset", "mean", "var"):
            out[f"{prefix}/bn/{s}"] = (cout,)

    for spec in _STEM:
        if len(spec) == 1:
            continue
        name, k, _, _, cin, cout = spec
        unit(name, k, cin, cout)
    for name, kind, cin, extra in _MIXED:
        for bname, k, _, _, bcin, bcout in _branches(kind, cin, extra):
            unit(f"{name}/{bname}", k, bcin, bcout)
    out["fc/w"] = (2048, NUM_CLASSES)
    out["fc/b"] = (NUM_CLASSES,)
    return out


def n_params() -> int:
    return int(sum(np.prod(s) for s in param_shapes().values()))


def init(key: jax.Array) -> dict:
    shapes = param_shapes()
    keys = jax.random.split(key, len(shapes))
    params = {}
    for k, (name, shape) in zip(keys, sorted(shapes.items())):
        if name.endswith("/w"):
            fan_in = int(np.prod(shape[:-1]))
            params[name] = (jax.random.normal(k, shape, jnp.float32)
                            * np.sqrt(2.0 / fan_in))
        elif name.endswith("/bn/scale") or name.endswith("/bn/var"):
            params[name] = jnp.ones(shape, jnp.float32)
        else:
            params[name] = jnp.zeros(shape, jnp.float32)
    return params


# ------------------------------------------------------------------ apply ----

def _conv_bn_relu(params, prefix, x, stride, padding):
    w = params[f"{prefix}/w"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    mean = params[f"{prefix}/bn/mean"].astype(x.dtype)
    var = params[f"{prefix}/bn/var"].astype(x.dtype)
    scale = params[f"{prefix}/bn/scale"].astype(x.dtype)
    offset = params[f"{prefix}/bn/offset"].astype(x.dtype)
    y = (y - mean) * scale * jax.lax.rsqrt(var + BN_EPS) + offset
    return jax.nn.relu(y)


def _max_pool3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _avg_pool3_s1_same(x):
    # torch F.avg_pool2d(k=3, s=1, pad=1) with count_include_pad=True
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return s / 9.0


def _mixed(params, name, kind, extra, x):
    def b(prefix, inp, k, stride, padding):
        return _conv_bn_relu(params, f"{name}/{prefix}", inp, stride,
                             padding)

    if kind == "A":
        b0 = b("branch1x1", x, None, 1, "SAME")
        b1 = b("branch5x5_2", b("branch5x5_1", x, None, 1, "SAME"),
               None, 1, "SAME")
        b2 = b("branch3x3dbl_3",
               b("branch3x3dbl_2",
                 b("branch3x3dbl_1", x, None, 1, "SAME"), None, 1, "SAME"),
               None, 1, "SAME")
        b3 = b("branch_pool", _avg_pool3_s1_same(x), None, 1, "SAME")
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)
    if kind == "B":
        b0 = b("branch3x3", x, None, 2, "VALID")
        b1 = b("branch3x3dbl_3",
               b("branch3x3dbl_2",
                 b("branch3x3dbl_1", x, None, 1, "SAME"), None, 1, "SAME"),
               None, 2, "VALID")
        return jnp.concatenate([b0, b1, _max_pool3_s2(x)], axis=-1)
    if kind == "C":
        b0 = b("branch1x1", x, None, 1, "SAME")
        b1 = x
        for p in ("branch7x7_1", "branch7x7_2", "branch7x7_3"):
            b1 = b(p, b1, None, 1, "SAME")
        b2 = x
        for p in ("branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                  "branch7x7dbl_4", "branch7x7dbl_5"):
            b2 = b(p, b2, None, 1, "SAME")
        b3 = b("branch_pool", _avg_pool3_s1_same(x), None, 1, "SAME")
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)
    if kind == "D":
        b0 = b("branch3x3_2", b("branch3x3_1", x, None, 1, "SAME"),
               None, 2, "VALID")
        b1 = x
        for p, st, pd in (("branch7x7x3_1", 1, "SAME"),
                          ("branch7x7x3_2", 1, "SAME"),
                          ("branch7x7x3_3", 1, "SAME"),
                          ("branch7x7x3_4", 2, "VALID")):
            b1 = b(p, b1, None, st, pd)
        return jnp.concatenate([b0, b1, _max_pool3_s2(x)], axis=-1)
    # E
    b0 = b("branch1x1", x, None, 1, "SAME")
    h = b("branch3x3_1", x, None, 1, "SAME")
    b1 = jnp.concatenate([b("branch3x3_2a", h, None, 1, "SAME"),
                          b("branch3x3_2b", h, None, 1, "SAME")], axis=-1)
    h = b("branch3x3dbl_2", b("branch3x3dbl_1", x, None, 1, "SAME"),
          None, 1, "SAME")
    b2 = jnp.concatenate([b("branch3x3dbl_3a", h, None, 1, "SAME"),
                          b("branch3x3dbl_3b", h, None, 1, "SAME")], axis=-1)
    b3 = b("branch_pool", _avg_pool3_s1_same(x), None, 1, "SAME")
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


@functools.partial(jax.jit, static_argnames=("feature", "resize"))
def apply(params: dict, images: jax.Array, feature: str = "pool",
          resize: Optional[int] = 299) -> jax.Array:
    """(B, H, W, 3) in [-1, 1] -> (B, D). feature: "pool" (2048-d, the FID
    embedding) or "logits" (1000-d)."""
    x = images.astype(jnp.float32)
    if resize is not None and (x.shape[1] != resize or x.shape[2] != resize):
        x = jax.image.resize(x, (x.shape[0], resize, resize, 3), "bilinear")
    for spec in _STEM:
        if len(spec) == 1:
            x = _max_pool3_s2(x)
        else:
            name, k, stride, padding, cin, cout = spec
            x = _conv_bn_relu(params, name, x, stride, padding)
    for name, kind, cin, extra in _MIXED:
        x = _mixed(params, name, kind, extra, x)
    x = x.mean(axis=(1, 2))                           # global avg -> 2048
    if feature == "pool":
        return x
    return x @ params["fc/w"].astype(x.dtype) + params["fc/b"].astype(x.dtype)


# ----------------------------------------------------------------- npz IO ---

def save_npz(path: str, params: dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_npz(path: str) -> dict:
    loaded = dict(np.load(path))
    expected = param_shapes()
    missing = sorted(set(expected) - set(loaded))
    extra = sorted(set(loaded) - set(expected))
    bad = [f"{k}: got {loaded[k].shape}, want {expected[k]}"
           for k in expected if k in loaded
           and tuple(loaded[k].shape) != tuple(expected[k])]
    if missing or extra or bad:
        raise ValueError(
            "npz does not match the Inception-v3 topology:\n"
            f"  missing ({len(missing)}): {missing[:5]}...\n"
            f"  unknown ({len(extra)}): {extra[:5]}...\n"
            f"  shape mismatches ({len(bad)}): {bad[:5]}")
    return {k: jnp.asarray(v, jnp.float32) for k, v in loaded.items()}
