"""Genuine C3D network for the published UCF-101 video Inception Score.

The UCF-101 IS protocol (TGAN, Saito et al. 2017 — the protocol behind
DVD-GAN's UCF-101 table, BASELINE.md row 1) scores 16-frame clips with the
C3D network (Tran et al. 2015) fine-tuned on UCF-101 (101-way softmax).
This module is the real topology — 8 conv3d + 3 fc layers with named
params — so converted pretrained weights map by NAME onto exact shapes
(tools/convert_c3d_weights.py), same discipline as eval/i3d.py.

Reference parity: the reference repo has no eval harness (SURVEY.md §2.17);
this completes the published-comparable IS path for the UCF-101 preset.

Design notes (TPU):
  * Inference-only, biases not BN; one jitted apply, conv+bias+ReLU fuse.
  * Channels-last NDHWC / DHWIO throughout.
  * Input (B, T, H, W, 3) in [-1, 1]. apply() rescales to [0, 255],
    resizes to 112×112, and optionally subtracts the protocol's mean
    (per-channel vector or full frame cube shipped inside the weights npz
    as "input_mean"; "input_bgr"=1 flips RGB→BGR first — the original
    Sports-1M C3D is a BGR/caffe model).
  * The fc6 flatten is (T, H, W, C)-ordered here; the converter permutes
    torch's (C, T, H, W)-ordered fc6 columns accordingly, so apply() never
    transposes activations.
  * T must equal 16 after windowing (the protocol's clip length): longer
    clips are center-cropped, shorter ones loop-tiled, inside __call__ of
    the feature wrapper (eval/features.py) before apply.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 101       # UCF-101 fine-tune (Sports-1M original is 487)
CLIP_LEN = 16
FC_DIM = 4096
FLAT_DIM = 8192         # 512 ch × 1 × 4 × 4 after pool5 at 16×112×112

# (name, cin, cout) for the conv trunk; every conv is 3×3×3 / stride 1 /
# SAME. Pools are fixed by the architecture (see _POOLS).
_CONVS = (
    ("conv1", 3, 64),
    ("conv2", 64, 128),
    ("conv3a", 128, 256),
    ("conv3b", 256, 256),
    ("conv4a", 256, 512),
    ("conv4b", 512, 512),
    ("conv5a", 512, 512),
    ("conv5b", 512, 512),
)
# pool AFTER the named conv: (window, stride, explicit THW padding)
_POOLS = {
    "conv1": ((1, 2, 2), (1, 2, 2), ((0, 0), (0, 0), (0, 0))),
    "conv2": ((2, 2, 2), (2, 2, 2), ((0, 0), (0, 0), (0, 0))),
    "conv3b": ((2, 2, 2), (2, 2, 2), ((0, 0), (0, 0), (0, 0))),
    "conv4b": ((2, 2, 2), (2, 2, 2), ((0, 0), (0, 0), (0, 0))),
    # torch MaxPool3d(kernel=2, stride=2, padding=(0, 1, 1))
    "conv5b": ((2, 2, 2), (2, 2, 2), ((0, 0), (1, 1), (1, 1))),
}

FEATURE_DIMS = {"logits": NUM_CLASSES, "fc6": FC_DIM, "fc7": FC_DIM}


def param_shapes(n_classes: int = NUM_CLASSES) -> dict:
    """Every parameter tensor: {flat_key: shape} (conv w is DHWIO; fc w is
    (in, out) — already transposed for x @ w)."""
    shapes = {}
    for name, cin, cout in _CONVS:
        shapes[f"{name}/w"] = (3, 3, 3, cin, cout)
        shapes[f"{name}/b"] = (cout,)
    shapes["fc6/w"] = (FLAT_DIM, FC_DIM)
    shapes["fc6/b"] = (FC_DIM,)
    shapes["fc7/w"] = (FC_DIM, FC_DIM)
    shapes["fc7/b"] = (FC_DIM,)
    shapes["fc8/w"] = (FC_DIM, n_classes)
    shapes["fc8/b"] = (n_classes,)
    return shapes


def init(key: jax.Array, n_classes: int = NUM_CLASSES) -> dict:
    """Random He init — self-consistent trends only, never
    published-comparable."""
    shapes = param_shapes(n_classes)
    keys = jax.random.split(key, len(shapes))
    params = {}
    for k, (name, shape) in zip(keys, sorted(shapes.items())):
        if name.endswith("/w"):
            fan_in = int(np.prod(shape[:-1]))
            params[name] = (jax.random.normal(k, shape, jnp.float32)
                            * np.sqrt(2.0 / fan_in))
        else:
            params[name] = jnp.zeros(shape, jnp.float32)
    return params


def n_params(n_classes: int = NUM_CLASSES) -> int:
    return int(sum(np.prod(s)
                   for s in param_shapes(n_classes).values()))


# ------------------------------------------------------------------ apply ----

def _max_pool(x: jax.Array, window, stride, pad) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=((0, 0), *pad, (0, 0)))


@functools.partial(jax.jit,
                   static_argnames=("feature", "resize", "input_bgr"))
def apply(params: dict, video: jax.Array, feature: str = "logits",
          resize: Optional[int] = 112,
          input_mean: Optional[jax.Array] = None,
          input_bgr: bool = False) -> jax.Array:
    """(B, 16, H, W, 3) in [-1, 1] -> (B, D).

    feature: "logits" (n_classes, softmax of which is the published UCF-IS
             input), or "fc6"/"fc7" (4096-d embeddings).
    resize:  spatial side before the net (the protocol's 112); None = run
             at native resolution (then H=W=112 is required).
    input_mean: protocol mean to subtract AFTER the [0,255] rescale —
             (3,) channel vector or a (16, 112, 112, 3) cube.
    """
    x = (video.astype(jnp.float32) + 1.0) * 127.5          # [-1,1] -> [0,255]
    if input_bgr:
        x = x[..., ::-1]
    if resize is not None and (x.shape[2] != resize or x.shape[3] != resize):
        b, t = x.shape[:2]
        x = jax.image.resize(x, (b, t, resize, resize, 3), method="bilinear")
    if input_mean is not None:
        x = x - jnp.asarray(input_mean, jnp.float32)
    for name, _, _ in _CONVS:
        w = params[f"{name}/w"].astype(x.dtype)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        x = jax.nn.relu(x + params[f"{name}/b"].astype(x.dtype))
        if name in _POOLS:
            x = _max_pool(x, *_POOLS[name])
    x = x.reshape(x.shape[0], -1)                          # (B, 8192) THWC
    if x.shape[-1] != FLAT_DIM:
        raise ValueError(
            f"flatten gave {x.shape[-1]} features, want {FLAT_DIM} — C3D "
            "requires 16 frames at 112×112 (use resize=112, window T to 16)")
    x = jax.nn.relu(x @ params["fc6/w"] + params["fc6/b"])
    if feature == "fc6":
        return x
    x = jax.nn.relu(x @ params["fc7/w"] + params["fc7/b"])
    if feature == "fc7":
        return x
    return x @ params["fc8/w"] + params["fc8/b"]


# -------------------------------------------------------------- npz (de)ser --

_META_KEYS = ("input_mean", "input_bgr")


def save_npz(path: str, params: dict, input_mean=None,
             input_bgr: bool = False) -> None:
    arrays = {k: np.asarray(v) for k, v in params.items()}
    if input_mean is not None:
        arrays["input_mean"] = np.asarray(input_mean, np.float32)
    if input_bgr:
        arrays["input_bgr"] = np.asarray(1, np.int32)
    np.savez(path, **arrays)


def load_npz(path: str) -> tuple[dict, Optional[np.ndarray], bool]:
    """-> (params, input_mean or None, input_bgr). Validates the topology
    exactly (n_classes inferred from fc8/b); unknown keys are an error."""
    loaded = dict(np.load(path))
    input_mean = loaded.pop("input_mean", None)
    input_bgr = bool(loaded.pop("input_bgr", False))
    n_classes = (int(loaded["fc8/b"].shape[0]) if "fc8/b" in loaded
                 else NUM_CLASSES)
    expected = param_shapes(n_classes)
    missing = sorted(set(expected) - set(loaded))
    extra = sorted(set(loaded) - set(expected))
    bad = [f"{k}: got {loaded[k].shape}, want {expected[k]}"
           for k in expected if k in loaded
           and tuple(loaded[k].shape) != tuple(expected[k])]
    if missing or extra or bad:
        raise ValueError(
            "npz does not match the C3D topology:\n"
            f"  missing ({len(missing)}): {missing[:5]}...\n"
            f"  unknown ({len(extra)}): {extra[:5]}...\n"
            f"  shape mismatches ({len(bad)}): {bad[:5]}")
    return ({k: jnp.asarray(v, jnp.float32) for k, v in loaded.items()},
            input_mean, input_bgr)
