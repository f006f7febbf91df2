"""Video feature extractors for FVD / IS (SURVEY.md §2.17, §7.9).

Published FVD uses an I3D network pretrained on Kinetics-400. Pretrained
weights need the network, which this sandbox does not have — so the harness
is PLUGGABLE: any callable (B, T, H, W, 3)[-1,1] -> (B, D) works.

Provided extractors:
  * `I3DFeatures` — the GENUINE Inflated Inception-v1 3-D topology
    (`dvdgan_tpu.eval.i3d`): named units, inception branches, Mixed_5c
    avg-pool + Kinetics-400 logits head. With `weights_npz` (produced by
    tools/convert_i3d_weights.py, name-mapped + shape-validated) its output
    is the published-FVD embedding; without weights it runs at a fixed
    random init and `self.pretrained` is False — callers must label such
    numbers as NOT published-comparable.
  * `I3DLikeFeatures` — a light 4-layer 3-D conv stack; CHEAP stand-in for
    tests and in-training trend tracking only. It cannot hold real I3D
    weights and its numbers are only self-consistent within one instance.
  * `ClassifierProbs` — softmax class probabilities from a provided or
    random-init classifier, feeding Inception Score.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvdgan_tpu.eval import i3d
from dvdgan_tpu.ops import layers


class I3DFeatures:
    """Real-I3D feature extractor: (B, T, H, W, 3)[-1,1] -> (B, D).

    feature: "logits" (400-d, the published-FVD embedding) or "avgpool"
    (1024-d pre-logits). `pretrained` tells callers whether the numbers are
    published-comparable (True only when converted weights were loaded).
    """

    def __init__(self, weights_npz: Optional[str] = None, seed: int = 0,
                 feature: str = "logits", resize: Optional[int] = 224):
        if feature not in i3d.FEATURE_DIMS:
            raise ValueError(f"feature must be one of {list(i3d.FEATURE_DIMS)}")
        self.pretrained = weights_npz is not None
        self.params = (i3d.load_npz(weights_npz) if weights_npz
                       else i3d.init(jax.random.PRNGKey(seed)))
        self.feature = feature
        self.resize = resize

    def __call__(self, video) -> np.ndarray:
        feats = i3d.apply(self.params, jnp.asarray(video, jnp.float32),
                          feature=self.feature, resize=self.resize)
        return np.asarray(jax.device_get(feats), np.float64)


def _i3d_like_init(key: jax.Array, widths=(64, 128, 256, 512)) -> dict:
    ks = jax.random.split(key, len(widths))
    blocks = []
    cin = 3
    for k, w in zip(ks, widths):
        blocks.append(layers.conv3d_init(k, (3, 3, 3), cin, w))
        cin = w
    return {"blocks": blocks}


def _i3d_like_apply(params: dict, video: jax.Array) -> jax.Array:
    """(B, T, H, W, 3) -> (B, D): strided 3-D conv pyramid + global mean."""
    x = video
    for i, p in enumerate(params["blocks"]):
        t_stride = 2 if (i % 2 == 1 and x.shape[1] >= 2) else 1
        x = layers.conv3d(p, x, stride=(t_stride, 2, 2))
        x = jax.nn.relu(x)
    return x.mean(axis=(1, 2, 3))


class InceptionFeatures:
    """Real Inception-v3 FRAME extractor for FID / frame-IS:
    (B, T, H, W, 3)[-1,1] -> (B·T, D) per-frame features (callers fold the
    time axis; FID pools all frames, the published frame-level protocol).

    feature: "pool" (2048-d, the published-FID embedding) or "logits"
    (1000-d). `pretrained` is True only when converted weights loaded
    (tools/convert_inception_weights.py) — random-init numbers are NOT
    published-comparable.
    """

    def __init__(self, weights_npz: Optional[str] = None, seed: int = 0,
                 feature: str = "pool", resize: Optional[int] = 299):
        from dvdgan_tpu.eval import inception as iv3
        if feature not in iv3.FEATURE_DIMS:
            raise ValueError(f"feature must be one of {list(iv3.FEATURE_DIMS)}")
        self._iv3 = iv3
        self.pretrained = weights_npz is not None
        self.params = (iv3.load_npz(weights_npz) if weights_npz
                       else iv3.init(jax.random.PRNGKey(seed)))
        self.feature = feature
        self.resize = resize

    def __call__(self, video) -> np.ndarray:
        v = jnp.asarray(video, jnp.float32)
        if v.ndim == 5:                       # fold clips to frames
            v = v.reshape(-1, *v.shape[2:])
        feats = self._iv3.apply(self.params, v, feature=self.feature,
                                resize=self.resize)
        return np.asarray(jax.device_get(feats), np.float64)


class I3DLikeFeatures:
    def __init__(self, seed: int = 0, widths=(64, 128, 256, 512)):
        self.params = _i3d_like_init(jax.random.PRNGKey(seed), widths)
        self._apply = jax.jit(_i3d_like_apply)

    def __call__(self, video) -> np.ndarray:
        feats = self._apply(self.params, jnp.asarray(video, jnp.float32))
        return np.asarray(jax.device_get(feats), np.float64)


class C3DFeatures:
    """Real-C3D extractor: (B, T, H, W, 3)[-1,1] -> (B, D).

    The published UCF-101 IS protocol network (16-frame clips at 112×112,
    101-way UCF fine-tune). Clips are windowed to exactly 16 frames here
    (center-crop if longer, loop-tile if shorter). Protocol mean/BGR
    handling ships inside the weights npz (tools/convert_c3d_weights.py).
    """

    def __init__(self, weights_npz: Optional[str] = None, seed: int = 0,
                 feature: str = "logits", resize: Optional[int] = 112):
        from dvdgan_tpu.eval import c3d
        if feature not in c3d.FEATURE_DIMS:
            raise ValueError(f"feature must be one of {list(c3d.FEATURE_DIMS)}")
        self._c3d = c3d
        self.pretrained = weights_npz is not None
        if weights_npz:
            self.params, self.input_mean, self.input_bgr = \
                c3d.load_npz(weights_npz)
        else:
            self.params = c3d.init(jax.random.PRNGKey(seed))
            self.input_mean, self.input_bgr = None, False
        self.feature = feature
        self.resize = resize

    def __call__(self, video) -> np.ndarray:
        v = jnp.asarray(video, jnp.float32)
        t, want = v.shape[1], self._c3d.CLIP_LEN
        if t > want:                         # center 16-frame window
            s = (t - want) // 2
            v = v[:, s:s + want]
        elif t < want:                       # loop-tile up to 16
            reps = -(-want // t)
            v = jnp.tile(v, (1, reps, 1, 1, 1))[:, :want]
        feats = self._c3d.apply(self.params, v, feature=self.feature,
                                resize=self.resize,
                                input_mean=self.input_mean,
                                input_bgr=self.input_bgr)
        return np.asarray(jax.device_get(feats), np.float64)


def _softmax_np(logits: np.ndarray) -> np.ndarray:
    """Numerically-stable softmax shared by the *ClassifierProbs wrappers."""
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


class C3DClassifierProbs:
    """(B, T, H, W, 3) -> (B, 101) softmax of C3D UCF-101 logits — the
    published UCF-101 video-IS classifier (TGAN protocol, used by
    DVD-GAN's UCF table). Random init when no weights (labeled)."""

    def __init__(self, weights_npz: Optional[str] = None, seed: int = 0,
                 feature_extractor: Optional["C3DFeatures"] = None):
        if feature_extractor is not None:
            if feature_extractor.feature != "logits":
                raise ValueError("IS needs the logits head")
            self.fx = feature_extractor
        else:
            self.fx = C3DFeatures(weights_npz, seed, feature="logits")
        self.pretrained = self.fx.pretrained

    def from_features(self, logits: np.ndarray) -> np.ndarray:
        """Probs from ALREADY-extracted logits (shared-extractor eval:
        avoids a second full C3D forward per batch)."""
        return _softmax_np(logits)

    def __call__(self, video) -> np.ndarray:
        return self.from_features(self.fx(video))


class I3DClassifierProbs:
    """(B, T, H, W, 3) -> (B, 400) softmax of I3D Kinetics-400 logits — the
    published video-IS classifier (DVD-GAN's Kinetics IS protocol). With no
    weights it runs at a fixed random init (`pretrained=False`): numbers are
    then self-consistent but NOT published-comparable."""

    def __init__(self, weights_npz: Optional[str] = None, seed: int = 0,
                 resize: Optional[int] = 224,
                 feature_extractor: Optional["I3DFeatures"] = None):
        if feature_extractor is not None:    # share one on-device I3D
            if feature_extractor.feature != "logits":
                raise ValueError("IS needs the 400-way logits head")
            self.fx = feature_extractor
        else:
            self.fx = I3DFeatures(weights_npz, seed, feature="logits",
                                  resize=resize)
        self.pretrained = self.fx.pretrained

    def from_features(self, logits: np.ndarray) -> np.ndarray:
        """Probs from ALREADY-extracted logits (shared-extractor eval:
        avoids a second full I3D forward per batch)."""
        return _softmax_np(logits)

    def __call__(self, video) -> np.ndarray:
        return self.from_features(self.fx(video))


class ClassifierProbs:
    """(B, T, H, W, 3) -> (B, n_classes) softmax probs for IS."""

    def __init__(self, n_classes: int, seed: int = 0,
                 feature_extractor: Optional[I3DLikeFeatures] = None,
                 widths=(32, 64, 128, 256)):
        self.fx = feature_extractor or I3DLikeFeatures(seed, widths=widths)
        d = self.fx.params["blocks"][-1]["w"].shape[-1]
        self.head = layers.linear_init(jax.random.PRNGKey(seed + 1),
                                       d, n_classes)

    def __call__(self, video) -> np.ndarray:
        feats = jnp.asarray(self.fx(video), jnp.float32)
        logits = layers.linear(self.head, feats)
        return np.asarray(jax.nn.softmax(logits, axis=-1), np.float64)
