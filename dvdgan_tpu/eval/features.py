"""Video feature extractors for FVD / IS (SURVEY.md §2.17, §7.9).

Published FVD uses an I3D network pretrained on Kinetics-400. Pretrained
weights need the network, which this sandbox does not have — so the harness
is PLUGGABLE: any callable (B, T, H, W, 3)[-1,1] -> (B, D) works.

Provided extractors:
  * `I3DLikeFeatures` — an I3D-topology 3-D conv stack (inflated-inception-
    ish widths) running on-device under jit. With `weights_npz` it loads
    converted pretrained weights (layer-name keyed); WITHOUT weights it runs
    at a fixed random init — random deep conv features are a known-usable
    stand-in for relative/FVD-trend comparisons within one extractor
    instance, but its absolute numbers are NOT comparable to published FVD.
  * `ClassifierProbs` — softmax class probabilities from a provided or
    random-init classifier, feeding Inception Score.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dvdgan_tpu.ops import layers


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


class I3DLikeFeatures:
    def __init__(self, seed: int = 0, weights_npz: Optional[str] = None,
                 widths=(64, 128, 256, 512)):
        if weights_npz is not None:
            loaded = np.load(weights_npz)
            blocks = []
            i = 0
            while f"block{i}_w" in loaded:
                blocks.append({"w": jnp.asarray(loaded[f"block{i}_w"]),
                               "b": jnp.asarray(loaded[f"block{i}_b"])})
                i += 1
            self.params = {"blocks": blocks}
        else:
            self.params = _i3d_like_init(jax.random.PRNGKey(seed), widths)
        self._apply = jax.jit(_i3d_like_apply)

    def __call__(self, video) -> np.ndarray:
        feats = self._apply(self.params, jnp.asarray(video, jnp.float32))
        return np.asarray(jax.device_get(feats), np.float64)


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
