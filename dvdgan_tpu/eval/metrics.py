"""FVD + Inception Score harnesses (SURVEY.md §2.17).

The reference repo has no eval harness; the paper ([P] §4) evaluates IS
(UCF-101), IS/FID (Kinetics synthesis) and FVD (prediction). BASELINE.json's
metric is FVD on UCF-101 — `fvd()` below with an I3D extractor (pluggable;
see eval/features.py for the no-network story).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np

from dvdgan_tpu.eval.frechet import frechet_from_features


def extract_features(extractor: Callable, clips: Iterable[np.ndarray],
                     batch_size: int = 16) -> np.ndarray:
    """Run the extractor over an iterable of clips (each (T,H,W,3) or a
    pre-batched (B,T,H,W,3)), batching for device efficiency."""
    feats = []
    buf = []
    for c in clips:
        c = np.asarray(c)
        if c.ndim == 5:
            feats.append(extractor(c))
            continue
        buf.append(c)
        if len(buf) == batch_size:
            feats.append(extractor(np.stack(buf)))
            buf = []
    if buf:
        feats.append(extractor(np.stack(buf)))
    if not feats:
        raise ValueError("no clips")
    return np.concatenate(feats)


def fvd(real_feats: np.ndarray, fake_feats: np.ndarray) -> float:
    """Fréchet Video Distance between two feature sets (N, D)."""
    return frechet_from_features(real_feats, fake_feats)


def fid(real_frame_feats: np.ndarray, fake_frame_feats: np.ndarray) -> float:
    """Fréchet Inception Distance over per-frame features (N·T, D) — same
    Fréchet math as FVD, frame-level embedding (paper's Kinetics IS/FID
    protocol uses frame statistics)."""
    return frechet_from_features(real_frame_feats, fake_frame_feats)


def inception_score(probs: np.ndarray, n_splits: int = 10
                    ) -> tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over `n_splits` splits -> (mean, std).
    probs: (N, n_classes) softmax outputs."""
    probs = np.asarray(probs, np.float64)
    n = probs.shape[0]
    splits = max(1, min(n_splits, n))
    scores = []
    for part in np.array_split(probs, splits):
        marginal = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(marginal + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def evaluate_generator(trainer, extractor: Callable, n_samples: int = 256,
                       batch_size: int = 16,
                       classifier: Optional[Callable] = None,
                       frame_extractor: Optional[Callable] = None) -> dict:
    """End-to-end eval loop: EMA-G samples vs the trainer's dataset.
    Returns {"fvd": ..., ["is_mean","is_std"]}.

    Synthesis (cond_frames == 0): unconditional samples vs real clips.
    Prediction (DVD-GAN-FP): each fake is conditioned on a real clip's
    prefix; features are computed over the FULL clip (real prefix +
    generated continuation) vs the corresponding real clips — the paper's
    prediction-FVD protocol ([P] §4)."""
    import jax
    import jax.numpy as jnp

    ds = trainer.dataset
    cf = getattr(trainer.g_cfg, "cond_frames", 0)
    n = min(n_samples, len(ds))

    # ONE decode per real clip: each batch is loaded once and feeds the
    # video extractor, the frame extractor AND (in prediction mode) the
    # conditioning prefixes — decoding is the host bottleneck at 256px/48f
    # and the naive per-consumer generator ran it 2-3x per clip.
    real_feats = []
    real_frame_feats = []
    fake_feats = []
    fake_frame_feats = []
    probs = []
    key = jax.random.PRNGKey(trainer.cfg.seed + 1234)
    done = 0
    while done < n:
        b = min(batch_size, n - done)
        items = [ds[done + j] for j in range(b)]   # ONE __getitem__ (and
        #                                            hence one decode) each
        reals = np.stack([np.asarray(c, np.float32) for c, _ in items])
        yy = np.asarray([lbl for _, lbl in items], np.int32)
        real_feats.append(extractor(reals))
        if frame_extractor is not None:
            real_frame_feats.append(frame_extractor(reals))

        key, kz, ky = jax.random.split(key, 3)
        z = jax.random.normal(kz, (b, trainer.g_cfg.z_dim))
        if cf:
            cond = jnp.asarray(reals[:, :cf])
            gen = np.asarray(jax.device_get(
                trainer.sample(z, jnp.asarray(yy), cond=cond)), np.float32)
            fake = np.concatenate([reals[:, :cf], gen], axis=1)
        else:
            y = jax.random.randint(ky, (b,), 0, trainer.cfg.n_classes)
            fake = np.asarray(jax.device_get(trainer.sample(z, y)),
                              np.float32)
        f = extractor(fake)
        fake_feats.append(f)
        if frame_extractor is not None:
            fake_frame_feats.append(frame_extractor(fake))
        if classifier is not None:
            # a classifier sharing THIS extractor's logits reuses them —
            # one scoring-network forward per batch, not two
            if (getattr(classifier, "fx", None) is extractor
                    and hasattr(classifier, "from_features")):
                probs.append(classifier.from_features(f))
            else:
                probs.append(classifier(fake))
        done += b
    out = {"fvd": fvd(np.concatenate(real_feats),
                      np.concatenate(fake_feats))}
    if frame_extractor is not None:
        out["fid"] = fid(np.concatenate(real_frame_feats),
                         np.concatenate(fake_frame_feats))
    if probs:
        m, s = inception_score(np.concatenate(probs))
        out.update(is_mean=m, is_std=s)
    return out
