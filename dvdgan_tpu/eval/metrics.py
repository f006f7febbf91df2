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


def compute_real_features(ds, extractor: Callable, n: int,
                          batch_size: int = 16,
                          frame_extractor: Optional[Callable] = None
                          ) -> tuple[np.ndarray, Optional[np.ndarray]]:
    """The real side of FVD/FID: features of the first `n` dataset clips.

    A pure function of (dataset, extractor, n) — so cache it: the trainer
    memoizes it across --eval_step evaluations and --mode eval can persist
    it to disk (--real_stats), instead of re-decoding and re-embedding the
    identical real set on every evaluation (half the scoring-network
    forwards, all of the real decodes)."""
    feats = []
    frame_feats = []
    n = min(n, len(ds))
    done = 0
    while done < n:
        b = min(batch_size, n - done)
        items = [ds[done + j] for j in range(b)]
        reals = np.stack([np.asarray(c, np.float32) for c, _ in items])
        feats.append(extractor(reals))
        if frame_extractor is not None:
            frame_feats.append(frame_extractor(reals))
        done += b
    if not feats:
        raise ValueError("no clips")
    return (np.concatenate(feats),
            np.concatenate(frame_feats) if frame_extractor is not None
            else None)


def file_stamp(path: Optional[str]) -> str:
    """Identity stamp for a weights file (basename:size:mtime_ns) for
    real-stats cache metadata — a replaced/reconverted weights npz changes
    the feature space, so it must invalidate the cache."""
    import os
    if not path:
        return "none"
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}"


def load_or_compute_real_stats(path: str, ds, extractor: Callable, n: int,
                               batch_size: int = 16,
                               frame_extractor: Optional[Callable] = None,
                               meta: Optional[dict] = None,
                               write: bool = True
                               ) -> tuple[np.ndarray, Optional[np.ndarray]]:
    """Disk-persisted real-side features (standard FID practice). If
    `path` exists, load it — after checking every `meta` entry against the
    stamps written at save time, so stale stats from a different
    dataset/extractor/shape can't silently poison the Fréchet math.
    Otherwise compute via `compute_real_features` and (with write=True)
    save to `path`. Multi-host: pass write=False on non-leader processes —
    N processes publishing the same path would race the tmp+rename."""
    import os
    meta = meta or {}
    if os.path.exists(path):
        with np.load(path, allow_pickle=False) as z:
            for k, v in meta.items():
                got = (str(z[f"meta_{k}"]) if f"meta_{k}" in z
                       else "<absent>")
                if got != str(v):
                    raise ValueError(
                        f"real-stats {k} mismatch at {path}: cache has "
                        f"{got!r}, this run wants {v!r}")
            rff = z["frame_feats"] if "frame_feats" in z else None
            return z["feats"], rff
    rf, rff = compute_real_features(ds, extractor, n, batch_size=batch_size,
                                    frame_extractor=frame_extractor)
    if not write:
        return rf, rff
    arrays = {"feats": rf}
    if rff is not None:
        arrays["frame_feats"] = rff
    tmp = path + ".tmp"
    np.savez(tmp, **arrays,
             **{f"meta_{k}": str(v) for k, v in meta.items()})
    # np.savez appends .npz to pathless-suffix names; normalize then
    # publish atomically — an interrupted run must leave NO file at
    # `path` (a truncated zip would make every later eval crash in
    # np.load instead of recomputing)
    written = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(written, path)
    return rf, rff


def evaluate_generator(trainer, extractor: Callable, n_samples: int = 256,
                       batch_size: int = 16,
                       classifier: Optional[Callable] = None,
                       frame_extractor: Optional[Callable] = None,
                       real_features: Optional[tuple] = None,
                       sample_seed: int = 1234) -> dict:
    """End-to-end eval loop: EMA-G samples vs the trainer's dataset.
    Returns {"fvd": ..., ["is_mean","is_std"]}.

    Synthesis (cond_frames == 0): unconditional samples vs real clips.
    Prediction (DVD-GAN-FP): each fake is conditioned on a real clip's
    prefix; features are computed over the FULL clip (real prefix +
    generated continuation) vs the corresponding real clips — the paper's
    prediction-FVD protocol ([P] §4).

    `sample_seed`: offsets the fake-side RNG stream — repeated calls
    with different seeds (and a shared `real_features`) give independent
    FVD estimates for a mean±std report (--eval_repeats).

    `real_features`: precomputed `compute_real_features(...)` output for
    THIS (dataset, extractor[, frame_extractor], n). When given, the real
    side is not re-embedded — and in synthesis mode not even re-decoded
    (prediction mode still decodes reals: the fakes are conditioned on
    their prefixes)."""
    import jax
    import jax.numpy as jnp

    ds = trainer.dataset
    cf = getattr(trainer.g_cfg, "cond_frames", 0)
    n = min(n_samples, len(ds))
    if real_features is not None:
        if frame_extractor is not None and real_features[1] is None:
            raise ValueError(
                "real_features lacks frame features but a frame_extractor "
                "was requested — recompute the cache with frame_extractor")
        if real_features[0].shape[0] != n:
            raise ValueError(
                f"real_features has {real_features[0].shape[0]} clips but "
                f"this evaluation uses {n} — recompute the cache")

    # Real side. Synthesis mode: reals are features-only, so either take
    # the caller's precomputed set or compute it up front (identical
    # decode count). Prediction mode: reals also feed the conditioning
    # prefixes, so they're decoded inside the fake loop — ONE decode per
    # clip shared between features and conditioning (decode is the host
    # bottleneck at 256px/48f) — and embedded there unless cached.
    inline_real = real_features is None and cf > 0
    if real_features is not None:
        rf, rff = real_features
    elif not inline_real:
        rf, rff = compute_real_features(ds, extractor, n,
                                        batch_size=batch_size,
                                        frame_extractor=frame_extractor)
    real_feats = []
    real_frame_feats = []
    fake_feats = []
    fake_frame_feats = []
    probs = []
    key = jax.random.PRNGKey(trainer.cfg.seed + sample_seed)
    done = 0
    while done < n:
        b = min(batch_size, n - done)
        key, kz, ky = jax.random.split(key, 3)
        z = jax.random.normal(kz, (b, trainer.g_cfg.z_dim))
        if cf:
            items = [ds[done + j] for j in range(b)]   # ONE __getitem__
            #                                 (and hence one decode) each
            reals = np.stack([np.asarray(c, np.float32) for c, _ in items])
            yy = np.asarray([lbl for _, lbl in items], np.int32)
            if inline_real:
                real_feats.append(extractor(reals))
                if frame_extractor is not None:
                    real_frame_feats.append(frame_extractor(reals))
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
    if inline_real:
        rf = np.concatenate(real_feats)
        rff = (np.concatenate(real_frame_feats)
               if frame_extractor is not None else None)
    out = {"fvd": fvd(rf, np.concatenate(fake_feats))}
    if frame_extractor is not None:
        out["fid"] = fid(rff, np.concatenate(fake_frame_feats))
    if probs:
        m, s = inception_score(np.concatenate(probs))
        out.update(is_mean=m, is_std=s)
    return out
