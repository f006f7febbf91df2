"""Eval-harness tests (SURVEY §7.9: ship FVD with a synthetic-feature
test — pretrained I3D weights need network access)."""

import numpy as np
import pytest

from dvdgan_tpu.eval import (ClassifierProbs, I3DLikeFeatures,
                             extract_features, frechet_distance, fvd,
                             inception_score, statistics)


def test_frechet_zero_for_identical_distributions():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 8)
    mu, cov = statistics(f)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_known_gaussian_shift():
    """For two isotropic Gaussians differing only in mean, FD = |Δμ|²."""
    rng = np.random.RandomState(1)
    a = rng.randn(200000, 4)
    b = rng.randn(200000, 4) + np.array([2.0, 0, 0, 0])
    d = fvd(a, b)
    assert abs(d - 4.0) < 0.1, d


def test_frechet_scale_difference():
    """Same mean, variance 1 vs 4 per dim: FD = D·(1+4−2·2) = D."""
    rng = np.random.RandomState(2)
    a = rng.randn(200000, 3)
    b = 2.0 * rng.randn(200000, 3)
    assert abs(fvd(a, b) - 3.0) < 0.1


def test_inception_score_bounds():
    n, c = 1000, 10
    # uniform probs -> IS = 1
    probs = np.full((n, c), 1.0 / c)
    m, _ = inception_score(probs)
    assert abs(m - 1.0) < 1e-6
    # one-hot over balanced classes -> IS = c
    probs = np.eye(c)[np.arange(n) % c]
    m, _ = inception_score(probs, n_splits=1)
    assert abs(m - c) < 1e-4


def test_i3d_like_extractor_shapes():
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    v = np.random.RandomState(0).randn(3, 4, 16, 16, 3).astype(np.float32)
    f = fx(v)
    assert f.shape == (3, 16)
    assert np.isfinite(f).all()
    # deterministic
    assert np.array_equal(f, fx(v))


@pytest.mark.slow
def test_i3d_real_topology_random_init():
    """The genuine I3D net runs at random init; pretrained flag is honest."""
    from dvdgan_tpu.eval import I3DFeatures

    fx = I3DFeatures(seed=0, resize=None)
    assert not fx.pretrained
    v = np.random.RandomState(0).rand(2, 8, 32, 32, 3).astype(np.float32)
    f = fx(v)
    assert f.shape == (2, 400) and np.isfinite(f).all()

    fx2 = I3DFeatures(seed=0, feature="avgpool", resize=None)
    f2 = fx2(v)
    assert f2.shape == (2, 1024) and np.isfinite(f2).all()


def test_i3d_classifier_probs():
    """Published video-IS classifier: softmax of the shared I3D's 400-way
    Kinetics logits; probs normalize; extractor sharing is enforced."""
    import pytest
    from dvdgan_tpu.eval import I3DClassifierProbs, I3DFeatures

    fx = I3DFeatures(seed=0, resize=None)
    cp = I3DClassifierProbs(feature_extractor=fx)
    assert not cp.pretrained
    v = np.random.RandomState(1).rand(2, 8, 32, 32, 3).astype(np.float32)
    p = cp(v)
    assert p.shape == (2, 400) and np.isfinite(p).all()
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, rtol=1e-12)

    fx_pool = I3DFeatures(seed=0, feature="avgpool", resize=None)
    with pytest.raises(ValueError, match="logits"):
        I3DClassifierProbs(feature_extractor=fx_pool)


def test_extract_features_batching():
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    clips = [np.zeros((4, 16, 16, 3), np.float32) for _ in range(5)]
    f = extract_features(fx, clips, batch_size=2)
    assert f.shape == (5, 16)


def test_classifier_probs_sum_to_one():
    cp = ClassifierProbs(n_classes=7, widths=(8, 16))
    v = np.random.RandomState(1).randn(2, 4, 16, 16, 3).astype(np.float32)
    p = cp(v)
    assert p.shape == (2, 7)
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-5)


def test_fvd_discriminates_distributions():
    """Same extractor: FVD(noise, noise') << FVD(noise, structured)."""
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    rng = np.random.RandomState(3)
    a = rng.randn(16, 4, 16, 16, 3).astype(np.float32).clip(-1, 1)
    b = rng.randn(16, 4, 16, 16, 3).astype(np.float32).clip(-1, 1)
    c = np.ones((16, 4, 16, 16, 3), np.float32)
    fa, fb, fc = fx(a), fx(b), fx(c)
    assert fvd(fa, fb) < fvd(fa, fc)


def test_evaluate_generator_end_to_end(tmp_path):
    """Full eval loop against a tiny Trainer: FVD + IS computed from EMA-G
    samples vs the synthetic dataset (SURVEY §2.17 harness e2e)."""
    from dvdgan_tpu.eval import ClassifierProbs, evaluate_generator
    from dvdgan_tpu.train.trainer import Trainer
    from dvdgan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=0, bf16=False, out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    clf = ClassifierProbs(3, seed=1, widths=(8, 16))
    out = evaluate_generator(tr, fx, n_samples=8, batch_size=4,
                             classifier=clf)
    tr.close()
    assert np.isfinite(out["fvd"]) and out["fvd"] >= 0
    assert 1.0 <= out["is_mean"] <= 3.0 + 1e-6


def test_frame_fid_in_eval_harness(tmp_path):
    """evaluate_generator computes frame-level FID alongside FVD when a
    frame extractor is supplied (paper's Kinetics IS/FID protocol)."""
    from dvdgan_tpu.eval import InceptionFeatures, evaluate_generator
    from dvdgan_tpu.train.trainer import Trainer
    from dvdgan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=0, bf16=False, out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    fx2d = InceptionFeatures(seed=0, resize=75)
    out = evaluate_generator(tr, fx, n_samples=4, batch_size=2,
                             frame_extractor=fx2d)
    tr.close()
    assert np.isfinite(out["fvd"]) and np.isfinite(out["fid"])
    assert out["fid"] >= 0


def test_c3d_classifier_probs_and_windowing():
    """UCF-IS classifier: probs normalize; clips are windowed to exactly
    16 frames (loop-tile short, center-crop long) before C3D."""
    from dvdgan_tpu.eval import C3DClassifierProbs

    cp = C3DClassifierProbs(seed=0)
    assert not cp.pretrained
    rng = np.random.RandomState(2)
    for t in (8, 16, 24):                 # short / exact / long clips
        v = rng.rand(1, t, 64, 64, 3).astype(np.float32) * 2 - 1
        p = cp(v)
        assert p.shape == (1, 101) and np.isfinite(p).all()
        np.testing.assert_allclose(p.sum(axis=-1), 1.0, rtol=1e-12)


def test_eval_single_decode_per_clip(tmp_path):
    """evaluate_generator fetches each dataset item exactly ONCE — decode
    is the host bottleneck at 256px/48f and a review pass found ds[i]
    indexed twice per clip (clip + label as separate __getitem__ calls)."""
    import collections

    from dvdgan_tpu.eval import evaluate_generator
    from dvdgan_tpu.train.trainer import Trainer
    from dvdgan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=0, bf16=False, out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    calls = collections.Counter()
    inner = tr.dataset

    class Counting:
        def __len__(self):
            return len(inner)

        def __getitem__(self, i):
            calls[i] += 1
            return inner[i]

    tr.dataset = Counting()
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    out = evaluate_generator(tr, fx, n_samples=6, batch_size=3)
    tr.close()
    assert np.isfinite(out["fvd"])
    assert len(calls) == 6 and all(v == 1 for v in calls.values())


def test_real_features_cache_exact_and_skips_decode(tmp_path):
    """evaluate_generator with a precomputed real side returns the exact
    same metrics as the inline path, and in synthesis mode touches the
    dataset ZERO times (no decode, no real extractor forward)."""
    import collections

    from dvdgan_tpu.eval import compute_real_features, evaluate_generator
    from dvdgan_tpu.train.trainer import Trainer
    from dvdgan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=0, bf16=False, out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    base = evaluate_generator(tr, fx, n_samples=6, batch_size=3)

    rf = compute_real_features(tr.dataset, fx, 6, batch_size=3)
    calls = collections.Counter()
    inner = tr.dataset

    class Counting:
        def __len__(self):
            return len(inner)

        def __getitem__(self, i):
            calls[i] += 1
            return inner[i]

    tr.dataset = Counting()
    cached = evaluate_generator(tr, fx, n_samples=6, batch_size=3,
                                real_features=rf)
    tr.close()
    assert cached["fvd"] == base["fvd"]
    assert len(calls) == 0


def test_real_features_cache_mismatch_raises(tmp_path):
    """Wrong-sized caches and caches missing frame features must be
    rejected, not silently blended into the Fréchet math."""
    import numpy as np
    import pytest

    from dvdgan_tpu.eval import evaluate_generator
    from dvdgan_tpu.train.trainer import Trainer
    from dvdgan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=0, bf16=False, out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    with pytest.raises(ValueError, match="recompute the cache"):
        evaluate_generator(tr, fx, n_samples=6, batch_size=3,
                           real_features=(np.zeros((3, 16)), None))
    with pytest.raises(ValueError, match="frame_extractor"):
        evaluate_generator(tr, fx, n_samples=6, batch_size=3,
                           frame_extractor=fx,
                           real_features=(np.zeros((6, 16)), None))
    tr.close()


def test_trainer_evaluate_memoizes_real_side(tmp_path):
    """Trainer.evaluate embeds the real set once; later --eval_step
    evaluations reuse it (zero additional dataset reads)."""
    import collections

    from dvdgan_tpu.train.trainer import Trainer
    from dvdgan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=0, bf16=False, out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    calls = collections.Counter()
    inner = tr.dataset

    class Counting:
        def __len__(self):
            return len(inner)

        def __getitem__(self, i):
            calls[i] += 1
            return inner[i]

    tr.dataset = Counting()
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    a = tr.evaluate(extractor=fx, n_samples=6)
    first = sum(calls.values())
    b = tr.evaluate(extractor=fx, n_samples=6)
    tr.close()
    assert first == 6 and sum(calls.values()) == first
    assert a["fvd"] == b["fvd"]   # same EMA-G, same seed stream, same reals


def test_load_or_compute_real_stats_roundtrip(tmp_path):
    """Disk path: first call computes+saves, second loads bit-identically;
    metadata mismatch raises."""
    import numpy as np
    import pytest

    from dvdgan_tpu.data import SyntheticVideoDataset
    from dvdgan_tpu.eval import load_or_compute_real_stats

    ds = SyntheticVideoDataset(n_items=8, n_frames=4, img_size=32,
                               n_classes=3, seed=0)
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    path = str(tmp_path / "stats.npz")
    meta = {"dataset": "synthetic", "img_size": 32, "n": 6}
    rf, rff = load_or_compute_real_stats(path, ds, fx, 6, batch_size=3,
                                         meta=meta)
    assert rff is None

    class Poison:
        def __getitem__(self, i):
            raise AssertionError("loaded path must not touch the dataset")

        def __len__(self):
            return 8

    rf2, rff2 = load_or_compute_real_stats(path, Poison(), fx, 6,
                                           batch_size=3, meta=meta)
    assert np.array_equal(rf, rf2) and rff2 is None
    with pytest.raises(ValueError, match="img_size mismatch"):
        load_or_compute_real_stats(path, Poison(), fx, 6, batch_size=3,
                                   meta={**meta, "img_size": 64})
    # frame features round-trip too
    path2 = str(tmp_path / "stats_f.npz")
    rf3, rff3 = load_or_compute_real_stats(path2, ds, fx, 6, batch_size=3,
                                           frame_extractor=fx, meta=meta)
    rf4, rff4 = load_or_compute_real_stats(path2, Poison(), fx, 6,
                                           batch_size=3, meta=meta)
    assert np.array_equal(rff3, rff4)


def test_file_stamp_invalidates_real_stats(tmp_path):
    """Replacing a weights file (same tag) must invalidate a real-stats
    cache keyed on its file_stamp."""
    import time

    import numpy as np
    import pytest

    from dvdgan_tpu.data import SyntheticVideoDataset
    from dvdgan_tpu.eval import file_stamp, load_or_compute_real_stats

    assert file_stamp("") == "none" and file_stamp(None) == "none"
    w = tmp_path / "weights.npz"
    np.savez(w, a=np.zeros(3))
    ds = SyntheticVideoDataset(n_items=8, n_frames=4, img_size=32,
                               n_classes=3, seed=0)
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    stats = str(tmp_path / "stats.npz")
    meta = {"extractor_weights": file_stamp(str(w))}
    load_or_compute_real_stats(stats, ds, fx, 4, batch_size=2, meta=meta)
    # same stamp: loads fine
    load_or_compute_real_stats(stats, ds, fx, 4, batch_size=2, meta=meta)
    time.sleep(0.01)
    np.savez(w, a=np.ones(4))   # replaced file -> new stamp
    with pytest.raises(ValueError, match="extractor_weights mismatch"):
        load_or_compute_real_stats(
            stats, ds, fx, 4, batch_size=2,
            meta={"extractor_weights": file_stamp(str(w))})


def test_real_stats_write_false_touches_no_disk(tmp_path):
    """write=False (non-leader processes) computes without publishing —
    and still loads an existing cache when one is present."""
    import numpy as np

    from dvdgan_tpu.data import SyntheticVideoDataset
    from dvdgan_tpu.eval import load_or_compute_real_stats

    ds = SyntheticVideoDataset(n_items=8, n_frames=4, img_size=32,
                               n_classes=3, seed=0)
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    path = str(tmp_path / "s.npz")
    rf1, _ = load_or_compute_real_stats(path, ds, fx, 4, batch_size=2,
                                        write=False)
    assert list(tmp_path.iterdir()) == []            # nothing published
    rf2, _ = load_or_compute_real_stats(path, ds, fx, 4, batch_size=2)
    assert (tmp_path / "s.npz").exists()
    rf3, _ = load_or_compute_real_stats(path, ds, fx, 4, batch_size=2,
                                        write=False)  # reads the cache
    assert np.array_equal(rf1, rf2) and np.array_equal(rf2, rf3)


def test_sample_seed_varies_fake_stream(tmp_path):
    """Different sample_seed -> different fake draws (distinct FVD);
    same seed -> identical FVD. Basis of --eval_repeats mean±std."""
    from dvdgan_tpu.eval import compute_real_features, evaluate_generator
    from dvdgan_tpu.train.trainer import Trainer
    from dvdgan_tpu.utils.config import Config

    cfg = Config(dataset="synthetic", n_classes=3, img_size=32, n_frames=4,
                 ch=8, d_ch=8, k_frames=2, batch_size=2, d_steps=1,
                 total_step=0, bf16=False, out_dir=str(tmp_path / "run"))
    tr = Trainer(cfg)
    fx = I3DLikeFeatures(seed=0, widths=(8, 16))
    rf = compute_real_features(tr.dataset, fx, 6, batch_size=3)
    a = evaluate_generator(tr, fx, n_samples=6, batch_size=3,
                           real_features=rf, sample_seed=1234)
    b = evaluate_generator(tr, fx, n_samples=6, batch_size=3,
                           real_features=rf, sample_seed=2234)
    c = evaluate_generator(tr, fx, n_samples=6, batch_size=3,
                           real_features=rf, sample_seed=1234)
    tr.close()
    assert a["fvd"] == c["fvd"]
    assert a["fvd"] != b["fvd"]
