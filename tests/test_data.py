"""Input-pipeline tests (SURVEY.md §2.12): synthetic determinism, frame-
folder fixtures (.npy — no codecs needed), window sampling, normalization
range, loader batching/prefetch."""

import numpy as np
import pytest

from dvdgan_tpu.data import frames as frames
from dvdgan_tpu.data import loader as loader

from dvdgan_tpu.data import FrameFolderDataset, Loader, SyntheticVideoDataset
from dvdgan_tpu.utils.media import denorm_uint8, video_grid


def test_synthetic_shapes_and_determinism():
    ds = SyntheticVideoDataset(16, n_frames=4, img_size=32, n_classes=5)
    clip, label = ds[3]
    assert clip.shape == (4, 32, 32, 3) and clip.dtype == np.float32
    assert clip.min() >= -1.0 and clip.max() <= 1.0
    clip2, label2 = ds[3]
    assert np.array_equal(clip, clip2) and label == label2
    assert label == 3 % 5


def test_synthetic_motion():
    ds = SyntheticVideoDataset(8, n_frames=8, img_size=32, n_classes=5)
    clip, _ = ds[1]
    assert not np.array_equal(clip[0], clip[7])


def _write_fixture(root, n_classes=2, n_videos=2, t0=10, size=48):
    rng = np.random.RandomState(0)
    for c in range(n_classes):
        cdir = root / f"class{c}"
        cdir.mkdir(parents=True)
        for v in range(n_videos):
            arr = rng.randint(0, 256, (t0, size, size, 3), dtype=np.uint8)
            np.save(cdir / f"vid{v}.npy", arr)


def test_frame_folder_npy(tmp_path):
    _write_fixture(tmp_path)
    ds = FrameFolderDataset(str(tmp_path), n_frames=4, img_size=32)
    assert len(ds) == 4 and ds.n_classes == 2
    clip, label = ds[0]
    assert clip.shape == (4, 32, 32, 3)
    assert clip.min() >= -1.0 and clip.max() <= 1.0
    assert label == 0
    _, label3 = ds[3]
    assert label3 == 1


def test_frame_folder_short_clip_looped(tmp_path):
    cdir = tmp_path / "a" / "v0"
    cdir.parent.mkdir()
    np.save(tmp_path / "a" / "v0.npy",
            np.zeros((2, 8, 8, 3), np.uint8))
    ds = FrameFolderDataset(str(tmp_path), n_frames=6, img_size=8)
    clip, _ = ds[0]
    assert clip.shape == (6, 8, 8, 3)


def test_loader_batches_and_drop_last():
    ds = SyntheticVideoDataset(10, n_frames=2, img_size=16, n_classes=3)
    loader = Loader(ds, batch_size=4)
    batches = list(loader.epoch(0))
    assert len(batches) == 2  # drop_last
    clips, labels = batches[0]
    assert clips.shape == (4, 2, 16, 16, 3)
    assert labels.shape == (4,) and labels.dtype == np.int32


def test_loader_forever_and_shuffle_differs_by_epoch():
    ds = SyntheticVideoDataset(8, n_frames=2, img_size=16, n_classes=3)
    loader = Loader(ds, batch_size=8)
    it = loader.forever()
    _, l1 = next(it)
    _, l2 = next(it)
    assert l1.shape == l2.shape == (8,)
    assert not np.array_equal(l1, l2)  # different epoch shuffles


def test_media_grid_and_denorm():
    v = np.linspace(-1, 1, 2 * 3 * 4 * 4 * 3, dtype=np.float32)
    v = v.reshape(2, 3, 4, 4, 3)
    u = denorm_uint8(v)
    assert u.dtype == np.uint8 and u.min() >= 0
    g = video_grid(u)
    assert g.shape == (2 * 6 + 2, 3 * 6 + 2, 3)


def test_frame_folder_image_files(tmp_path):
    """PIL decode path: frame dirs of PNGs (the UCF-101 extracted-frame
    layout) through the native clip assembler."""
    from PIL import Image
    vdir = tmp_path / "classA" / "vid0"
    vdir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(vdir / f"frame_{i:03d}.png")
    ds = FrameFolderDataset(str(tmp_path), n_frames=4, img_size=16)
    clip, label = ds[0]
    assert clip.shape == (4, 16, 16, 3) and label == 0
    assert clip.min() >= -1.0 and clip.max() <= 1.0
    assert clip.std() > 0.1  # actual image content, not zeros


def test_frame_dir_windowed_decode_equivalence(tmp_path, monkeypatch):
    """Frame dirs decode ONLY the sampled window (measured input-pipeline
    fix): pixels and the RNG stream must equal full-decode + window, and
    exactly n_frames files may be opened when the clip is long enough."""
    from PIL import Image
    vdir = tmp_path / "classA" / "vid0"
    vdir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    arrs = [rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
            for _ in range(10)]
    for i, arr in enumerate(arrs):
        Image.fromarray(arr).save(vdir / f"frame_{i:03d}.png")

    ds = FrameFolderDataset(str(tmp_path), n_frames=4, img_size=16, seed=7)
    ds.set_epoch(2)

    # oracle: full decode + the same (seed, epoch, idx) window draw
    full = np.stack([np.asarray(Image.open(vdir / f"frame_{i:03d}.png")
                                .convert("RGB")) for i in range(10)])
    oracle_rng = np.random.RandomState(
        (7 * 1000003 + 2 * 9973 + 0 * 101 + 17) & 0x7FFFFFFF)
    start = oracle_rng.randint(0, 10 - 4 + 1)
    from dvdgan_tpu import native
    want = native.clip_window(full, 4, 16, start)

    opens = []
    real_open = Image.open
    monkeypatch.setattr(Image, "open",
                        lambda p, *a, **k: opens.append(p) or real_open(p))
    clip, _ = ds[0]
    assert len(opens) == 4          # the window only, not all 10 frames
    np.testing.assert_array_equal(clip, want)

    # short clip (t0 < n_frames): all frames decoded, loop-padded as before
    ds2 = FrameFolderDataset(str(tmp_path), n_frames=16, img_size=16)
    opens.clear()
    clip2, _ = ds2[0]
    assert len(opens) == 10 and clip2.shape == (16, 16, 16, 3)


class _SlowDataset:
    """Each item costs ~10 ms of GIL-released sleep (models codec decode)."""

    def __init__(self, n=32, delay=0.01):
        import time as _t
        self._t = _t
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self._t.sleep(self.delay)
        return np.full((2, 4, 4, 3), i, np.float32), i % 3


def test_loader_threads_actually_parallelize():
    """num_threads>1 must assemble batches concurrently (ADVICE r1: the
    parameter was dead). 8 items × 10 ms serial = 80 ms/batch; with 8
    threads a batch should take ~1 sleep. Generous 2× margin on wall-clock,
    and content/order must be identical to the serial path."""
    import time

    ds = _SlowDataset(n=32)
    serial = Loader(ds, batch_size=8, seed=0, num_threads=1)
    pooled = Loader(ds, batch_size=8, seed=0, num_threads=8)

    t0 = time.perf_counter()
    b_serial = list(serial.epoch(0))
    dt_serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    b_pooled = list(pooled.epoch(0))
    dt_pooled = time.perf_counter() - t0

    assert len(b_serial) == len(b_pooled) == 4
    for (cs, ls), (cp, lp) in zip(b_serial, b_pooled):
        assert np.array_equal(cs, cp) and np.array_equal(ls, lp)
    # 8 GIL-released 10 ms sleeps per batch collapse to ~1 under the pool.
    # Compare against the MEASURED serial epoch, not absolute wall-clock —
    # host contention scales both paths, an absolute bound flakes under it
    # (ideal ratio 8x; demand only 2x)
    assert dt_pooled < dt_serial / 2, \
        f"pooled epoch {dt_pooled:.3f}s vs serial {dt_serial:.3f}s"
    pooled.close()   # exercise the pool-shutdown API
    assert pooled._pool is None


def test_loader_close_refuses_while_epoch_active():
    """close() under a live epoch()/forever() prefetch worker races the
    worker's pool use (shutdown-then-None could raise inside the worker or
    silently flip it to the serial branch mid-epoch — ADVICE r3): it must
    refuse loudly, and work again once the iterator is abandoned (its
    cleanup joins the worker)."""
    import pytest

    ds = _SlowDataset(n=32)
    ld = Loader(ds, batch_size=8, seed=0, num_threads=4)
    it = ld.epoch(0)
    next(it)
    with pytest.raises(RuntimeError, match="close.*active"):
        ld.close()
    it.close()   # generator cleanup joins the worker
    ld.close()
    assert ld._pool is None and ld._epoch_workers == 0


def test_frame_folder_video_files(tmp_path):
    """In-pipeline video decode (SURVEY 2.12 'frame dirs or video files'):
    a .gif clip decodes through the plugin-detected imageio backend and
    flows through the same native window/crop/resize path."""
    from PIL import Image

    vdir = tmp_path / "classB"
    vdir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    frames = [Image.fromarray(rng.randint(0, 255, (24, 32, 3), dtype=np.uint8))
              for _ in range(6)]
    frames[0].save(vdir / "vid0.gif", save_all=True,
                   append_images=frames[1:])
    ds = FrameFolderDataset(str(tmp_path), n_frames=4, img_size=16)
    assert len(ds) == 1
    clip, label = ds[0]
    assert clip.shape == (4, 16, 16, 3) and label == 0
    assert clip.min() >= -1.0 and clip.max() <= 1.0
    assert clip.std() > 0.1


def test_raw_container_skipped_without_codec_backend(tmp_path, monkeypatch):
    """A .avi in the tree must be SKIPPED (with a warning) when no
    ffmpeg/pyav backend exists — imageio importing is not enough; listing
    it would crash the loader thread at decode time (review finding)."""
    import warnings

    from dvdgan_tpu.data import frames as frames_mod

    vdir = tmp_path / "classA"
    vdir.mkdir(parents=True)
    (vdir / "vid0.avi").write_bytes(b"not a real avi")
    np.save(vdir / "vid1.npy",
            np.zeros((6, 16, 16, 3), np.uint8))
    monkeypatch.setattr(frames_mod, "_CODEC_OK", False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ds = FrameFolderDataset(str(tmp_path), n_frames=4, img_size=16)
    assert len(ds) == 1                       # only the .npy
    assert any("skipped" in str(x.message) for x in w)


def test_loader_propagates_worker_errors(tmp_path):
    """A decode error in the prefetch worker must surface to the consumer,
    not silently truncate the epoch (review finding)."""
    import pytest

    class Exploding:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise OSError("decode failed")
            return np.zeros((2, 8, 8, 3), np.float32), 0

    ld = Loader(Exploding(), batch_size=2, shuffle=False, num_threads=1)
    it = ld.epoch(0)
    next(it)                                  # batch [0, 1] fine
    with pytest.raises(OSError, match="decode failed"):
        next(it)                              # batch [2, 3] must raise


def test_frame_window_pure_and_epoch_varied(tmp_path):
    """Window sampling is a pure function of (seed, epoch, idx): repeated
    reads are identical (thread-safe, exact mid-epoch resume), different
    epochs redraw (augmentation still varies)."""
    _write_fixture(tmp_path, n_classes=1, n_videos=1, t0=20)
    ds = FrameFolderDataset(str(tmp_path), n_frames=4, img_size=16, seed=3)
    a1, _ = ds[0]
    a2, _ = ds[0]
    np.testing.assert_array_equal(a1, a2)     # no hidden RNG state consumed
    windows = []
    for e in range(6):
        ds.set_epoch(e)
        windows.append(ds[0][0])
    assert any(not np.array_equal(windows[0], w) for w in windows[1:])


def test_frame_folder_mid_epoch_resume_exact(tmp_path):
    """Loader.epoch(e, start_batch=k) on a FrameFolderDataset replays
    exactly the uninterrupted epoch's tail — requires the pure
    (seed, epoch, idx) window contract (review finding: the old stateful
    ds.rng desynced on skip)."""
    _write_fixture(tmp_path, n_classes=2, n_videos=3, t0=20)
    ds = FrameFolderDataset(str(tmp_path), n_frames=4, img_size=16, seed=1)
    ld = Loader(ds, batch_size=2, seed=5, num_threads=1)
    full = list(ld.epoch(1))
    tail = list(ld.epoch(1, start_batch=2))
    assert len(tail) == len(full) - 2
    for (ca, la), (cb, lb) in zip(full[2:], tail):
        np.testing.assert_array_equal(ca, cb)
        np.testing.assert_array_equal(la, lb)


def test_large_seed_does_not_overflow(tmp_path):
    """np.uint32(big) raises under NumPy >= 2; the window-stream seed must
    mask in Python ints first (seed >= 4295 used to crash __getitem__)."""
    root = tmp_path / "ds"
    (root / "a").mkdir(parents=True)
    np.save(root / "a" / "v0.npy",
            (np.random.RandomState(0).rand(6, 8, 8, 3) * 255).astype(np.uint8))
    ds = frames.FrameFolderDataset(str(root), n_frames=4, img_size=8,
                                   seed=123456789)
    ds.set_epoch(10**6)
    clip, label = ds[0]
    assert clip.shape == (4, 8, 8, 3) and label == 0


def test_negative_float_npy_uses_minus_one_one_convention(tmp_path):
    """Float .npy clips containing negatives are [-1,1] (the framework's
    own output convention) — they must rescale, not clip to black."""
    root = tmp_path / "ds"
    (root / "a").mkdir(parents=True)
    np.save(root / "a" / "v0.npy",
            np.full((4, 8, 8, 3), -0.5, np.float32))   # mid-dark gray
    ds = frames.FrameFolderDataset(str(root), n_frames=4, img_size=8)
    clip, _ = ds[0]
    # (-0.5+1)/2 = 0.25 -> u8 64 -> normalized ~ -0.5 (old code clipped
    # all negatives to 0 -> -1.0)
    assert abs(float(clip.mean()) + 0.5) < 0.02


def test_loader_rejects_empty_epoch():
    """dataset smaller than batch_size with drop_last must raise, not spin
    forever spawning a thread per lap."""
    ds = [(np.zeros((2, 4, 4, 3), np.float32), 0)] * 3
    ld = loader.Loader(ds, batch_size=8, drop_last=True)
    with pytest.raises(ValueError, match="zero batches"):
        next(ld.forever())


def test_prefetch_zero_rejected():
    """prefetch<1 would mean an UNBOUNDED queue (queue.Queue(maxsize=0)),
    i.e. the worker decodes the whole epoch ahead — refuse at init."""
    ds = [(np.zeros((2, 4, 4, 3), np.float32), 0)] * 4
    with pytest.raises(ValueError, match="prefetch"):
        loader.Loader(ds, batch_size=2, prefetch=0)


def test_abandoned_epoch_does_not_leak_worker(tmp_path):
    """Closing the epoch generator early must unblock and join the
    prefetch worker (it used to stay parked in q.put forever)."""
    import threading

    ds = [(np.zeros((2, 4, 4, 3), np.float32), 0)] * 16
    ld = loader.Loader(ds, batch_size=2, prefetch=1, num_threads=1)
    before = set(threading.enumerate())
    it = ld.epoch(0)
    next(it)          # worker running, queue full
    it.close()        # generator finally: stop + drain + join
    leaked = [t for t in threading.enumerate()
              if t not in before and t.is_alive()]
    assert not leaked


def test_grayscale_video_decode_shape(tmp_path):
    """An L-mode animated GIF decodes to (T, H, W) — it must become a
    (T, H, W, 3) clip, not a garbage single 'frame' sliced on width."""
    pytest.importorskip("imageio")
    from PIL import Image

    p = str(tmp_path / "gray.gif")
    ims = [Image.fromarray((np.full((8, 8), v)).astype(np.uint8), "L")
           for v in (0, 80, 160, 240)]
    ims[0].save(p, save_all=True, append_images=ims[1:], duration=40, loop=0)
    arr = frames._READ_VIDEO(p)
    assert arr.shape == (4, 8, 8, 3), arr.shape
    # all three channels replicate the gray values
    assert np.array_equal(arr[..., 0], arr[..., 1])


def test_frechet_requires_two_rows():
    from dvdgan_tpu.eval import frechet
    with pytest.raises(ValueError, match=">= 2"):
        frechet.statistics(np.ones((1, 4)))


def test_la_image_decode_drops_alpha(tmp_path):
    """A 2-channel LA-mode image must decode as ONE frame with alpha
    dropped — not be misread as an H-frame grayscale 'video' of width 2
    (review finding)."""
    pytest.importorskip("imageio")
    from PIL import Image

    p = str(tmp_path / "la.png")
    la = np.zeros((8, 6, 2), np.uint8)
    la[..., 0] = (np.arange(6, dtype=np.uint8) * 40)[None, :]  # ramp
    la[..., 1] = 255
    Image.fromarray(la, "LA").save(p)
    arr = frames._READ_VIDEO(p)
    assert arr.shape == (1, 8, 6, 3), arr.shape
    assert np.array_equal(arr[0, ..., 0], la[..., 0])


def test_npy_range_explicit_convention(tmp_path):
    """Float .npy value convention is a DATASET property: auto-detection
    misreads an all-non-negative [-1,1] clip as [0,1]; npy_range pins it
    (review finding)."""
    clip = np.full((4, 8, 8, 3), 0.5, np.float32)   # ambiguous range
    root = tmp_path / "d" / "cls"
    root.mkdir(parents=True)
    np.save(str(root / "v.npy"), clip)
    path = str(root / "v.npy")
    auto = frames._load_frames_u8(path)
    unit = frames._load_frames_u8(path, "unit")
    sym = frames._load_frames_u8(path, "symmetric")
    assert auto[0, 0, 0, 0] == unit[0, 0, 0, 0] == 128   # 0.5 -> 128
    assert sym[0, 0, 0, 0] == 191                        # (0.5+1)/2 -> 191
    ds = frames.FrameFolderDataset(str(tmp_path / "d"), 2, 8,
                                   npy_range="symmetric")
    c, _ = ds[0]
    assert c.shape == (2, 8, 8, 3)
    with pytest.raises(ValueError, match="npy_range"):
        frames.FrameFolderDataset(str(tmp_path / "d"), 2, 8,
                                  npy_range="sym")


def test_loader_rows_slices_global_batches():
    """Loader(rows=(a,b)) yields exactly rows a:b of every GLOBAL batch:
    two half-row loaders concatenate to the full loader's stream, across
    epochs and with within-epoch resume (the multi-host input contract —
    the shuffle is a pure function of (seed, epoch), so hosts agree on
    the layout while decoding disjoint rows)."""
    import numpy as np

    from dvdgan_tpu.data import Loader, SyntheticVideoDataset

    ds = SyntheticVideoDataset(n_items=12, n_frames=2, img_size=8,
                               n_classes=3, seed=0)
    full = Loader(ds, 4, seed=7, num_threads=1)
    lo = Loader(ds, 4, seed=7, num_threads=1, rows=(0, 2))
    hi = Loader(ds, 4, seed=7, num_threads=1, rows=(2, 4))
    for epoch in (0, 1):
        for (cf, yf), (ca, ya), (cb, yb) in zip(
                full.epoch(epoch), lo.epoch(epoch), hi.epoch(epoch)):
            assert ca.shape[0] == 2 and cb.shape[0] == 2
            assert np.array_equal(cf, np.concatenate([ca, cb]))
            assert np.array_equal(yf, np.concatenate([ya, yb]))
    # within-epoch resume keeps the same row slicing
    (cf, yf), (ca, ya) = (next(full.forever(start_epoch=1, start_batch=2)),
                          next(lo.forever(start_epoch=1, start_batch=2)))
    assert np.array_equal(cf[:2], ca) and np.array_equal(yf[:2], ya)


def test_loader_rows_validation():
    import pytest

    from dvdgan_tpu.data import Loader, SyntheticVideoDataset

    ds = SyntheticVideoDataset(n_items=8, n_frames=2, img_size=8,
                               n_classes=2, seed=0)
    with pytest.raises(ValueError, match="rows"):
        Loader(ds, 4, rows=(2, 6))
    with pytest.raises(ValueError, match="rows"):
        Loader(ds, 4, rows=(3, 3))


def test_loader_rows_requires_drop_last():
    """rows= with drop_last=False would yield short/empty per-host slices
    on the final batch (multi-host shape desync) — refused loudly."""
    import pytest

    from dvdgan_tpu.data import Loader, SyntheticVideoDataset

    ds = SyntheticVideoDataset(n_items=6, n_frames=2, img_size=8,
                               n_classes=2, seed=0)
    with pytest.raises(ValueError, match="drop_last"):
        Loader(ds, 4, drop_last=False, rows=(0, 2))
