"""On-disk video dataset: UCF-101-style extracted-frame directories.

Behavioral spec (SURVEY.md §2.12, [R dataset.py]): walk
`root/<class_name>/<video_name>/` directories of frame images (or `.npy`
clip files), uniformly sample a T-frame window, center-crop to square,
resize to `img_size`, scale to [-1, 1]; yield (clip (T,H,W,3) float32,
int label). Class names map to labels in sorted order (the torchvision
ImageFolder convention the reference relies on).

Decode is PIL-based (available without network); `.npy` clips — shape
(T0, H, W, 3) uint8 or float — are supported for fixtures so tests never
need image codecs.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from dvdgan_tpu import native

_IMG_EXT = (".jpg", ".jpeg", ".png", ".bmp")
_VIDEO_EXT = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".gif")


# Container formats that need an actual codec backend (ffmpeg/pyav) —
# imageio importing is NOT enough: without one of these plugins
# iio.imread raises "could not find a backend" at decode time. GIFs
# decode through the always-present Pillow plugin.
_CONTAINER_EXT = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def _has_codec_backend() -> bool:
    import importlib.util
    return any(importlib.util.find_spec(m) is not None
               for m in ("imageio_ffmpeg", "av"))


def _video_reader():
    """Plugin-detect an in-pipeline video decoder (SURVEY §2.12: the
    reference loads 'frame dirs or video files'). Returns a
    `path -> (T, H, W, 3) uint8` callable or None when no codec-capable
    backend exists (this sandbox), in which case raw videos must go
    through the offline tools/extract_frames.py pass."""
    try:
        import imageio.v3 as iio

        def read(path):
            arr = np.asarray(iio.imread(path, plugin=None))
            if arr.ndim == 2:                   # single grayscale frame
                arr = arr[None, ..., None]
            elif arr.ndim == 3:
                if arr.shape[-1] in (2, 3, 4):  # single LA/RGB/RGBA frame
                    # (a genuine grayscale video of frame-width 2-4 would
                    # be misread here — vanishingly unlikely vs LA images)
                    arr = arr[None]
                else:                           # grayscale video (T, H, W)
                    arr = arr[..., None]
            elif arr.ndim != 4:
                raise ValueError(
                    f"undecodable array rank {arr.ndim} from {path}")
            if arr.shape[-1] == 2:              # LA-mode: drop alpha
                arr = arr[..., :1]
            if arr.shape[-1] == 1:              # L-mode: replicate to RGB
                arr = np.repeat(arr, 3, axis=-1)
            elif arr.shape[-1] == 4:            # RGBA gifs
                arr = arr[..., :3]
            elif arr.shape[-1] != 3:
                raise ValueError(
                    f"unsupported channel count {arr.shape[-1]} in {path}")
            return np.ascontiguousarray(arr.astype(np.uint8))
        return read
    except Exception:
        return None


_READ_VIDEO = _video_reader()
_CODEC_OK = _has_codec_backend()


def _decodable(path: str) -> bool:
    """True when in-pipeline decode will actually work for this file —
    container formats need ffmpeg/pyav, not just imageio itself."""
    if _READ_VIDEO is None:
        return False
    if path.lower().endswith(_CONTAINER_EXT):
        return _CODEC_OK
    return True                               # .gif via the Pillow plugin


def _list_videos(root: str) -> Tuple[List[Tuple[str, int]], List[str]]:
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    items: List[Tuple[str, int]] = []
    skipped_raw = 0
    for li, cname in enumerate(classes):
        cdir = os.path.join(root, cname)
        for v in sorted(os.listdir(cdir)):
            path = os.path.join(cdir, v)
            if os.path.isdir(path) or v.endswith(".npy"):
                items.append((path, li))
            elif v.lower().endswith(_VIDEO_EXT):
                if _decodable(path):
                    items.append((path, li))
                else:
                    skipped_raw += 1
    if skipped_raw:
        import warnings
        warnings.warn(
            f"{skipped_raw} raw video files skipped: no decode backend "
            "(install imageio+ffmpeg, or pre-extract with "
            "tools/extract_frames.py)")
    return items, classes


def _load_frames_u8(path: str, npy_range: str = "auto") -> np.ndarray:
    """-> (T0, H, W, 3) uint8.

    `npy_range` fixes the value convention of FLOAT .npy clips for the
    whole dataset: "unit" = [0,1], "symmetric" = [-1,1] (the framework's
    own output convention), "auto" = per-file detection by the presence of
    negative values. Auto misreads an all-non-negative [-1,1] clip as
    [0,1] — datasets with a known convention should say so explicitly."""
    if path.endswith(".npy"):
        arr = np.load(path)
        if arr.dtype != np.uint8:
            a = arr.astype(np.float32)
            if npy_range == "symmetric" or (npy_range == "auto"
                                            and a.min() < 0.0):
                a = (a + 1.0) * 0.5
            arr = (np.clip(a, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        return arr
    if path.lower().endswith(_VIDEO_EXT):
        if not _decodable(path):
            raise RuntimeError(f"no video decode backend for {path}")
        return _READ_VIDEO(path)
    return _decode_frames(path, _list_frame_files(path))


def _list_frame_files(path: str) -> list:
    frames = sorted(f for f in os.listdir(path)
                    if f.lower().endswith(_IMG_EXT))
    if not frames:
        raise ValueError(f"no frames in {path}")
    return frames


def _decode_frames(path: str, names: list) -> np.ndarray:
    from PIL import Image
    out = []
    for f in names:
        with Image.open(os.path.join(path, f)) as im:
            out.append(np.asarray(im.convert("RGB"), np.uint8))
    return np.stack(out)


class FrameFolderDataset:
    """Map-style dataset over extracted-frame dirs / .npy clips."""

    def __init__(self, root: str, n_frames: int, img_size: int,
                 seed: int = 0, npy_range: str = "auto"):
        if npy_range not in ("auto", "unit", "symmetric"):
            raise ValueError(f"npy_range {npy_range!r}: must be auto | "
                             "unit | symmetric")
        self.items, self.classes = _list_videos(root)
        if not self.items:
            raise ValueError(f"no videos under {root}")
        self.n_frames = n_frames
        self.img_size = img_size
        self.seed = seed
        self.npy_range = npy_range
        self._epoch = 0

    @property
    def n_classes(self) -> int:
        return len(self.classes)

    def __len__(self) -> int:
        return len(self.items)

    def set_epoch(self, epoch: int) -> None:
        """Advance the augmentation stream (Loader calls this each epoch).
        Window sampling is a PURE function of (seed, epoch, idx): exact
        mid-epoch resume (skipping items replays nothing stateful) and
        thread-safe decode (no shared RNG) both depend on this."""
        self._epoch = int(epoch)

    def __getitem__(self, idx: int):
        path, label = self.items[idx]
        t = self.n_frames
        # window start (short clips wrap modulo T0 — loop padding), drawn
        # from a per-(seed, epoch, idx) stream — see set_epoch
        # mask to 31 bits in PYTHON ints before RandomState sees it:
        # np.uint32(big) raises OverflowError under NumPy >= 2 (any
        # seed >= 4295 used to crash the first __getitem__)
        rng = np.random.RandomState(
            (self.seed * 1000003 + self._epoch * 9973
             + idx * 101 + 17) & 0x7FFFFFFF)
        if os.path.isdir(path):
            # frame directories: the window start depends only on the
            # FRAME COUNT, so decode ONLY the sampled window — a UCF-101
            # video is ~10× longer than a 16-frame window, and full-dir
            # decode was the measured 256px/48f input bottleneck
            # (tools/bench_loader.py: 6.3 clips/s vs 19.1 demand on one
            # host core). Same pixels, same RNG stream as full decode
            # (equivalence-tested).
            names = _list_frame_files(path)
            t0 = len(names)
            start = rng.randint(0, t0 - t + 1) if t0 >= t else 0
            frames = _decode_frames(path, names[start:start + t])
            clip = native.clip_window(frames, t, self.img_size, 0)
        else:
            frames = _load_frames_u8(path, self.npy_range)
            t0 = frames.shape[0]
            start = rng.randint(0, t0 - t + 1) if t0 >= t else 0
            # fused window+crop+resize+normalize (C++ / numpy fallback)
            clip = native.clip_window(frames, t, self.img_size, start)
        return clip, label
