"""Extract frames from video files into the UCF-101-style layout
`FrameFolderDataset` reads (SURVEY.md §2.12): one `.npy` uint8 clip per
video under `out_root/<class_name>/<video_name>.npy`.

Usage:
    python tools/extract_frames.py /data/UCF-101 /data/ucf101_frames \
        --size 96 --stride 1

Input layout: `src_root/<class_name>/*.avi|mp4|...`. Decoding goes through
imageio (which needs an ffmpeg backend for most codecs); if no video plugin
is available the script says so and exits — this sandbox has no codecs, so
the converter is meant to run wherever the raw dataset lives.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

_VIDEO_EXT = (".avi", ".mp4", ".mov", ".mkv", ".webm")


def extract_video(path: str, size: int | None, stride: int) -> np.ndarray:
    import imageio
    reader = imageio.get_reader(path)
    frames = []
    for i, frame in enumerate(reader):
        if i % stride:
            continue
        f = np.asarray(frame, np.uint8)
        if f.ndim == 2:
            f = np.stack([f] * 3, axis=-1)
        if size is not None:
            h, w = f.shape[:2]
            s = min(h, w)
            y0, x0 = (h - s) // 2, (w - s) // 2
            f = f[y0:y0 + s, x0:x0 + s]
            idx = np.minimum((np.arange(size) * s) // size, s - 1)
            f = f[idx][:, idx]
        frames.append(f)
    reader.close()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src_root")
    p.add_argument("out_root")
    p.add_argument("--size", type=int, default=None,
                   help="center-crop + resize frames to this square size "
                        "(default: keep original)")
    p.add_argument("--stride", type=int, default=1,
                   help="keep every Nth frame")
    args = p.parse_args()

    try:
        import imageio  # noqa: F401
    except ImportError:
        raise SystemExit("imageio (with an ffmpeg plugin) is required")

    n = 0
    for cname in sorted(os.listdir(args.src_root)):
        cdir = os.path.join(args.src_root, cname)
        if not os.path.isdir(cdir):
            continue
        odir = os.path.join(args.out_root, cname)
        os.makedirs(odir, exist_ok=True)
        for v in sorted(os.listdir(cdir)):
            if not v.lower().endswith(_VIDEO_EXT):
                continue
            out = os.path.join(odir, os.path.splitext(v)[0] + ".npy")
            if os.path.exists(out):
                continue
            try:
                clip = extract_video(os.path.join(cdir, v), args.size,
                                     args.stride)
            except Exception as e:
                print(f"SKIP {cname}/{v}: {e}")
                continue
            np.save(out, clip)
            n += 1
            if n % 100 == 0:
                print(f"{n} videos extracted...")
    print(f"done: {n} videos -> {args.out_root}")


if __name__ == "__main__":
    main()
