"""Sample dumps (SURVEY.md §3.4): video grid PNGs + animated GIFs.

Replaces the reference's torchvision.utils.save_image + imageio GIF calls
with PIL-only equivalents (no torch in the save path).
"""

from __future__ import annotations

import os

import numpy as np


def denorm_uint8(video: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8 (×0.5+0.5, the reference's denorm)."""
    v = (np.asarray(video, np.float32) * 0.5 + 0.5).clip(0.0, 1.0)
    return (v * 255.0 + 0.5).astype(np.uint8)


def video_grid(videos: np.ndarray, pad: int = 2) -> np.ndarray:
    """(B, T, H, W, 3) -> (B*H', T*W', 3) grid: one row per sample, one
    column per frame (the layout the reference dumps for eyeballing)."""
    b, t, h, w, c = videos.shape
    out = np.zeros((b * (h + pad) + pad, t * (w + pad) + pad, c),
                   videos.dtype)
    for i in range(b):
        for j in range(t):
            y = pad + i * (h + pad)
            x = pad + j * (w + pad)
            out[y:y + h, x:x + w] = videos[i, j]
    return out


def save_video_grid_png(path: str, videos: np.ndarray) -> None:
    """videos: (B, T, H, W, 3) in [-1, 1]."""
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(video_grid(denorm_uint8(videos))).save(path)


def save_gif(path: str, video: np.ndarray, fps: int = 8) -> None:
    """video: (T, H, W, 3) in [-1, 1] -> animated GIF."""
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = [Image.fromarray(f) for f in denorm_uint8(video)]
    frames[0].save(path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)


def save_batch_gifs(out_dir: str, videos: np.ndarray, step: int,
                    max_n: int = 4, fps: int = 8) -> None:
    for i in range(min(max_n, videos.shape[0])):
        save_gif(os.path.join(out_dir, f"{step}_sample{i}.gif"),
                 videos[i], fps)
