"""Host input-pipeline throughput: decode clips/s vs device demand.

The thread-pool Loader and the C++ clip kernel (`native/clipops.cpp`) exist
for the 256px/48f long-clip config (SURVEY §2.12/§3.1), where per-clip
assembly (decode + window + resize + normalize) is the host-side cost that
must stay ahead of the device. This tool measures the Loader's sustained
clips/s on a synthetic on-disk fixture at any shape and compares it against
the device demand (steps/s × batch/chip), printing a PASS/FAIL margin —
the number VERDICT r2 flagged as existing only as code.

    python tools/bench_loader.py --img_size 256 --n_frames 48 --batch 8 \
        --threads 1,2,4,8 --demand_steps 2.39

Fixture: uint8 .npy clips (no codec backends in the sandbox; the video
path plugs in where ffmpeg/pyav exist) at a source resolution ABOVE
img_size so the resize actually works, or --source framedir for the
PIL-per-frame path. One JSON line per swept thread count.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dvdgan_tpu.data import FrameFolderDataset, Loader  # noqa: E402


def write_fixture(root: str, n_videos: int, src_frames: int, src_size: int,
                  source: str) -> None:
    rng = np.random.RandomState(0)
    for v in range(n_videos):
        cdir = os.path.join(root, f"class{v % 4}")
        os.makedirs(cdir, exist_ok=True)
        arr = rng.randint(0, 256, (src_frames, src_size, src_size, 3),
                          dtype=np.uint8)
        if source == "npy":
            np.save(os.path.join(cdir, f"vid{v}.npy"), arr)
        else:                       # framedir: one image file per frame
            from PIL import Image
            vdir = os.path.join(cdir, f"vid{v}")
            os.makedirs(vdir, exist_ok=True)
            for t in range(src_frames):
                Image.fromarray(arr[t]).save(
                    os.path.join(vdir, f"f{t:04d}.jpg"), quality=90)


def measure(ds, batch: int, threads: int, prefetch: int,
            n_batches: int) -> float:
    """Sustained clips/s assembling `n_batches` directly (thread-pool map
    + stack), after one warm-up batch (pool spin-up, page cache).

    Times `_make_batch` rather than pulls from the prefetch iterator: the
    prefetch worker produces at exactly this rate, but timing the iterator
    overstates it by up to (prefetch+1)/n_batches — batches decoded before
    t0 return instantly and flip keeps_up near margin 1.0."""
    ld = Loader(ds, batch, num_threads=threads, prefetch=prefetch, seed=0)
    try:
        idx = ld._epoch_indices(0)
        bs = [idx[i:i + batch] for i in range(0, len(idx), batch)]
        if not bs:
            raise ValueError(f"dataset of {len(ds)} items yields zero "
                             f"batches at batch_size={batch}")
        ld._make_batch(bs[0])                   # warm-up
        t0 = time.perf_counter()
        for k in range(n_batches):
            ld._make_batch(bs[k % len(bs)])
        dt = time.perf_counter() - t0
    finally:
        ld.close()
    return n_batches * batch / dt


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--n_frames", type=int, default=48)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--threads", default="1,2,4,8",
                   help="comma list of loader thread counts to sweep")
    p.add_argument("--prefetch", type=int, default=2)
    p.add_argument("--batches", type=int, default=6,
                   help="timed batches per sweep point")
    p.add_argument("--n_videos", type=int, default=16)
    p.add_argument("--src_size", type=int, default=0,
                   help="fixture source resolution (0 = img_size+32)")
    p.add_argument("--src_frames", type=int, default=0,
                   help="fixture source clip length (0 = n_frames+16)")
    p.add_argument("--source", choices=("npy", "framedir"), default="npy")
    p.add_argument("--data_path", default="",
                   help="measure a real dataset instead of a fixture")
    p.add_argument("--demand_steps", type=float, default=0.0,
                   help="device steps/s to compare against (demand = "
                        "steps/s × batch); 0 = report throughput only")
    args = p.parse_args(argv)

    src_size = args.src_size or args.img_size + 32
    src_frames = args.src_frames or args.n_frames + 16
    tmp = None
    root = args.data_path
    if not root:
        tmp = tempfile.mkdtemp(prefix="dvdgan_loaderbench_")
        write_fixture(tmp, args.n_videos, src_frames, src_size, args.source)
        root = tmp
    try:
        ds = FrameFolderDataset(root, n_frames=args.n_frames,
                                img_size=args.img_size)
        demand = args.demand_steps * args.batch
        ok = True
        for threads in (int(t) for t in args.threads.split(",")):
            cps = measure(ds, args.batch, threads, args.prefetch,
                          args.batches)
            line = {
                "metric": "loader_clips_per_sec",
                "value": round(cps, 3),
                "img_size": args.img_size, "n_frames": args.n_frames,
                "batch": args.batch, "threads": threads,
                "prefetch": args.prefetch, "source": args.source,
                "native_clipops": _native_built(),
            }
            if demand > 0:
                line["demand_clips_per_sec"] = round(demand, 3)
                line["margin"] = round(cps / demand, 3)
                line["keeps_up"] = cps >= demand
                ok = ok and cps >= demand
            print(json.dumps(line), flush=True)
        if demand > 0 and not ok:
            print("WARNING: decode slower than device demand at one or "
                  "more thread counts — raise --loader_threads/--prefetch "
                  "or pre-extract at target resolution", file=sys.stderr)
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)


def _native_built() -> bool:
    from dvdgan_tpu import native
    return native.available()


if __name__ == "__main__":
    main()
