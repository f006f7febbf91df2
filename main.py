"""CLI entry point (SURVEY.md §2.13, §3.1): `python main.py --flags...`.

Reference parity: same flag surface as [R main.py] (see
dvdgan_tpu/utils/config.py) plus `--preset` for the five BASELINE configs,
e.g. `python main.py --preset smoke`.

Modes:
  --mode train   (default) run the training loop, auto-resuming from the
                 latest checkpoint under --out_dir (or --pretrained_model N)
  --mode sample  load the checkpoint and dump --n_samples EMA-G clips as
                 GIFs + a grid PNG (the reference's test/sample entry,
                 SURVEY §3.4)
  --mode eval    FVD + video-IS + frame-FID of EMA-G samples vs the dataset
                 (SURVEY §2.17). FVD/IS use the genuine I3D topology
                 (eval/i3d.py): pass --i3d_weights <npz> (from
                 tools/convert_i3d_weights.py) for published-comparable
                 numbers (IS = softmax of the Kinetics-400 logits).
                 Frame-FID uses real Inception-v3 (eval/inception.py):
                 pass --inception_weights <npz> (from
                 tools/convert_inception_weights.py). For the UCF-101 IS
                 protocol pass --is_protocol c3d --c3d_weights <npz>
                 (real C3D, tools/convert_c3d_weights.py). Without weights
                 the extractors run at a fixed random init and the output
                 JSON carries *_published_comparable: false.
"""

from __future__ import annotations

import os

import jax

from dvdgan_tpu.train.trainer import Trainer
from dvdgan_tpu.utils.cache import enable_persistent_compilation_cache
from dvdgan_tpu.utils.config import parse_config


def main(argv=None):
    cfg = parse_config(argv)
    enable_persistent_compilation_cache()
    if cfg.multihost:
        # pod-scale DP (SURVEY §5.8): one process per host; the mesh then
        # spans all hosts' devices and XLA routes ICI within a slice and
        # DCN across slices
        jax.distributed.initialize()
    print(f"devices: {jax.devices()}")
    print(cfg)
    trainer = Trainer(cfg)
    try:
        if cfg.mode == "sample":
            import numpy as np
            from dvdgan_tpu.utils.media import (save_batch_gifs,
                                                save_video_grid_png)
            key = jax.random.PRNGKey(cfg.seed + 777)
            kz, ky = jax.random.split(key)
            z = jax.random.normal(kz, (cfg.n_samples, cfg.z_dim))
            y = jax.random.randint(ky, (cfg.n_samples,), 0, cfg.n_classes)
            cond = None
            if cfg.cond_frames > 0:   # FP: condition on real prefixes
                ds = trainer.dataset
                cond = np.stack(
                    [np.asarray(ds[i % len(ds)][0][:cfg.cond_frames],
                                np.float32) for i in range(cfg.n_samples)])
            videos = np.asarray(
                jax.device_get(trainer.sample(z, y, cond=cond)), np.float32)
            if trainer.is_main:   # multihost: one writer (see Trainer)
                out = os.path.join(cfg.out_dir, "samples")
                step = trainer.start_step
                save_video_grid_png(
                    os.path.join(out, f"eval_{step}_grid.png"), videos)
                save_batch_gifs(out, videos, step, max_n=cfg.n_samples)
                print(f"wrote {cfg.n_samples} samples to {out}")
        elif cfg.mode == "eval":
            import json
            from dvdgan_tpu.eval import (C3DClassifierProbs,
                                         I3DClassifierProbs, I3DFeatures,
                                         InceptionFeatures,
                                         evaluate_generator)
            fx = I3DFeatures(weights_npz=cfg.i3d_weights or None, seed=0)
            fx2d = InceptionFeatures(
                weights_npz=cfg.inception_weights or None, seed=0)
            if cfg.is_protocol == "c3d":
                # published UCF-101 IS = softmax of C3D UCF-101 logits
                clf = C3DClassifierProbs(
                    weights_npz=cfg.c3d_weights or None, seed=0)
            else:
                # published Kinetics IS = softmax of I3D K-400 logits;
                # shares params with fx so no second I3D lives on-device
                clf = I3DClassifierProbs(feature_extractor=fx)
            # one source of truth for the identity tags: they key BOTH the
            # real-stats cache invalidation and the output JSON labels
            fx_tag = ("i3d-kinetics400" if fx.pretrained
                      else "i3d-random-init")
            fx2d_tag = ("inception-v3" if fx2d.pretrained
                        else "inception-v3-random-init")
            real_features = None
            if cfg.real_stats:
                from dvdgan_tpu.eval import (file_stamp,
                                             load_or_compute_real_stats)
                n = min(cfg.n_samples, len(trainer.dataset))
                meta = {
                    "dataset": cfg.dataset, "data_path": cfg.data_path,
                    "npy_range": cfg.npy_range,
                    # seed: both dataset flavors draw clip content /
                    # window sampling from it — different seed, different
                    # real distribution
                    "seed": cfg.seed, "n_classes": cfg.n_classes,
                    "img_size": cfg.img_size, "n_frames": cfg.n_frames,
                    "n": n,
                    "extractor": fx_tag,
                    # weight-FILE identity too: a reconverted/replaced npz
                    # is a different feature space with the same tag
                    "extractor_weights": file_stamp(cfg.i3d_weights),
                    "frame_extractor": fx2d_tag,
                    "frame_extractor_weights": file_stamp(
                        cfg.inception_weights),
                }
                real_features = load_or_compute_real_stats(
                    cfg.real_stats, trainer.dataset, fx, n,
                    batch_size=min(cfg.batch_size, n),
                    frame_extractor=fx2d, meta=meta,
                    write=trainer.is_main)
                if trainer.is_main:
                    print(f"real stats: {cfg.real_stats}")
            repeats = max(1, cfg.eval_repeats)
            if real_features is None and repeats > 1:
                # repeats must share ONE real side (it is identical by
                # construction; recomputing would just burn decodes)
                from dvdgan_tpu.eval import compute_real_features
                n = min(cfg.n_samples, len(trainer.dataset))
                real_features = compute_real_features(
                    trainer.dataset, fx, n,
                    batch_size=min(cfg.batch_size, n),
                    frame_extractor=fx2d)
            runs = [evaluate_generator(trainer, fx,
                                       n_samples=cfg.n_samples,
                                       classifier=clf,
                                       frame_extractor=fx2d,
                                       real_features=real_features,
                                       sample_seed=1234 + 1000 * r)
                    for r in range(repeats)]
            out = dict(runs[0])
            if repeats > 1:
                import numpy as np
                for k in ("fvd", "fid", "is_mean"):
                    if k in runs[0]:
                        vals = [r[k] for r in runs]
                        out[k] = float(np.mean(vals))
                        out[k + "_std"] = float(np.std(vals))
                out["eval_repeats"] = repeats
            out["extractor"] = fx_tag
            out["fvd_published_comparable"] = fx.pretrained
            out["is_classifier"] = (
                ("c3d-ucf101" if clf.pretrained else "c3d-random-init")
                if cfg.is_protocol == "c3d" else
                ("i3d-kinetics400" if clf.pretrained else "i3d-random-init"))
            out["is_published_comparable"] = clf.pretrained
            out["frame_extractor"] = fx2d_tag
            out["fid_published_comparable"] = fx2d.pretrained
            if trainer.is_main:   # every process computed the same value
                print(json.dumps(out))
        else:
            metrics = trainer.train()
            if trainer.is_main:
                print("final:", metrics)
            trainer.dump_samples(step=cfg.total_step)
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
