"""Config / CLI (SURVEY.md §2.13, §5.6).

Flag names mirror the reference's argparse surface for API parity
(`--batch_size, --n_frames, --img_size, --z_dim, --lr_g, --lr_d, --d_steps,
--total_step, --log_step, --sample_step, --model_save_step,
--pretrained_model, --dataset, --data_path, --seed`, [R main.py]/[R
utils.py]) plus TPU-era additions (--ch, --bf16, --n_devices, --profile).
Presets named after BASELINE.json's five configs.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

from dvdgan_tpu.models import DSConfig, DTConfig, GConfig
from dvdgan_tpu.train.state import TrainConfig


@dataclasses.dataclass
class Config:
    # mode
    mode: str = "train"               # train | sample | eval
    n_samples: int = 16               # clips to generate in sample mode
    i3d_weights: str = ""             # converted I3D npz for published FVD
    #                                   (tools/convert_i3d_weights.py);
    #                                   empty = random-init extractor,
    #                                   labeled non-comparable in the output
    inception_weights: str = ""       # converted Inception-v3 npz for
    #                                   published frame-FID
    #                                   (tools/convert_inception_weights.py)
    c3d_weights: str = ""             # converted C3D npz for published
    #                                   UCF-101 IS (tools/convert_c3d_weights.py)
    is_protocol: str = "i3d"          # video-IS classifier: i3d (Kinetics,
    #                                   400-way) | c3d (UCF-101, 101-way)
    real_stats: str = ""              # --mode eval: npz of precomputed
    #                                   real-side features (standard FID
    #                                   practice); missing file = compute
    #                                   once and save there
    # data
    dataset: str = "synthetic"        # synthetic | frames
    data_path: str = ""
    npy_range: str = "auto"           # float-.npy value convention:
    #                                   auto | unit ([0,1]) | symmetric
    #                                   ([-1,1]); per-dataset, not per-file
    loader_threads: int = 2           # decode thread-pool width (the decode
    #                                   path releases the GIL; raise for
    #                                   256px/48f where clip assembly is the
    #                                   bottleneck — tools/bench_loader.py
    #                                   measures decode clips/s vs demand)
    prefetch: int = 2                 # ready-batch queue depth ahead of the
    #                                   device (hides host decode latency)
    n_classes: int = 101
    # model
    img_size: int = 64
    n_frames: int = 16                # clip length loaded from data; with
    #                                   cond_frames > 0, G generates
    #                                   n_frames - cond_frames of them
    cond_frames: int = 0              # DVD-GAN-FP: real prefix length
    z_dim: int = 120
    ch: int = 32
    d_ch: int = 32
    emb_dim: int = 120
    attn_res: int = 32
    k_frames: int = 8
    # optimization
    batch_size: int = 32
    lr_g: float = 1e-4
    lr_d: float = 5e-4
    beta1: float = 0.0
    beta2: float = 0.999
    d_steps: int = 2
    grad_accum: int = 1               # micro-batches per update (preset 4)
    fake_gen: str = "pooled"          # pooled | per_step (BN stats; A/B'd)
    log_grad_norms: bool = False      # g/d_grad_norm scalars in metrics
    log_sigmas: bool = False          # per-kernel SN σ + attention γ
    #                                   scalars at sample_step cadence
    ema_decay: float = 0.9999
    ema_start: int = 1000
    total_step: int = 100000
    steps_per_call: int = 1           # chunked stepping: lax.scan K train
    #                                   steps per dispatch (amortizes the
    #                                   per-execute overhead; semantics ==
    #                                   K single steps, tested). Schedule
    #                                   flags must be multiples of K.
    # schedule
    log_step: int = 10
    sample_step: int = 500
    model_save_step: int = 1000
    keep_checkpoints: int = 0         # >0: retain only the newest N
    #                                   checkpoints (0 = keep all, the
    #                                   reference behavior)
    async_save: bool = True           # write checkpoints on a background
    #                                   thread (device→host snapshot stays
    #                                   on the train thread — the step
    #                                   donates its state buffers)
    eval_step: int = 0                # >0: periodic in-training FVD/IS —
    #                                   evaluate_generator on eval_samples
    #                                   EMA-G samples, logged to scalars
    eval_samples: int = 64
    eval_repeats: int = 1             # --mode eval: N independent fake
    #                                   sample sets (shared real side) ->
    #                                   fvd/fid mean ± std in the JSON
    pretrained_model: Optional[int] = None   # resume from this step
    # runtime
    n_devices: int = 0           # >0: use only the first N visible devices
    #                              (cap the DP width, e.g. scaling studies
    #                              on a pod slice); 0 = all
    seed: int = 0
    bf16: bool = True
    out_dir: str = "runs/default"
    profile: bool = False        # jax.profiler trace of steps 10..15
    nan_check: bool = False      # jax_debug_nans for the whole run
    remat: bool = False          # rematerialize G levels (long-clip configs)
    multihost: bool = False      # jax.distributed.initialize() at startup
    time_shards: int = 1         # >1: (data × time) mesh, DT context-
    #                              parallel over the clip (SURVEY §5.7)

    # ---- derived model configs ------------------------------------------
    def g_config(self) -> GConfig:
        attn = self.attn_res if self.attn_res <= self.img_size // 2 else None
        return GConfig(img_size=self.img_size,
                       n_frames=self.n_frames - self.cond_frames,
                       ch=self.ch, z_dim=self.z_dim,
                       n_classes=self.n_classes, emb_dim=self.emb_dim,
                       attn_res=attn, remat=self.remat,
                       cond_frames=self.cond_frames)

    def ds_config(self) -> DSConfig:
        return DSConfig(img_size=self.img_size, ch=self.d_ch,
                        n_classes=self.n_classes,
                        k_frames=min(self.k_frames,
                                     self.n_frames - self.cond_frames))

    def dt_config(self) -> DTConfig:
        return DTConfig(img_size=self.img_size, n_frames=self.n_frames,
                        ch=self.d_ch, n_classes=self.n_classes)

    def train_config(self) -> TrainConfig:
        return TrainConfig(lr_g=self.lr_g, lr_d=self.lr_d, beta1=self.beta1,
                           beta2=self.beta2, d_steps=self.d_steps,
                           ema_decay=self.ema_decay,
                           ema_start=self.ema_start,
                           batch_size=self.batch_size,
                           grad_accum=self.grad_accum,
                           fake_gen=self.fake_gen,
                           log_grad_norms=self.log_grad_norms)


# The five driver configs (BASELINE.json .configs), as named presets.
PRESETS: dict[str, dict] = {
    # 0: CPU smoke — one G+D step + sample
    "smoke": dict(dataset="synthetic", img_size=64, n_frames=8, ch=16,
                  d_ch=16, batch_size=4, n_classes=10, d_steps=1,
                  total_step=1, attn_res=32, k_frames=4, ema_start=0),
    # 1: UCF-101 64×64×16 full DVD-GAN
    "ucf101_64": dict(dataset="frames", img_size=64, n_frames=16,
                      n_classes=101, batch_size=32, attn_res=32),
    # 2: Kinetics-600 class-conditional 64×64×12
    "kinetics_64": dict(dataset="frames", img_size=64, n_frames=12,
                        n_classes=600, batch_size=32, attn_res=32),
    # 3: Kinetics-600 128×128×12, attention at 32×32, DP on v5e-8
    "kinetics_128": dict(dataset="frames", img_size=128, n_frames=12,
                         n_classes=600, batch_size=64, attn_res=32),
    # 4: Kinetics-600 256×256 / 48-frame long-clip, pod-scale DP.
    # z_dim=112: 256px has 6 upsampling levels → 7 hierarchical-latent
    # chunks, and 112 = 7·16 (120 is not divisible by 7).
    "kinetics_256_48f": dict(dataset="frames", img_size=256, n_frames=48,
                             n_classes=600, batch_size=512, attn_res=32,
                             remat=True, z_dim=112),
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "dvdgan_tpu",
        description="TPU-native DVD-GAN trainer (reference CLI parity)")
    p.add_argument("--preset", choices=sorted(PRESETS), default=None)
    for f in dataclasses.fields(Config):
        arg = f"--{f.name}"
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(arg, type=lambda s: s.lower() in ("1", "true", "t"),
                           default=None)
        elif f.name == "pretrained_model":
            p.add_argument(arg, type=int, default=None)
        else:
            typ = {int: int, float: float, str: str}.get(type(f.default), str)
            p.add_argument(arg, type=typ, default=None)
    return p


def config_from_args(args: argparse.Namespace) -> Config:
    """Build a Config from a parsed namespace (preset base + explicit
    overrides). Extra attributes on the namespace (tool-specific flags
    added to build_parser()'s parser) are ignored."""
    base: dict = {}
    if args.preset:
        base.update(PRESETS[args.preset])
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name)
        if v is not None:
            base[f.name] = v
    return Config(**base)


def parse_config(argv=None) -> Config:
    return config_from_args(build_parser().parse_args(argv))
