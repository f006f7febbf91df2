"""Model architecture configs.

Mirrors the reference's constructor arguments ([R model/Generator.py] /
[R model/Discriminator.py]: ch width multiplier, n_class, n_frames, image
size, z dim — SURVEY.md §2.6–2.8) as frozen dataclasses whose derived
topology (level count, channel schedule) is computed once in Python, so every
shape inside jit is static.

Channel schedules follow the BigGAN convention the paper inherits:
G starts at 4×4 with `ch * mults[0]` channels and halves width as it doubles
resolution; D mirrors it. The schedules per image size are the BigGAN-deep-
free ones used for 64/128/256 rasters.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

# width multiplier schedule per output resolution: resolution -> (G mults
# from 4x4 up, D mults from full res down). G mults has one entry per
# feature resolution 4,8,...,S ; blocks consume (m[i] -> m[i+1]).
_G_MULTS = {
    32: (4, 4, 4, 4),
    64: (8, 8, 4, 2, 1),
    128: (16, 16, 8, 4, 2, 1),
    256: (16, 16, 8, 8, 4, 2, 1),
}
# D mults: channel multiplier after each downsampling block, starting from
# the from-RGB block's output; final entry is the non-downsampling block.
_D_MULTS = {
    16: (2, 2, 2),
    32: (2, 2, 2, 2),
    64: (1, 2, 4, 8, 16),
    128: (1, 2, 4, 8, 16, 16),
    256: (1, 2, 4, 8, 8, 16, 16),
}


@dataclasses.dataclass(frozen=True)
class GConfig:
    """Generator topology (SURVEY.md §2.6)."""
    img_size: int = 64
    n_frames: int = 8            # GENERATED frames per clip
    ch: int = 32                 # base width unit
    z_dim: int = 120
    n_classes: int = 101
    emb_dim: int = 120           # shared class-embedding width
    attn_res: int = 32           # separable attention at this resolution
    base_res: int = 4
    # rematerialize each level's activations in backward (SURVEY §5.7:
    # the 48-frame / 256px configs trade FLOPs for HBM)
    remat: bool = False
    # DVD-GAN-FP (video prediction, [P] §3.2): G is conditioned on the
    # first `cond_frames` real frames — a strided-conv frame encoder taps
    # features at every level resolution and each level's ConvGRU warms up
    # its initial hidden state by scanning over the encoded frames. 0 = the
    # synthesis variant.
    cond_frames: int = 0

    @property
    def mults(self) -> Tuple[int, ...]:
        return _G_MULTS[self.img_size]

    @property
    def n_levels(self) -> int:
        """Upsampling levels: 4 -> img_size."""
        return int(math.log2(self.img_size // self.base_res))

    @property
    def chunk_dim(self) -> int:
        """Hierarchical latent: z splits into n_levels+1 equal chunks (one
        seeds the 4×4 map, one conditions each level's CBNs)."""
        n = self.n_levels + 1
        if self.z_dim % n:
            raise ValueError(f"z_dim={self.z_dim} not divisible by {n} chunks")
        return self.z_dim // n

    @property
    def cond_dim(self) -> int:
        return self.chunk_dim + self.emb_dim

    def level_channels(self, i: int) -> Tuple[int, int]:
        m = self.mults
        return self.ch * m[i], self.ch * m[i + 1]


@dataclasses.dataclass(frozen=True)
class DSConfig:
    """Spatial discriminator (SURVEY.md §2.7): k random full-res frames."""
    img_size: int = 64
    ch: int = 32
    n_classes: int = 101
    k_frames: int = 8

    @property
    def mults(self) -> Tuple[int, ...]:
        return _D_MULTS[self.img_size]

    @property
    def feat_dim(self) -> int:
        return self.ch * self.mults[-1]


@dataclasses.dataclass(frozen=True)
class DTConfig:
    """Temporal discriminator (SURVEY.md §2.8): whole clip at half spatial
    resolution; first `n_3d_blocks` residual blocks are 3-D convs."""
    img_size: int = 64            # full-res; DT consumes img_size // 2
    n_frames: int = 8
    ch: int = 32
    n_classes: int = 101
    n_3d_blocks: int = 2

    @property
    def input_size(self) -> int:
        return self.img_size // 2

    @property
    def mults(self) -> Tuple[int, ...]:
        return _D_MULTS[self.input_size]

    @property
    def feat_dim(self) -> int:
        return self.ch * self.mults[-1]
