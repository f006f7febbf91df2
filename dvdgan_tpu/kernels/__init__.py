"""Pallas TPU kernels for the hot ops (SURVEY.md §2 native obligations,
§7.7). Each kernel ships with a plain-JAX numerics oracle, a custom VJP,
and is opt-in from ops/ with measured-win gating."""

from dvdgan_tpu.kernels.attention_spatial import spatial_attn_fused  # noqa: F401
from dvdgan_tpu.kernels.convgru_blocked import gru_sequence_blocked  # noqa: F401
from dvdgan_tpu.kernels.convgru_cell import fits_vmem, gru_cell_fused  # noqa: F401
from dvdgan_tpu.kernels.convgru_seq import gru_sequence_fused  # noqa: F401
