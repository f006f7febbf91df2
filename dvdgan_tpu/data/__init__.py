"""Input pipeline: synthetic clips, on-disk frame folders, prefetching
loader — SURVEY.md §2.12."""

from dvdgan_tpu.data.frames import FrameFolderDataset  # noqa: F401
from dvdgan_tpu.data.loader import Loader  # noqa: F401
from dvdgan_tpu.data.synthetic import SyntheticVideoDataset  # noqa: F401
