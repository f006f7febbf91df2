"""Utilities: config/CLI parity, metric logging, media dumps —
SURVEY.md §2.13, §2.15."""

from dvdgan_tpu.utils.config import PRESETS, Config, parse_config  # noqa: F401
