"""Model layer: Generator, SpatialDiscriminator (DS), TemporalDiscriminator
(DT) — SURVEY.md §2.6–2.8."""

from dvdgan_tpu.models.config import DSConfig, DTConfig, GConfig  # noqa: F401
from dvdgan_tpu.models import discriminator, generator  # noqa: F401
