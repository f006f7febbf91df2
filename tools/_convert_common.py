"""Shared helpers for the pretrained-weight converters."""

from __future__ import annotations

import numpy as np


def as_numpy(t) -> np.ndarray:
    """torch.Tensor / ndarray / array-like -> float32 ndarray."""
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t, np.float32)
