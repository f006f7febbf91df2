"""Evaluation: FVD / Inception Score with pluggable feature extractors —
SURVEY.md §2.17."""

from dvdgan_tpu.eval.features import ClassifierProbs, I3DLikeFeatures  # noqa: F401
from dvdgan_tpu.eval.frechet import (  # noqa: F401
    frechet_distance, frechet_from_features, statistics)
from dvdgan_tpu.eval.metrics import (  # noqa: F401
    evaluate_generator, extract_features, fvd, inception_score)
