from aiic_tpu.engine.detector import DETECTOR_CATEGORIES, INTERIOR_COUNT, DEFAULT_CONFIDENCE_THRESHOLD
from aiic_tpu.engine.analyzer import InteriorAnalyzer

__all__ = [
    "DETECTOR_CATEGORIES",
    "INTERIOR_COUNT",
    "DEFAULT_CONFIDENCE_THRESHOLD",
    "InteriorAnalyzer",
]
