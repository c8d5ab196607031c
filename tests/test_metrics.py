"""Attribute-F1 metric tests with a stubbed analyzer."""

import numpy as np

from aiic_tpu.train.metrics import attribute_f1


class StubAnalyzer:
    category_names = ["styles", "characteristics", "room_types"]

    def __init__(self, results):
        self._results = results

    def analyze_images_batch(self, paths, filter_interiors=False):
        return self._results


def test_perfect_predictions_score_one():
    data = [
        {"image_path": "a.jpg", "style": "boho", "characteristics": ["x", "y"],
         "materials": [], "colors": [], "room_type": "salon"},
    ]
    results = {
        "./a.jpg": {
            "is_interior": True,
            "analysis": {
                "styles": [("boho", 0.9), ("retro", 0.1)],
                "characteristics": [("x", 0.5), ("y", 0.4), ("z", 0.1)],
                "room_types": [("salon", 0.8)],
            },
        }
    }
    out = attribute_f1(StubAnalyzer(results), data, ".")
    assert out["styles"]["top1_accuracy"] == 1.0
    assert out["characteristics"]["f1"] == 1.0  # top-2 of 2 true labels
    assert out["room_types"]["f1"] == 1.0


def test_wrong_predictions_score_zero():
    data = [
        {"image_path": "a.jpg", "style": "boho", "characteristics": ["x"],
         "materials": [], "colors": [], "room_type": "salon"},
    ]
    results = {
        "./a.jpg": {
            "is_interior": True,
            "analysis": {
                "styles": [("retro", 0.9)],
                "characteristics": [("q", 0.5)],
                "room_types": [("kuchnia", 0.8)],
            },
        }
    }
    out = attribute_f1(StubAnalyzer(results), data, ".")
    assert out["styles"]["top1_accuracy"] == 0.0
    assert out["characteristics"]["f1"] == 0.0
    assert out["room_types"]["f1"] == 0.0
