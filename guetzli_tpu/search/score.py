"""Candidate ranking: size--distance score.

Reference semantics (guetzli/score.cc:23-41): a candidate within the distance
target scores its byte size; one outside scores size inflated by
exp(50 * distance overshoot), capped to avoid overflow. Lower is better.
"""

from __future__ import annotations

import math


SCALE = 50.0
MAX_EXPONENT = 10.0
LARGE_SIZE = 1e30


def score_jpeg(butteraugli_distance: float, size: int,
               butteraugli_target: float) -> float:
    diff = butteraugli_distance - butteraugli_target
    if diff <= 0.0:
        return float(size)
    exponent = SCALE * diff
    if exponent > MAX_EXPONENT:
        return LARGE_SIZE * math.exp(MAX_EXPONENT) * diff + size
    return math.exp(exponent) * size
