"""JPEG-quality -> butteraugli-target mapping.

Same table/interpolation as the reference (guetzli/quality.cc:31-85): median
butteraugli scores of libjpeg output at each quality on a PNG corpus, linear
interpolation, clamped to [70, 110].
"""

from __future__ import annotations

import numpy as np

LOWEST_QUALITY = 70
HIGHEST_QUALITY = 110

SCORE_FOR_QUALITY = np.array([
    2.810761, 2.729300, 2.689687, 2.636811, 2.547863,   # 70-74
    2.525400, 2.473416, 2.366133, 2.338078, 2.318654,   # 75-79
    2.201674, 2.145517, 2.087322, 2.009328, 1.945456,   # 80-84
    1.900112, 1.805701, 1.750194, 1.644175, 1.562165,   # 85-89
    1.473608, 1.382021, 1.294298, 1.185402, 1.066781,   # 90-94
    0.971769, 0.852901, 0.724544, 0.611302, 0.443185,   # 95-99
    0.211578, 0.209462, 0.207346, 0.205230, 0.203114,   # 100-104
    0.200999, 0.198883, 0.196767, 0.194651, 0.192535,   # 105-109
    0.190420, 0.190420,                                 # 110 (+pad)
], dtype=np.float64)


def butteraugli_score_for_quality(quality: float) -> float:
    quality = min(max(quality, LOWEST_QUALITY), HIGHEST_QUALITY)
    index = int(quality)
    mix = quality - index
    base = SCORE_FOR_QUALITY[index - LOWEST_QUALITY]
    nxt = SCORE_FOR_QUALITY[index - LOWEST_QUALITY + 1]
    return float(base * (1 - mix) + nxt * mix)
