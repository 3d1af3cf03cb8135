"""Global quantization-matrix search.

Reference: guetzli/processor.cc:180-360. The generator's binary search over
the CSF-weighted heuristic score runs on host (tiny scalar logic); each
TryQuantMatrix evaluation (requantize all blocks + decode + butteraugli)
is one device pass.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from guetzli_tpu.jpeg.data import NATURAL_ORDER, ZIGZAG_ORDER


def contrast_sensitivity(k: int) -> float:
    return 1.0 / (1.0 + ZIGZAG_ORDER[k] / 2.0)


_CS = np.array([contrast_sensitivity(k) for k in range(64)])
TOTAL_CSF = float(3.0 * _CS.sum())


def quant_matrix_heuristic_score(q: np.ndarray) -> float:
    """q: (3, 64) natural order."""
    return float(np.sum(0.5 * (q - 1.0) * _CS[None, :]))


def quant_matrix_with_heuristic_score(score: float) -> np.ndarray:
    """Inverse of the heuristic score: near-uniform odd-valued matrices
    (reference guetzli/processor.cc:272-282)."""
    q = np.zeros((3, 64), dtype=np.int32)
    level = int(score / TOTAL_CSF)
    score -= level * TOTAL_CSF
    for k in range(63, -1, -1):
        nat = NATURAL_ORDER[k]
        q[:, nat] = 2 * level + (3 if score > 0.0 else 1)
        score -= 3.0 * contrast_sensitivity(nat)
    return q


def compare_quant_matrices(a: np.ndarray, b: np.ndarray) -> int:
    """0 equal / -1 dominated / 1 dominating / 2 incomparable."""
    if np.array_equal(a, b):
        return 0
    if np.all(a <= b):
        return -1
    if np.all(a >= b):
        return 1
    return 2


@dataclasses.dataclass
class QuantData:
    q: np.ndarray
    jpg_size: int = 0
    dist_ok: bool = False


def better_quant_data(a: QuantData, b: QuantData) -> bool:
    if a.dist_ok and not b.dist_ok:
        return True
    if not a.dist_ok and b.dist_ok:
        return False
    return a.jpg_size < b.jpg_size


class QuantMatrixGenerator:
    """Binary search over the heuristic score (reference semantics)."""

    def __init__(self, downsample: bool):
        self.downsample = downsample
        self.hscore_a = -1.0
        self.hscore_b = -1.0
        self.quants: List[QuantData] = []

    def get_next(self) -> Optional[np.ndarray]:
        for _ in range(1000):
            if self.hscore_b == -1.0:
                if self.hscore_a == -1.0:
                    hscore = 0.0 if self.downsample else TOTAL_CSF
                else:
                    if self.hscore_a < 5.0 * TOTAL_CSF:
                        hscore = self.hscore_a + TOTAL_CSF
                    else:
                        hscore = 2 * (self.hscore_a + TOTAL_CSF)
                if hscore > 100 * TOTAL_CSF:
                    return None
            elif self.hscore_b == 0.0:
                return None
            elif self.hscore_a == -1.0:
                hscore = 0.0
            else:
                eps = 0.05
                mid = 0.5 * (self.hscore_a + self.hscore_b)
                lower = quant_matrix_with_heuristic_score(
                    (1 - eps) * self.hscore_a + eps * mid)
                upper = quant_matrix_with_heuristic_score(
                    (1 - eps) * self.hscore_b + eps * mid)
                if compare_quant_matrices(lower, upper) == 0:
                    return None
                hscore = mid
            q = quant_matrix_with_heuristic_score(hscore)
            retry = False
            for known in self.quants:
                if compare_quant_matrices(q, known.q) == 0:
                    if known.dist_ok:
                        self.hscore_a = hscore
                    else:
                        self.hscore_b = hscore
                    retry = True
                    break
            if not retry:
                return q
        return None

    def add(self, data: QuantData) -> None:
        self.quants.append(data)
        hscore = quant_matrix_heuristic_score(data.q)
        if data.dist_ok:
            self.hscore_a = max(self.hscore_a, hscore)
        else:
            self.hscore_b = (hscore if self.hscore_b == -1.0
                             else min(self.hscore_b, hscore))

    def clone(self) -> "QuantMatrixGenerator":
        g = QuantMatrixGenerator(self.downsample)
        g.hscore_a = self.hscore_a
        g.hscore_b = self.hscore_b
        g.quants = list(self.quants)
        return g


def speculative_tree(gen: QuantMatrixGenerator, depth: int):
    """Simulate the generator's next `depth` levels for every DistanceOK
    outcome path.

    The generator's evolution is a deterministic function of each tried
    candidate's dist_ok bit (get_next/add read nothing else), so the
    whole outcome tree can be enumerated ahead of evaluation and scored
    in ONE batched device call (processor.select_quant_matrix). Returns
    {outcome_path (tuple of bools): candidate q or None-if-exhausted};
    paths have length < depth."""
    out = {}

    def rec(g: QuantMatrixGenerator, d: int, path):
        g2 = g.clone()
        q = g2.get_next()
        out[path] = q
        if q is None or d <= 1:
            return
        for outcome in (True, False):
            g3 = g2.clone()
            g3.add(QuantData(q=q.copy(), dist_ok=outcome))
            rec(g3, d - 1, path + (outcome,))

    rec(gen, depth, ())
    return out
