"""Run configuration.

Single dataclass covering both the reference CLI flags and the internal
`Params` knobs (reference: guetzli/processor.h:29-37) that the reference never
exposed; defaults are behavior-identical to the reference.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Params:
    # Target butteraugli distance; derived from --quality via
    # butteraugli_score_for_quality (reference: guetzli/quality.cc:78-85).
    butteraugli_target: float = 1.0
    clear_metadata: bool = True
    try_420: bool = False
    force_420: bool = False
    # Gamma-aware iterative chroma downsampling for the 4:2:0 path
    # (reference: guetzli/output_image.cc:309-317).
    use_silver_screen: bool = False
    zeroing_greedy_lookahead: int = 3
    new_zeroing_model: bool = True


@dataclasses.dataclass
class ProcessStats:
    """Counters mirroring reference guetzli/stats.h:29-40."""

    num_iterations: int = 0
    num_iterations_up: int = 0
    num_iterations_down: int = 0
    debug: bool = False

    def counters(self) -> dict:
        return {
            "iterations": self.num_iterations,
            "iterations_up": self.num_iterations_up,
            "iterations_down": self.num_iterations_down,
        }
