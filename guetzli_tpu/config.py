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
    # Acceptance-margin multiplier on the butteraugli target (<1 shrinks
    # it). The device metric runs in f32 and its max-reduction can land a
    # hair above the f64 target (measured +0.054..0.089% on the 1 MPix
    # quality sweep, BENCH_CONFIGS.json r5; +0.074% worst case on the
    # corpus, PARITY.md). The 0.998 default guarantees the
    # oracle-measured f64 distance stays at/under the NOMINAL target —
    # the contract a --quality user actually asked for — at a ~0.1-0.3%
    # size cost. Set 1.0 for reference-identical acceptance arithmetic
    # (the reference needs no band because it evaluates in doubles).
    distance_margin: float = 0.998


# Counter names (reference guetzli/stats.h:29-31).
NUM_ITERS_CNT = "number of iterations"
NUM_ITERS_UP_CNT = "number of iterations up"
NUM_ITERS_DOWN_CNT = "number of iterations down"


@dataclasses.dataclass
class ProcessStats:
    """Reference guetzli/stats.h:29-40: a general string->int counter map
    plus two debug sinks (string buffer and file object) and a filename
    tag. The three iteration counters keep attribute accessors for
    convenience."""

    counters: dict = dataclasses.field(default_factory=dict)
    debug_output: list = None       # string sink: appended str chunks
    debug_output_file: object = None  # file-like sink
    filename: str = ""

    def _get(self, name: str) -> int:
        return self.counters.get(name, 0)

    def _add(self, name: str, delta: int) -> None:
        self.counters[name] = self.counters.get(name, 0) + delta

    @property
    def num_iterations(self) -> int:
        return self._get(NUM_ITERS_CNT)

    @num_iterations.setter
    def num_iterations(self, v: int) -> None:
        self.counters[NUM_ITERS_CNT] = v

    @property
    def num_iterations_up(self) -> int:
        return self._get(NUM_ITERS_UP_CNT)

    @num_iterations_up.setter
    def num_iterations_up(self, v: int) -> None:
        self.counters[NUM_ITERS_UP_CNT] = v

    @property
    def num_iterations_down(self) -> int:
        return self._get(NUM_ITERS_DOWN_CNT)

    @num_iterations_down.setter
    def num_iterations_down(self, v: int) -> None:
        self.counters[NUM_ITERS_DOWN_CNT] = v

    @property
    def debug(self) -> bool:
        return (self.debug_output is not None
                or self.debug_output_file is not None)

    @debug.setter
    def debug(self, v: bool) -> None:
        # Back-compat flag: mirrors the reference CLI wiring
        # stats.debug_output_file = stderr (guetzli.cc:279-281).
        import sys
        self.debug_output_file = sys.stderr if v else None


def print_debug(stats: ProcessStats, s: str) -> None:
    """Reference PrintDebug (guetzli/debug_print.cc:21-28): append to the
    string sink and/or write to the file sink."""
    if stats is None:
        return
    if stats.debug_output is not None:
        stats.debug_output.append(s)
    if stats.debug_output_file is not None:
        stats.debug_output_file.write(s)
        stats.debug_output_file.flush()


def log_quant(stats: ProcessStats, q) -> None:
    """GUETZLI_LOG_QUANT (guetzli/debug_print.h:39-47): the three 8x8
    quantization matrices side by side, row-major."""
    if stats is None or not stats.debug:
        return
    out = []
    for y in range(8):
        for c in range(3):
            for x in range(8):
                out.append(" %2d" % int(q[c][8 * y + x]))
            out.append("   ")
        out.append("\n")
    print_debug(stats, "".join(out))
