"""Speculative quant search: trajectory identity with the sequential path.

The speculative tree evaluation (processor.select_quant_matrix) must
visit the same candidates, produce the same log-visible iteration count,
and emit byte-identical output vs the reference-shaped one-at-a-time
protocol (reference guetzli/processor.cc:328-360)."""

import numpy as np
from PIL import Image

import guetzli_tpu
from guetzli_tpu.config import ProcessStats
from guetzli_tpu.search import processor as P
from guetzli_tpu.search import quant_search

from tests.conftest import DATA


def test_speculative_tree_simulates_generator():
    """Walking any outcome path through the tree reproduces exactly what
    the real generator would emit under those outcomes."""
    rng = np.random.default_rng(7)
    for trial in range(20):
        gen = quant_search.QuantMatrixGenerator(bool(trial % 2))
        # advance the generator by a random prefix of outcomes
        for _ in range(trial % 5):
            q = gen.get_next()
            if q is None:
                break
            gen.add(quant_search.QuantData(
                q=q, dist_ok=bool(rng.integers(2))))
        tree = quant_search.speculative_tree(gen, 3)
        # replay a random outcome path against a clone of the generator
        g2 = gen.clone()
        path = ()
        while path in tree:
            q_sim = tree[path]
            q_real = g2.get_next()
            if q_sim is None:
                assert q_real is None
                break
            assert np.array_equal(q_real, q_sim)
            ok = bool(rng.integers(2))
            g2.add(quant_search.QuantData(q=q_real, dist_ok=ok))
            path = path + (ok,)


def test_speculative_matches_sequential_e2e():
    rgb = np.asarray(Image.open(DATA / "bees.png").convert("RGB"))
    crop = rgb[:80, :96]

    st_spec = ProcessStats()
    out_spec = guetzli_tpu.process(crop, quality=95, stats=st_spec)

    old = P._SEQ_QUANT
    P._SEQ_QUANT = True
    try:
        st_seq = ProcessStats()
        out_seq = guetzli_tpu.process(crop, quality=95, stats=st_seq)
    finally:
        P._SEQ_QUANT = old

    assert out_spec == out_seq
    assert st_spec.num_iterations == st_seq.num_iterations
