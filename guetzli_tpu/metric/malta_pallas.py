"""Pallas TPU kernel for the Malta line-detector stencils.

The XLA lowering of the 16-filter 9x9 stencil as a convolution is
launch-overhead-bound on small images (~2.5 ms per call). This kernel
evaluates all 16 patterns as static shifted-adds + square-accumulate on
VMEM-resident row tiles — ~140 tile-sized VPU ops, no conv machinery.
Semantics identical to malta.malta_sum_of_squares_batch (zero-padded
borders).

Tiling: the input is pre-gathered into overlapping (TILE + 8)-row windows
(one cheap XLA slice/stack) so each grid step owns an independent block —
no overlapping-BlockSpec subtleties, and VMEM stays bounded regardless of
image height.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from guetzli_tpu.metric.malta import MALTA_PATTERNS, MALTA_PATTERNS_LF

PAD = 4          # stencil reach
# Row-tile height adapts to the image width: the Mosaic compiler keeps
# several tile-sized temporaries live across the 16 patterns, so the
# scoped-VMEM budget caps tile_h * width (a fixed 128-row tile OOMed at
# width 1200: 32 MB scoped vs the 16 MB limit).
_TILE_BUDGET = 48 * 1024     # elements per tile


def _tile_rows(w: int) -> int:
    t = max(8, min(128, _TILE_BUDGET // max(w, 1)))
    return (t // 8) * 8


def _kernel(x_ref, out_ref, *, pats, w, tile):
    x = x_ref[0, 0]
    acc = jnp.zeros((tile, w), jnp.float32)
    for offs in pats:
        s = None
        for dy, dx in offs:
            sl = x[PAD + dy:PAD + dy + tile, PAD + dx:PAD + dx + w]
            s = sl if s is None else s + sl
        acc = acc + s * s
    out_ref[0, 0] = acc


@functools.partial(jax.jit, static_argnames=("lf", "interpret"))
def malta_sum_of_squares_pallas(diffs: jax.Array, lf: bool,
                                interpret: bool = False) -> jax.Array:
    """(N, H, W) scaled diff planes -> (N, H, W) per-pixel sum over the 16
    patterns of squared line sums."""
    n, h, w = diffs.shape
    tile = _tile_rows(w)
    n_tiles = -(-h // tile)
    # zero-pad to the stencil reach + tile multiple, then gather the
    # overlapping (tile + 2*PAD)-row windows
    x = jnp.pad(diffs, ((0, 0), (PAD, n_tiles * tile - h + PAD),
                        (PAD, PAD)))
    windows = jnp.stack(
        [jax.lax.slice_in_dim(x, t * tile, t * tile + tile + 2 * PAD,
                              axis=1) for t in range(n_tiles)], axis=1)
    # windows: (N, n_tiles, tile + 8, W + 8)
    pats = tuple(tuple(map(tuple, p))
                 for p in (MALTA_PATTERNS_LF if lf else MALTA_PATTERNS))
    kern = functools.partial(_kernel, pats=pats, w=w, tile=tile)
    out = pl.pallas_call(
        kern,
        grid=(n, n_tiles),
        in_specs=[pl.BlockSpec((1, 1, tile + 2 * PAD, w + 2 * PAD),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, tile, w), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, tile, w), jnp.float32),
        interpret=interpret,
    )(windows)
    return out.reshape(n, n_tiles * tile, w)[:, :h]
