"""Device-resident up/down refinement loop (the optimizer's hot phase).

Reference semantics: guetzli/processor.cc:611-765 — the per-direction
global-order build, bulk candidate application with the entropy-size
stopping rule, and per-iteration butteraugli re-evaluation. Round 1 ran
this loop on the host with one fused device call per iteration; the
~60 ms link round trip per iteration left the chip idle >85%. This
module runs K iterations per device program (`lax.while_loop` over
device-resident search state) so the link cost is paid once per chunk.

The three invariants that make the loop jittable:

1. Prefix-state property. Within a masking pass, the coefficient state
   after ANY iteration equals "pass-initial state with each block's
   first n_b zeroing candidates applied": the up direction moves n_b
   forward (zeroing), the down direction moves it backward (restoring),
   and the restore value (requantized original, processor.cc:718) is
   exactly the pass-initial value of that coefficient. The device carry
   is therefore just n (N,), and state materialization is one
   idempotent scatter — no mutable state to drift.
2. Frozen-entropy chunks. The in-loop size estimate uses Huffman code
   depths and histogram clustering frozen at the chunk boundary; the
   host refreshes them every chunk — the analog of the reference's
   entropy-code refresh every 10 coefficients (processor.cc:740-743).
   Under frozen depths each candidate's bit-size delta dB[b, t] is an
   iteration-invariant curve, recomputed once per chunk by one scan;
   est(m) inside the stopping bisection is then two gathers into the
   per-block cumulative curve.
3. Rank-exact application without sorting. The global order
   (processor.cc:636-678) is never materialized: per-block values are
   monotone along t inside the valid window (the error curve is
   monotonicized), so the applied set of any rank prefix m is a
   per-block contiguous t-window characterized by counts j_b alone.
   The stopping rule's bisection runs in two exact stages — over the
   order-preserving u32 encoding of the threshold value (class
   boundaries), then by rank inside the boundary tie class with the
   block-major stable-sort tie split — and the size estimate at any
   probe is an int32 masked window sum over the bit-delta grid.
   Identical results to a stable argsort, with no sort and no
   per-probe gathers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.jpeg.data import NATURAL_ORDER
from guetzli_tpu.metric.comparator import _compare_coeffs_impl

# Refinement iterations per device chunk. Each chunk costs one link
# round trip + one host entropy refresh; more iterations per chunk
# amortize both, at the price of a staler in-loop size estimate between
# refreshes (the acceptance itself is exact either way — the estimate
# only steers candidate counts). Env knob for A/B measurement.
import os as _os
REFINE_K = int(_os.environ.get("GUETZLI_TPU_REFINE_K", "16"))
_BISECT_ITERS = 22       # covers N*steps up to 4M candidates

# zigzag positions 1..63 -> natural (row-major) index
_NAT_AC = np.asarray(NATURAL_ORDER[1:], dtype=np.int32)

SCORE_SCALE = 50.0
SCORE_MAX_EXPONENT = 10.0
SCORE_LARGE = 1e30


class RefineCfg(NamedTuple):
    """Static (compile-time) configuration of a refinement pass.

    With bucketed=True, width/height are the padded canvas dims and
    n_blocks the canvas block count; the true image dims live in
    RefineConsts.valid_h/valid_w (traced), so one compiled chunk serves
    every image size in the bucket."""
    n_blocks: int
    steps: int
    width: int
    height: int
    factors: Tuple[int, ...]   # per-component sampling factor
    wfactor: int               # pass block factor (1 or 2)
    comp_mask: int             # 7 (444), 1 (420 luma), 6 (420 chroma)
    k_iters: int = REFINE_K
    bucketed: bool = False
    fused: bool = False        # Pallas metric mega-kernel (small buckets)
    bisect_group: int = 1      # sequential probes per bisection launch
    #                            group (1 = plain binary; 3 = oct-ary:
    #                            7 probes evaluated batched, exact same
    #                            results, ~3x fewer sequential rounds —
    #                            wins where launch overhead dominates
    #                            the probe's bandwidth, i.e. small
    #                            canvases)


class RefineConsts(NamedTuple):
    """Device-resident pass constants (entropy fields refresh per chunk)."""
    cand_idx: jax.Array      # (N, steps) i32 flat 192-index per candidate
    cand_err: jax.Array      # (N, steps) f32 monotone error curve
    cand_count: jax.Array    # (N,) i32
    init192: jax.Array       # (N, 192) i32 pass-initial dequantized coeffs
    init_at_cand: jax.Array  # (N, steps) i32 init values at candidate slots
    prec: jax.Array          # (N, steps) bool precious-guard skip mask
    quant_zz: jax.Array      # (3, 63) i32 per-comp AC quant, zigzag order
    depths: jax.Array        # (3, 256) i32 per-comp frozen Huffman depths
    pad_eob_bits: jax.Array  # (3,) i32 MCU-padding EOB bits per comp
    frozen_fudged: jax.Array  # () i32 fudged bits of unmasked comps
    header_dc: jax.Array     # () i32 header + DC + DHT bytes (frozen)
    base_size: jax.Array     # () f32 pass-start size estimate
    target: jax.Array        # () f32 butteraugli target distance
    wtarget: jax.Array       # () f32 target * pass target_mul (weights)
    block_limit: jax.Array   # () f32 BlockErrorLimit
    stop_threshold: jax.Array  # () f32 stop-early size bound (+inf if off)
    pi0: object              # PsychoImage of the original
    frozen_coeffs: Tuple[jax.Array, ...]  # unmasked comps' coeff grids
    valid_h: jax.Array       # () i32 true image height (bucketed mode)
    valid_w: jax.Array       # () i32 true image width
    row_valid: jax.Array     # (N,) bool: real image blocks (pad rows off)
    zero_order: jax.Array    # (N, 3, 63) i32: candidate index that zeroes
    #                          AC zigzag position p+1 (steps+1 if never)
    cand_zpos: jax.Array     # (N, steps) i32 zigzag position (1..63)
    zero_order_nat: jax.Array  # (N, 192) i32: same table in natural
    #                            coefficient layout (steps+1 = never)
    bit_setup: Optional[tuple] = None
    #   Pass-constant symbol grids from bits_setup() — when present,
    #   _bits_curve uses the cheap per-chunk path (apply the refreshed
    #   depth tables to precomputed (N, steps) symbol grids) instead of
    #   re-deriving the prev/next-nonzero dominance structure, which
    #   costs ~290 ms per chunk at 1 MPix.


class RefineCarry(NamedTuple):
    """Device-resident search state across chunks."""
    n: jax.Array           # (N,) i32 applied-prefix counts (last_indexes)
    mbe: jax.Array         # (N,) f32 max_block_error
    w_grids: jax.Array     # (8, N) f32 block-error weights (dir x rblock)
    dist: jax.Array        # () f32 current butteraugli distance
    first_up: jax.Array    # () bool
    direction: jax.Array   # () i32 +1 / -1
    phase_done: jax.Array  # () bool
    stopped_early: jax.Array  # () bool
    iters_up: jax.Array    # () i32
    iters_down: jax.Array  # () i32
    best_score: jax.Array  # () f32
    best_n: jax.Array      # (N,) i32
    best_dist: jax.Array   # () f32
    best_est: jax.Array    # () i32
    best_flag: jax.Array   # () bool


def init_carry(n_blocks: int, distance: float) -> RefineCarry:
    return RefineCarry(
        n=jnp.zeros(n_blocks, jnp.int32),
        mbe=jnp.zeros(n_blocks, jnp.float32),
        w_grids=jnp.zeros((8, n_blocks), jnp.float32),
        dist=jnp.float32(distance),
        first_up=jnp.bool_(True),
        direction=jnp.int32(1),
        phase_done=jnp.bool_(False),
        stopped_early=jnp.bool_(False),
        iters_up=jnp.int32(0),
        iters_down=jnp.int32(0),
        best_score=jnp.float32(jnp.inf),
        best_n=jnp.zeros(n_blocks, jnp.int32),
        best_dist=jnp.float32(0.0),
        best_est=jnp.int32(0),
        best_flag=jnp.bool_(False),
    )


# ---------------------------------------------------------------------------
# Entropy bit model under frozen Huffman depths.
# ---------------------------------------------------------------------------

def _take_small(tab: jax.Array, idx: jax.Array) -> jax.Array:
    """Exact small-table lookup tab[idx] without a TPU gather. XLA
    lowers take to a gather running ~200 M elements/s on TPU (~20 ms
    per (N, steps) grid at 1 MPix); two bf16 one-hot contractions are
    ~12x faster and exact for integer tables with values < 256 (bf16
    holds integers to 256 exactly; every product has one nonzero term).
    tab: (T,) i32, T a multiple of 32, 0 <= values < 256; idx: any
    shape with 0 <= idx < T."""
    hi = tab.shape[0] // 32
    t2 = tab.reshape(hi, 32).astype(jnp.bfloat16)
    a = jax.nn.one_hot(idx >> 5, hi, dtype=jnp.bfloat16)
    b = jax.nn.one_hot(idx & 31, 32, dtype=jnp.bfloat16)
    c = jax.lax.dot_general(b, t2, (((b.ndim - 1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.sum(a.astype(jnp.float32) * c, axis=-1).astype(jnp.int32)


def _bitlen(a: jax.Array) -> jax.Array:
    """Bit length of a >= 0 (int32, < 2^23) via the f32 exponent field —
    replaces a 13-pass compare loop."""
    e = (jax.lax.bitcast_convert_type(a.astype(jnp.float32), jnp.int32)
         >> 23) - 126
    return jnp.where(a > 0, e, 0)


def _comp_bits(cur192: jax.Array, c: int, quant_zz_c: jax.Array,
               depth_c: jax.Array) -> jax.Array:
    """(N, 192) natural-order dequantized state -> (N,) i32 AC scan bits
    of component c under the frozen depth table (the per-symbol terms of
    guetzli/jpeg_data_writer.cc:221-232: depth + magnitude bits, ZRL and
    EOB included; the 0.75/256 escape fudge is applied by the caller)."""
    vz = cur192[:, c * 64 + _NAT_AC]                # (N, 63) zigzag AC
    v = vz // quant_zz_c[None, :]                   # exact multiples
    nz = v != 0
    p = jnp.arange(1, 64, dtype=jnp.int32)[None, :]
    arr = jnp.where(nz, p, 0)
    cm = jax.lax.cummax(arr, axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((arr.shape[0], 1), arr.dtype), cm[:, :-1]], axis=1)
    run = p - prev - 1
    nb = _bitlen(jnp.abs(v))
    sym = ((run & 15) << 4) | nb
    w = (_take_small(depth_c, sym) + nb + (run >> 4) * depth_c[0xF0])
    bits = jnp.sum(jnp.where(nz, w, 0), axis=1)
    last = jnp.max(arr, axis=1)
    return bits + jnp.where(last < 63, depth_c[0], 0)


def _live_comps(comp_mask: int):
    return tuple(c for c in range(3) if comp_mask & (1 << c))


def _all_comp_bits(cur192, consts: RefineConsts, comp_mask: int):
    """(N, 3) i32 per-comp bits; unmasked comps stay zero (their frozen
    cost lives in consts.frozen_fudged); bucket-pad block rows count 0
    (they are not part of the scan)."""
    cols = []
    for c in range(3):
        if comp_mask & (1 << c):
            b = _comp_bits(cur192, c, consts.quant_zz[c],
                           consts.depths[c])
            cols.append(jnp.where(consts.row_valid, b, 0))
        else:
            cols.append(jnp.zeros(cur192.shape[0], jnp.int32))
    return jnp.stack(cols, axis=1)


def _bits_curve_scan(consts: RefineConsts, cfg: RefineCfg):
    """Reference implementation of the per-candidate bit-delta curve: a
    sequential scan recomputing full per-comp bits after each zeroing.
    Correct but ~40 ms/iteration on TPU (the 256-entry depth gathers
    inside a 192-step scan dominate); kept as the oracle for
    _bits_curve's closed form in tests."""
    n = cfg.n_blocks
    iota = jnp.arange(192, dtype=jnp.int32)[None, :]
    bits_init = _all_comp_bits(consts.init192, consts, cfg.comp_mask)

    def step(carry, t):
        cur, bits_prev = carry
        ci = consts.cand_idx[:, t]
        apply = (t < consts.cand_count) & ~consts.prec[:, t]
        newcur = jnp.where((iota == ci[:, None]) & apply[:, None], 0, cur)
        newbits = _all_comp_bits(newcur, consts, cfg.comp_mask)
        return (newcur, newbits), newbits - bits_prev

    (_, _), dbs = jax.lax.scan(step, (consts.init192, bits_init),
                               jnp.arange(cfg.steps, dtype=jnp.int32))
    db = jnp.transpose(dbs, (1, 0, 2))              # (N, steps, 3)
    cum = jnp.cumsum(db, axis=1)
    cumdb3 = jnp.concatenate(
        [jnp.zeros((n, 1, 3), jnp.int32), cum], axis=1)
    bits0 = jnp.sum(bits_init, axis=0) + consts.pad_eob_bits
    return cumdb3, bits0


def bits_setup(consts: RefineConsts, cfg: RefineCfg):
    """Pass-constant half of the bit-delta curve: the (run, size) symbol
    grids that describe how zeroing each candidate rewrites its block's
    JPEG scan stream. Everything here depends only on the pass-initial
    state and the zeroing order — NOT on the per-chunk Huffman depth
    refresh — so the processor computes it once per masking pass and
    _bits_curve applies the current depth tables to it per chunk.

    Returns 9 (N, steps) arrays: sym_k (the removed coefficient's
    run/size symbol), sym_old / sym_new (the next nonzero coefficient's
    symbol before/after the run merge), nb_k (magnitude bits removed),
    zrl_rem (ZRL escapes under the removed symbol, r1 >> 4), zrl_delta
    ((rm >> 4) - (r2 >> 4), the net ZRL change at the next coefficient),
    has_next, is63 (bool), apply (bool application mask)."""
    n, steps = cfg.n_blocks, cfg.steps
    j = jnp.arange(steps, dtype=jnp.int32)[None, None, :]   # (1,1,S)
    p = jnp.arange(1, 64, dtype=jnp.int32)[None, :, None]   # (1,63,1)
    k = consts.cand_zpos[:, None, :]                        # (N,1,S)
    cand_c = consts.cand_idx // 64                          # (N,S)
    base_mask = ((jnp.arange(steps, dtype=jnp.int32)[None, :]
                  < consts.cand_count[:, None])
                 & ~consts.prec & consts.row_valid[:, None])

    zero = jnp.zeros((n, steps), jnp.int32)
    sym_k = zero
    sym_old = zero
    sym_new = zero
    nb_kg = zero
    zrl_rem = zero
    zrl_del = zero
    has_next_g = jnp.zeros((n, steps), bool)
    for c in range(3):
        if not (cfg.comp_mask & (1 << c)):
            continue
        vz = (consts.init192[:, c * 64 + _NAT_AC]
              // consts.quant_zz[c][None, :])               # (N,63)
        nz = vz != 0
        a = jnp.abs(vz)
        nbv = jnp.zeros_like(vz)
        for b in range(13):
            nbv = nbv + (a >= (1 << b)).astype(vz.dtype)
        o = consts.zero_order[:, c, :]                      # (N,63)

        alive = (nz[:, :, None] & (o[:, :, None] > j))      # (N,63,S)
        prev = jnp.max(jnp.where(alive & (p < k), p, 0), axis=1)
        nxt = jnp.min(jnp.where(alive & (p > k), p, 64), axis=1)
        nb_k = jnp.max(jnp.where(p == k, nbv[:, :, None], 0), axis=1)
        nb_n = jnp.max(jnp.where(p == nxt[:, None, :], nbv[:, :, None],
                                 0), axis=1)

        k2 = consts.cand_zpos                               # (N,S)
        r1 = k2 - prev - 1
        rm = nxt - prev - 1          # merged run at next after zeroing
        r2 = nxt - k2 - 1            # old run at next
        sel = cand_c == c
        sym_k = jnp.where(sel, ((r1 & 15) << 4) | nb_k, sym_k)
        sym_old = jnp.where(sel, ((r2 & 15) << 4) | nb_n, sym_old)
        sym_new = jnp.where(sel, ((rm & 15) << 4) | nb_n, sym_new)
        nb_kg = jnp.where(sel, nb_k, nb_kg)
        zrl_rem = jnp.where(sel, r1 >> 4, zrl_rem)
        zrl_del = jnp.where(sel, (rm >> 4) - (r2 >> 4), zrl_del)
        has_next_g = jnp.where(sel, nxt < 64, has_next_g)
    is63 = consts.cand_zpos == 63
    return (sym_k, sym_old, sym_new, nb_kg, zrl_rem, zrl_del,
            has_next_g, is63, base_mask)


@functools.partial(jax.jit, static_argnames=("cfg",))
def bits_setup_device(consts: RefineConsts, cfg: RefineCfg):
    return bits_setup(consts, cfg)


def _bits_curve_fast(consts: RefineConsts, cfg: RefineCfg):
    """Per-chunk half: apply the current depth tables to the
    pass-constant symbol grids. All elementwise over (N, steps) plus
    three 768-entry table takes — ~100x less work than re-deriving the
    dominance structure."""
    (sym_k, sym_old, sym_new, nb_k, zrl_rem, zrl_del,
     has_next, is63, apply_) = consts.bit_setup
    n, steps = cfg.n_blocks, cfg.steps
    bits_init = _all_comp_bits(consts.init192, consts, cfg.comp_mask)
    bits0 = jnp.sum(bits_init, axis=0) + consts.pad_eob_bits

    cand_c = consts.cand_idx // 64
    dtab = consts.depths.reshape(-1)                 # (3*256,)
    off = cand_c * 256
    dep_k = _take_small(dtab, off + sym_k)
    dep_old = _take_small(dtab, off + sym_old)
    dep_new = _take_small(dtab, off + sym_new)
    # dz/d0 depend only on the candidate's component: 3-way selects, not
    # gathers (each (N, steps) take costs ~20 ms at 1 MPix — TPU gather
    # runs at ~200 M elements/s).
    def _sel3(vals3):
        return jnp.where(cand_c == 0, vals3[0],
                         jnp.where(cand_c == 1, vals3[1], vals3[2]))
    dz = _sel3(consts.depths[:, 0xF0])
    d0 = _sel3(consts.depths[:, 0])
    removed = dep_k + nb_k + zrl_rem * dz
    delta_next = dep_new - dep_old + zrl_del * dz
    delta = jnp.where(has_next, delta_next - removed,
                      jnp.where(is63, d0, 0) - removed)
    db = jnp.where(apply_, delta, 0)
    db3 = jnp.where(cand_c[:, :, None]
                    == jnp.arange(3, dtype=jnp.int32)[None, None, :],
                    db[:, :, None], 0)
    cum = jnp.cumsum(db3, axis=1)
    cumdb3 = jnp.concatenate(
        [jnp.zeros((n, 1, 3), jnp.int32), cum], axis=1)
    return cumdb3, bits0


def _bits_curve(consts: RefineConsts, cfg: RefineCfg):
    if consts.bit_setup is not None:
        return _bits_curve_fast(consts, cfg)
    return _bits_curve_full(consts, cfg)


def _bits_curve_full(consts: RefineConsts, cfg: RefineCfg):
    """Per-candidate bit deltas along each block's application order —
    closed form, fully parallel over (block, candidate).

    Zeroing the coefficient at zigzag position k changes exactly three
    things in the block's JPEG scan stream: its own (run, size) symbol
    disappears, the NEXT nonzero coefficient's run merges across k, and
    (when k was the last nonzero at position 63) an EOB appears. The
    state "before candidate j" is characterized without any sequential
    scan by the pass-constant zeroing-order table o[b, c, p] (the
    candidate index that zeroes position p): position p is still nonzero
    before step j iff it was nonzero initially and o[p] > j. prev/next
    nonzero positions are then masked max/min reductions over the 63
    positions, broadcast over all candidates at once.

    Returns (cumdB3 (N, steps+1, 3) i32, bits0 (3,) i32)."""
    n, steps = cfg.n_blocks, cfg.steps
    bits_init = _all_comp_bits(consts.init192, consts, cfg.comp_mask)
    bits0 = jnp.sum(bits_init, axis=0) + consts.pad_eob_bits

    # Broadcast layout (N, 63, S): the candidate axis S lives on lanes
    # and the 63 positions on sublanes, so the reductions are sublane
    # reductions — the (N, S, 63) layout lane-padded 63 -> 128 and
    # lane-reduced, costing ~44 ms/iteration at 1 MPix.
    j = jnp.arange(steps, dtype=jnp.int32)[None, None, :]   # (1,1,S)
    p = jnp.arange(1, 64, dtype=jnp.int32)[None, :, None]   # (1,63,1)
    k = consts.cand_zpos[:, None, :]                        # (N,1,S)
    cand_c = consts.cand_idx // 64                          # (N,S)
    base_mask = ((jnp.arange(steps, dtype=jnp.int32)[None, :]
                  < consts.cand_count[:, None])
                 & ~consts.prec & consts.row_valid[:, None])

    db_cols = []
    for c in range(3):
        if not (cfg.comp_mask & (1 << c)):
            db_cols.append(jnp.zeros((n, steps), jnp.int32))
            continue
        depth_c = consts.depths[c]
        dz = depth_c[0xF0]
        d0 = depth_c[0]
        vz = (consts.init192[:, c * 64 + _NAT_AC]
              // consts.quant_zz[c][None, :])               # (N,63)
        nz = vz != 0
        a = jnp.abs(vz)
        nbv = jnp.zeros_like(vz)
        for b in range(13):
            nbv = nbv + (a >= (1 << b)).astype(vz.dtype)
        o = consts.zero_order[:, c, :]                      # (N,63)

        alive = (nz[:, :, None] & (o[:, :, None] > j))      # (N,63,S)
        prev = jnp.max(jnp.where(alive & (p < k), p, 0), axis=1)
        nxt = jnp.min(jnp.where(alive & (p > k), p, 64), axis=1)
        nb_k = jnp.max(jnp.where(p == k, nbv[:, :, None], 0), axis=1)
        nb_n = jnp.max(jnp.where(p == nxt[:, None, :], nbv[:, :, None],
                                 0), axis=1)

        k2 = consts.cand_zpos                               # (N,S)
        r1 = k2 - prev - 1
        rm = nxt - prev - 1          # merged run at next after zeroing
        r2 = nxt - k2 - 1            # old run at next
        s_k = ((r1 & 15) << 4) | nb_k
        removed = jnp.take(depth_c, s_k) + nb_k + (r1 >> 4) * dz
        s_old = ((r2 & 15) << 4) | nb_n
        s_new = ((rm & 15) << 4) | nb_n
        delta_next = (jnp.take(depth_c, s_new) + (rm >> 4) * dz
                      - jnp.take(depth_c, s_old) - (r2 >> 4) * dz)
        has_next = nxt < 64
        delta = jnp.where(has_next, delta_next - removed,
                          jnp.where(k2 == 63, d0, 0) - removed)
        db_cols.append(jnp.where(base_mask & (cand_c == c), delta, 0))

    db = jnp.stack(db_cols, axis=2)                         # (N,S,3)
    cum = jnp.cumsum(db, axis=1)
    cumdb3 = jnp.concatenate(
        [jnp.zeros((n, 1, 3), jnp.int32), cum], axis=1)
    return cumdb3, bits0


def _bits_at(cumdb3, bits0, n, n_blocks):
    """(3,) i32 total per-comp bits at per-block prefix counts n."""
    idx = jnp.broadcast_to(n[:, None, None].astype(jnp.int32),
                           (n_blocks, 1, 3))
    return bits0 + jnp.sum(
        jnp.take_along_axis(cumdb3, idx, axis=1)[:, 0, :], axis=0)


def _enc_f32(vals: jax.Array, valid: jax.Array) -> jax.Array:
    """Order-preserving f32 -> u32 encoding (sign-folded bit pattern);
    invalid slots -> UINT32_MAX so they sort above every real value
    (+inf encodes to 0xFF800000, still below the sentinel). `vals + 0.0`
    upstream must have normalized -0.0 to +0.0 so encoded ties coincide
    exactly with f32-comparison ties. Unsigned so the bisection midpoint
    arithmetic in _iteration cannot overflow (jax x64 is disabled)."""
    bits = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    enc = jnp.where(bits < jnp.uint32(2 ** 31),
                    bits + jnp.uint32(2 ** 31), ~bits)
    return jnp.where(valid, enc, jnp.uint32(2 ** 32 - 1))


def _est_size(bits3: jax.Array, consts: RefineConsts) -> jax.Array:
    """(..., 3) i32 per-comp raw bits -> (...) estimated bytes (reference
    _entropy_size semantics: per-component escape fudge, shared ceil)."""
    fudged = bits3 + ((bits3 * 3 + 512) >> 10)
    total = jnp.sum(fudged, axis=-1) + consts.frozen_fudged
    return consts.header_dc + ((total + 7) // 8)


def _score_jpeg(dist, est_size, target):
    """score.cc:23-41 in f32 (ordering-preserving)."""
    diff = dist - target
    exponent = SCORE_SCALE * diff
    size = est_size.astype(jnp.float32)
    return jnp.where(
        diff <= 0.0, size,
        jnp.where(exponent > SCORE_MAX_EXPONENT,
                  SCORE_LARGE * np.exp(SCORE_MAX_EXPONENT) * diff + size,
                  jnp.exp(jnp.minimum(exponent, SCORE_MAX_EXPONENT))
                  * size))


# ---------------------------------------------------------------------------
# State materialization + metric evaluation.
# ---------------------------------------------------------------------------

def _state_from_n(n, consts: RefineConsts, cfg: RefineCfg) -> jax.Array:
    """(N,) prefix counts -> (N, 192) coefficient state. Pure elementwise
    via the natural-layout zeroing-order table: coefficient p is zeroed
    iff its zeroing step is below the block's prefix count (a scatter
    here cost ~20 ms/iteration at 1 MPix)."""
    return jnp.where(consts.zero_order_nat < n[:, None], 0,
                     consts.init192)


def _compare_state(state192, consts: RefineConsts, cfg: RefineCfg):
    """Materialized state -> (dist, w_grids (8, N)) via the fused
    butteraugli compare (reuses the single-iteration pipeline)."""
    w, h = cfg.width, cfg.height
    f = cfg.wfactor
    nby, nbx = -(-h // (8 * f)), -(-w // (8 * f))
    s3 = state192.reshape(cfg.n_blocks, 3, 64)
    if cfg.comp_mask == 7:
        coeffs = jnp.transpose(s3, (1, 0, 2)).reshape(3, nby, nbx, 64)
    elif cfg.comp_mask == 1:
        y = s3[:, 0, :].reshape(nby, nbx, 64)
        coeffs = (y,) + consts.frozen_coeffs          # (cb, cr) frozen
    elif cfg.comp_mask == 6:
        u = s3[:, 1, :].reshape(nby, nbx, 64)
        v = s3[:, 2, :].reshape(nby, nbx, 64)
        coeffs = (consts.frozen_coeffs[0], u, v)      # y frozen
    else:
        raise ValueError(f"unsupported comp_mask {cfg.comp_mask}")
    valid_hw = ((consts.valid_h, consts.valid_w) if cfg.bucketed
                else None)
    _, packed = _compare_coeffs_impl(
        coeffs, consts.pi0, consts.wtarget, w, h, cfg.factors, f,
        valid_hw=valid_hw, fused=cfg.fused and cfg.bucketed)
    dist = packed[0]
    wg = packed[1:].reshape(8, cfg.n_blocks)
    return dist, wg


# ---------------------------------------------------------------------------
# One refinement iteration.
# ---------------------------------------------------------------------------

def _iteration(carry: RefineCarry, consts: RefineConsts, cfg: RefineCfg,
               cumdb3, bits0, db3):
    nb, steps = cfg.n_blocks, cfg.steps
    up = carry.direction > 0
    t = jnp.arange(steps, dtype=jnp.int32)[None, :]
    n_col = carry.n[:, None]
    count_col = consts.cand_count[:, None]
    base_valid = jnp.where(up, (t >= n_col) & (t < count_col), t < n_col)

    # --- rblock selection (processor.cc:622-634: first non-empty) ---
    fallback = jnp.where(up, 1.0, 0.0).astype(jnp.float32)
    di = jnp.where(up, 0, 4)
    w_sel = jnp.zeros(nb, jnp.float32)
    tot_sel = jnp.int32(0)
    rb_sel = jnp.int32(0)
    for rb in range(4):
        w_rb = jnp.where(carry.first_up,
                         jnp.broadcast_to(fallback, (nb,)),
                         carry.w_grids[di + rb])
        tot_rb = jnp.sum(((w_rb > 0)[:, None] & base_valid)
                         .astype(jnp.int32))
        take = (tot_sel == 0) & (tot_rb > 0)
        w_sel = jnp.where(take, w_rb, w_sel)
        rb_sel = jnp.where(take, rb + 1, rb_sel)
        tot_sel = jnp.where(take, tot_rb, tot_sel)
    total = tot_sel

    # current size estimate (stateless from n; re-based on depth refresh)
    prev_bits3 = _bits_at(cumdb3, bits0, carry.n, nb)
    prev_size = _est_size(prev_bits3, consts)

    stop_now = (~up) & (prev_size.astype(jnp.float32)
                        > consts.stop_threshold)
    go = (total > 0) & ~stop_now

    def run(_):
        wpos = w_sel > 0
        valid = wpos[:, None] & base_valid
        wsafe = jnp.where(wpos, w_sel, 1.0)[:, None]
        raw = jnp.where(up, consts.cand_err - carry.mbe[:, None],
                        carry.mbe[:, None] - consts.cand_err)
        vals = jnp.where(valid, raw / wsafe, jnp.inf) + 0.0

        blocks_to_change = jnp.where(
            up,
            jnp.sum(((carry.n < consts.cand_count) & wpos)
                    .astype(jnp.int32)),
            jnp.sum(((carry.n > 0) & wpos).astype(jnp.int32)))

        dist_ok = carry.dist <= consts.target
        rel = jnp.where(up, jnp.where(dist_ok, 0.05, 0.01), 0.0005)
        min_size_delta = consts.base_size * rel
        cpb = jnp.where(up, 2.0, 0.2)
        min_coeffs = (cpb * blocks_to_change.astype(jnp.float32)
                      ).astype(jnp.int32)
        first_limit = jnp.sum(
            (vals < 0.75 * consts.block_limit).astype(jnp.int32))
        min_coeffs = jnp.where(carry.first_up & up,
                               jnp.maximum(min_coeffs, first_limit),
                               min_coeffs)

        # No sort, no rank gathers. vals are monotone along t inside each
        # block's valid window (the error curve is monotonicized), so the
        # applied set of ANY value threshold is a contiguous per-block t
        # window, and everything the stopping rule needs is a function of
        # per-block COUNTS:
        #   stage A bisects the order-preserving int32 encoding of the
        #     threshold value (class boundaries: j_b = #(enc <= e));
        #   stage B splits the boundary tie class by rank with the same
        #     block-major cum_eq rule as a stable sort.
        # The size estimate at per-block counts j is a masked window sum
        # over the per-candidate bit-delta grid — exact (int32) and
        # elementwise, replacing a full N*steps sort plus a 256-entry
        # gather per bisection probe.
        enc = _enc_f32(vals, valid)
        n_col_ = carry.n[:, None]

        def est_of_j(j):
            jc = j[:, None]
            win = jnp.where(up, valid & (t < n_col_ + jc),
                            valid & (t >= n_col_ - jc))
            d = jnp.sum(jnp.where(win[:, :, None], db3, 0), axis=(0, 1))
            return _est_size(prev_bits3 + jnp.where(up, d, -d), consts)

        def cond_j(m_, j):
            est = est_of_j(j)
            return ((m_ > min_coeffs)
                    & (jnp.abs(est - prev_size).astype(jnp.float32)
                       > min_size_delta))

        j_total = jnp.sum(valid, axis=1, dtype=jnp.int32)

        def cond_j_batch(m_, j):
            """(G,) candidate counts + (G, N) per-block windows -> (G,)
            bool conds — G probes evaluated in one batched pass."""
            jc = j[:, :, None]
            win = jnp.where(up,
                            valid[None] & (t[None] < n_col_[None] + jc),
                            valid[None] & (t[None] >= n_col_[None] - jc))
            d = jnp.sum(jnp.where(win[:, :, :, None], db3[None], 0),
                        axis=(1, 2))
            est = _est_size(prev_bits3[None] + jnp.where(up, d, -d),
                            consts)
            return ((m_ > min_coeffs)
                    & (jnp.abs(est - prev_size).astype(jnp.float32)
                       > min_size_delta))

        # Bisection with `levels` exact sequential steps per round: the
        # 2^levels - 1 probe points of every possible decision path are
        # the nested midpoints, precomputable from the round-start
        # interval, so one batched cond evaluation serves all levels and
        # the scalar decision tree walks it. Bit-identical to the plain
        # one-probe-per-round loop (each level's update is gated on the
        # interval still being open, exactly like the sequential while
        # condition).
        levels = max(1, int(cfg.bisect_group))
        n_probes = (1 << levels) - 1

        def _mid_list(a, b, d, two):
            mid = a + (b - a) // two
            if d == 1:
                return [mid]
            return (_mid_list(a, mid, d - 1, two) + [mid]
                    + _mid_list(mid, b, d - 1, two))

        def _grouped_bisect(lo0, hi0, eval_cond):
            one = jnp.asarray(1, lo0.dtype)
            two = jnp.asarray(2, lo0.dtype)

            def round_(lh):
                lo, hi = lh
                mids = jnp.stack(_mid_list(lo, hi, levels, two))
                c = eval_cond(mids)
                sel = jnp.int32((1 << (levels - 1)) - 1)
                step = 1 << max(levels - 2, 0)
                for lvl in range(levels):
                    upd = (hi - lo) > one
                    mid = mids[sel]
                    ck = c[sel]
                    lo = jnp.where(upd & ~ck, mid, lo)
                    hi = jnp.where(upd & ck, mid, hi)
                    if lvl < levels - 1:
                        sel = jnp.where(ck, sel - step, sel + step)
                        step = max(step // 2, 1)
                return lo, hi

            return jax.lax.while_loop(
                lambda lh: lh[1] - lh[0] > one, round_, (lo0, hi0))

        def with_bisect(_):
            def eval_a(mids):
                jm = jnp.sum(enc[None] <= mids[:, None, None], axis=2,
                             dtype=jnp.int32)
                return cond_j_batch(jnp.sum(jm, axis=1), jm)

            _, estar = _grouped_bisect(jnp.uint32(0),
                                       jnp.uint32(2 ** 32 - 1), eval_a)
            lt_b = jnp.sum(enc < estar, axis=1, dtype=jnp.int32)
            eq = enc == estar
            eq_b = jnp.sum(eq, axis=1, dtype=jnp.int32)
            m_lo = jnp.sum(lt_b)
            m_hi = m_lo + jnp.sum(eq_b)
            cum_eq = jnp.cumsum(eq_b) - eq_b          # exclusive

            def j_at_m(m_):
                extra = jnp.clip(m_ - m_lo - cum_eq, 0, eq_b)
                return lt_b + extra.astype(jnp.int32)

            def eval_b(mids):
                extra = jnp.clip(mids[:, None] - m_lo - cum_eq[None],
                                 0, eq_b[None])
                return cond_j_batch(mids, lt_b[None]
                                    + extra.astype(jnp.int32))

            _, m_ = _grouped_bisect(m_lo, m_hi, eval_b)
            vstar = jnp.min(jnp.where(eq, vals, jnp.inf))
            return m_, j_at_m(m_), vstar

        def no_bisect(_):
            vmax = jnp.max(jnp.where(valid, vals, -jnp.inf))
            return total, j_total, vmax

        m, j, val_threshold = jax.lax.cond(
            cond_j(total, j_total), with_bisect, no_bisect, operand=None)
        est_m = est_of_j(j)
        n_new = carry.n + jnp.where(up, j, -j)

        mbe_new = (carry.mbe + w_sel * val_threshold
                   * carry.direction.astype(jnp.float32))

        state = _state_from_n(n_new, consts, cfg)
        dist_new, wg_new = _compare_state(state, consts, cfg)

        score = _score_jpeg(dist_new, est_m, consts.target)
        better = score < carry.best_score
        new_carry = carry._replace(
            n=n_new, mbe=mbe_new, w_grids=wg_new, dist=dist_new,
            first_up=carry.first_up & ~up,
            iters_up=carry.iters_up + jnp.where(up, 1, 0),
            iters_down=carry.iters_down + jnp.where(up, 0, 1),
            best_score=jnp.where(better, score, carry.best_score),
            best_n=jnp.where(better, n_new, carry.best_n),
            best_dist=jnp.where(better, dist_new, carry.best_dist),
            best_est=jnp.where(better, est_m, carry.best_est),
            best_flag=carry.best_flag | better,
        )
        log = jnp.stack([
            jnp.float32(1.0), carry.direction.astype(jnp.float32),
            m.astype(jnp.float32), val_threshold,
            est_m.astype(jnp.float32), dist_new,
            rb_sel.astype(jnp.float32),
            blocks_to_change.astype(jnp.float32)])
        return new_carry, log

    def halt(_):
        new_carry = carry._replace(
            phase_done=jnp.bool_(True),
            stopped_early=carry.stopped_early | stop_now)
        return new_carry, jnp.zeros(8, jnp.float32)

    return jax.lax.cond(go, run, halt, operand=None)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def refine_chunk(carry: RefineCarry, consts: RefineConsts,
                 cfg: RefineCfg):
    """Runs up to cfg.k_iters refinement iterations on device. Returns
    (carry, logs (K, 8)) where each log row is [active, direction, m,
    val_threshold, est_size, dist, rblock, blocks_to_change]."""
    return _refine_chunk_impl(carry, consts, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def refine_chunk_batch(carrys: RefineCarry, constss: RefineConsts,
                       cfg: RefineCfg):
    """Cross-image batched chunk: every leaf of carrys/constss has a
    leading image axis (images must share cfg, i.e. the same size bucket
    and steps bucket). One device program runs all images' chunks in
    lockstep — per-op dispatch overhead is paid once per op for the whole
    group instead of once per image (the per-image tensors are far too
    small to saturate the VPU/MXU). Lanes whose phase is already done
    halt via _iteration's guard, so a mixed group costs the max, not the
    sum, of its members' live iterations."""
    return jax.vmap(lambda ca, co: _refine_chunk_impl(ca, co, cfg))(
        carrys, constss)


@functools.partial(jax.jit, static_argnames=("cfg",))
def refine_chunk_group(carrys: tuple, constss_nopi: tuple, pi0s,
                       cfg: RefineCfg):
    # NOT donated: the handler pads short groups by REPEATING the last
    # payload, so one buffer may appear in several lanes.
    """Batched chunk over a TUPLE of per-image trees: the lane
    stack/unstack happens INSIDE the compiled program. The eager
    per-flush `jax.tree.map(jnp.stack, ...)` + per-lane slicing this
    replaces cost ~100 dispatches over the axon link (~40 RefineConsts/
    RefineCarry leaf stacks + lanes x 15 carry-leaf slices, measured
    ~1.8 s per flush at 27 ms link latency vs 0.04 s of device work).
    pi0s: the stacked PsychoImage (cached across chunks by the handler
    — the planes never change, so they stay one device-resident stack).
    Returns (tuple of per-lane carries, pulled (B, ...))."""
    carry_b = jax.tree.map(lambda *xs: jnp.stack(xs), *carrys)
    consts_b = jax.tree.map(lambda *xs: jnp.stack(xs), *constss_nopi)
    consts_b = consts_b._replace(pi0=pi0s)
    carry_out, pulled = jax.vmap(
        lambda ca, co: _refine_chunk_impl(ca, co, cfg))(carry_b, consts_b)
    outs = tuple(jax.tree.map(lambda x: x[j], carry_out)
                 for j in range(len(carrys)))
    return outs, pulled


def _refine_chunk_impl(carry: RefineCarry, consts: RefineConsts,
                       cfg: RefineCfg):
    cumdb3, bits0 = _bits_curve(consts, cfg)
    db3 = cumdb3[:, 1:, :] - cumdb3[:, :-1, :]      # (N, steps, 3)
    logs0 = jnp.zeros((cfg.k_iters, 8), jnp.float32)

    def cond(state):
        carry, _, i = state
        return (~carry.phase_done) & (i < cfg.k_iters)

    def body(state):
        carry, logs, i = state
        carry, row = _iteration(carry, consts, cfg, cumdb3, bits0, db3)
        logs = jax.lax.dynamic_update_slice(logs, row[None, :],
                                            (i, jnp.int32(0)))
        return carry, logs, i + 1

    carry, logs, _ = jax.lax.while_loop(
        cond, body, (carry, logs0, jnp.int32(0)))
    # Everything the host needs after a chunk, packed into ONE array so
    # the chunk costs exactly one device->host round trip (each separate
    # np.asarray pays the full link latency; 4 scalar pulls per chunk
    # measured ~1.5 s over a whole encode on the axon tunnel).
    summary = jnp.stack([
        carry.phase_done.astype(jnp.float32),
        carry.stopped_early.astype(jnp.float32),
        carry.best_flag.astype(jnp.float32),
        carry.best_score, carry.best_dist, carry.dist,
        carry.iters_up.astype(jnp.float32),
        carry.iters_down.astype(jnp.float32)])
    pulled = jnp.concatenate([logs.reshape(-1), summary,
                              carry.n.astype(jnp.float32)])
    return carry, pulled


def unpack_chunk_result(pulled: np.ndarray, k_iters: int):
    """Host-side split of refine_chunk's packed result: (logs (K, 8),
    summary dict, n (N,) int32)."""
    from guetzli_tpu.metric.comparator import check_finite_distance
    buf = np.asarray(pulled)
    logs = buf[:k_iters * 8].reshape(k_iters, 8)
    s = buf[k_iters * 8:k_iters * 8 + 8]
    summary = {"phase_done": bool(s[0]), "stopped_early": bool(s[1]),
               "best_flag": bool(s[2]), "best_score": float(s[3]),
               "best_dist": float(s[4]),
               "dist": check_finite_distance(float(s[5]),
                                             "refine chunk distance"),
               "iters_up": int(s[6]), "iters_down": int(s[7])}
    n = buf[k_iters * 8 + 8:].astype(np.int32)
    return logs, summary, n


# ---------------------------------------------------------------------------
# Host-side helpers (numpy; chunk boundaries).
# ---------------------------------------------------------------------------

def state_from_n_np(init192: np.ndarray, cand_idx: np.ndarray,
                    cand_count: np.ndarray, prec: np.ndarray,
                    n: np.ndarray) -> np.ndarray:
    """Numpy twin of _state_from_n (serialization at chunk boundaries)."""
    nb, steps = cand_idx.shape
    t = np.arange(steps)[None, :]
    zero = (t < n[:, None]) & (t < cand_count[:, None]) & ~prec
    st = init192.reshape(nb, 192).copy()
    b, tt = np.nonzero(zero)
    st[b, cand_idx[b, tt]] = 0
    return st


def zeroing_order_tables(cand_idx: np.ndarray, cand_count: np.ndarray,
                         prec: np.ndarray):
    """Pass constants for the closed-form bit-delta curve:
    o (N, 3, 63) i32 — the candidate index that zeroes AC zigzag position
    p+1 of comp c (steps+1 when never: precious / not a candidate);
    kz (N, steps) i32 — each candidate's zigzag position."""
    nb, steps = cand_idx.shape
    zigpos = np.empty(64, np.int32)
    zigpos[NATURAL_ORDER] = np.arange(64)
    kz = zigpos[cand_idx % 64].astype(np.int32)
    o = np.full((nb, 3, 63), steps + 1, dtype=np.int32)
    o_nat = np.full((nb, 192), steps + 1, dtype=np.int32)
    valid = ((np.arange(steps)[None, :] < cand_count[:, None]) & ~prec)
    b, t = np.nonzero(valid)
    c = cand_idx[b, t] // 64
    pos = kz[b, t]
    o[b, c, pos - 1] = t
    o_nat[b, cand_idx[b, t]] = t
    return o, kz, o_nat


def precious_mask(cand_idx: np.ndarray, cand_count: np.ndarray,
                  orig: np.ndarray, precious_limit: np.ndarray
                  ) -> np.ndarray:
    """(N, steps) bool: candidates protected by the precious-coefficient
    guard (processor.cc:722-731; up direction only, but harmless for
    down since restoring an unchanged coefficient is a no-op)."""
    nb, steps = cand_idx.shape
    b = np.repeat(np.arange(nb), steps).reshape(nb, steps)
    c, k = cand_idx // 64, cand_idx % 64
    prec = (((k == 1) | (k == 8))
            & (np.abs(orig.reshape(nb, 3, 64)[b, c, k])
               >= precious_limit[b, c]))
    t = np.arange(steps)[None, :]
    return prec & (t < cand_count[:, None])
