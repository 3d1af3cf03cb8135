"""Top-level optimizer: quality-targeted JPEG search.

Reference: guetzli/processor.cc:539-930 (SelectFrequencyMasking,
ProcessJpegData, Process). Control flow (quant search -> per-block zeroing
order -> global up/down refinement, anytime best output) matches the
reference; the inner loops are vectorized:

- per-block zeroing: one vmapped device pass over every block (zeroing.py)
- candidate application: the first-M prefix of the sorted global order is
  applied in bulk; the stopping index M is found by binary search on the
  (monotone) entropy-size estimate instead of the reference's
  candidate-at-a-time scan with periodic Huffman refresh. The acceptance
  semantics (DistanceOK / ScoreJPEG / anytime best) are unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from guetzli_tpu.config import Params, ProcessStats
from guetzli_tpu.entropy import histogram as hstats
from guetzli_tpu.image.output_image import OutputImage
from guetzli_tpu.jpeg import reader, writer
from guetzli_tpu.jpeg.data import JPEGData, NATURAL_ORDER
from guetzli_tpu.metric.comparator import ButteraugliComparatorTPU, Comparator
from guetzli_tpu.ops.quantize import quantize_nearest
from guetzli_tpu.search import quant_search, zeroing
from guetzli_tpu.search.quality import butteraugli_score_for_quality
from guetzli_tpu.search.score import score_jpeg


@dataclasses.dataclass
class GuetzliOutput:
    jpeg_data: bytes = b""
    score: float = -1.0
    distmap_aggregate: float = 0.0


def _log(stats, msg):
    if stats is not None and stats.debug:
        print(msg, flush=True)


def remove_original_quantization(jpg: JPEGData) -> np.ndarray:
    """Dequantize coefficients in place, set all quant tables to 1
    (reference guetzli/processor.cc:82-95). Returns the original (3,64) q."""
    q_in = np.zeros((3, 64), dtype=np.int32)
    for i, c in enumerate(jpg.components):
        q = np.asarray(jpg.quant[c.quant_idx].values, dtype=np.int32)
        q_in[i] = q
        # int16 coefficients: |coeff*quant| <= 4096 is enforced by
        # check_jpeg_sanity, so this cannot overflow.
        c.coeffs = (c.coeffs.astype(np.int32) * q[None, :]).astype(np.int16)
    from guetzli_tpu.jpeg.data import save_quant_tables
    save_quant_tables(np.ones((3, 64), dtype=np.int32), jpg)
    return q_in


def check_jpeg_sanity(jpg: JPEGData) -> bool:
    for comp in jpg.components:
        q = np.asarray(jpg.quant[comp.quant_idx].values, dtype=np.int64)
        if np.any(np.abs(comp.coeffs.astype(np.int64) * q[None, :]) > 4096):
            return False
    return True


def is_grayscale(jpg: JPEGData) -> bool:
    return all(not np.any(c.coeffs) for c in jpg.components[1:3])


def has_ycbcr_color_space(jpg: JPEGData) -> bool:
    """Reference HasYCbCrColorSpace (guetzli/jpeg_data_decoder.cc): YCbCr
    unless JFIF absent and Adobe transform=0, or component ids say RGB."""
    for app in jpg.app_data:
        if len(app) >= 15 and app[0] == 0xEE and app[-1] == 0:
            # Adobe APP14 with transform=0 -> RGB
            return False
    ids = [c.id for c in jpg.components]
    if len(ids) == 3 and ids == [ord('R'), ord('G'), ord('B')]:
        return False
    return True


class Processor:
    def __init__(self):
        self.params: Params = Params()
        self.comparator: Optional[Comparator] = None
        self.final_output: Optional[GuetzliOutput] = None
        self.stats: Optional[ProcessStats] = None

    # ------------------------------------------------------------------
    def output_jpeg(self, jpg: JPEGData) -> bytes:
        return writer.serialize(jpg, strip_metadata=self.params.clear_metadata)

    def maybe_output(self, encoded_jpg: bytes) -> None:
        score = self.comparator.score_output_size(len(encoded_jpg))
        _log(self.stats, f" Score[{score:.4f}]")
        if score < self.final_output.score or self.final_output.score < 0:
            self.final_output.jpeg_data = encoded_jpg
            self.final_output.score = score

    # ------------------------------------------------------------------
    def try_quant_matrix(self, jpg_in: JPEGData, target_mul: float,
                         q: np.ndarray, img: OutputImage
                         ) -> quant_search.QuantData:
        data = quant_search.QuantData(q=q.copy())
        img.copy_from_jpeg_data(jpg_in)
        img.apply_global_quantization(q)
        encoded = self.output_jpeg(img.save_to_jpeg_data())
        self.stats.num_iterations += 1
        _log(self.stats,
             f"Iter {self.stats.num_iterations}: {img.frame_type_str()} "
             f"GQ[{quant_search.quant_matrix_heuristic_score(q):5.2f}] "
             f"Out[{len(encoded)}]")
        self.comparator.compare(img)
        data.dist_ok = self.comparator.distance_ok(target_mul)
        data.jpg_size = len(encoded)
        self.maybe_output(encoded)
        return data

    def select_quant_matrix(self, jpg_in: JPEGData, downsample: bool,
                            q_init: np.ndarray, img: OutputImage
                            ) -> (bool, np.ndarray):
        qgen = quant_search.QuantMatrixGenerator(downsample)
        target_mul_high, target_mul_low = 0.97, 0.95
        best = self.try_quant_matrix(jpg_in, target_mul_high, q_init, img)
        while True:
            q_next = qgen.get_next()
            if q_next is None:
                break
            data = self.try_quant_matrix(jpg_in, target_mul_high, q_next,
                                         img)
            qgen.add(data)
            if quant_search.better_quant_data(data, best):
                best = data
                if data.dist_ok and not self.comparator.distance_ok(
                        target_mul_low):
                    break
        return best.dist_ok, best.q

    # ------------------------------------------------------------------
    # Entropy-size estimation helpers (reference processor.cc:471-536).

    @staticmethod
    def _ac_histograms(divided: np.ndarray) -> List[np.ndarray]:
        """divided: (N, C, 64) quant-divided coeffs -> per-channel AC
        histograms (x2 counting + sentinel)."""
        out = []
        for c in range(divided.shape[1]):
            zz = divided[:, c, :][:, NATURAL_ORDER]
            s = hstats.component_symbol_stream(zz)
            h = hstats.new_histogram()
            np.add.at(h, s.ac_symbols, 2)
            out.append(h)
        return out

    @staticmethod
    def _dc_histograms(divided: np.ndarray) -> List[np.ndarray]:
        out = []
        for c in range(divided.shape[1]):
            dc = divided[:, c, 0]
            diff = np.diff(dc, prepend=0)
            nbits = hstats.nbits_for(diff)
            h = hstats.new_histogram()
            np.add.at(h, nbits, 2)
            out.append(h)
        return out

    @staticmethod
    def _entropy_size(ac_histos: List[np.ndarray]) -> int:
        """ComputeEntropyCodes + EntropyCodedDataSize combined: DHT header
        bytes + entropy-coded bytes for the clustered AC codes."""
        clustered, indexes, depths, _ = writer._cluster_histograms(ac_histos)
        header = sum(hstats.histogram_header_cost(h) // 8 for h in clustered)
        bits = sum(hstats.histogram_entropy_cost(ac_histos[i],
                                                 depths[indexes[i]])
                   for i in range(len(ac_histos)))
        return header + (bits + 7) // 8

    # ------------------------------------------------------------------
    def select_frequency_masking(self, jpg: JPEGData, img: OutputImage,
                                 comp_mask: int, target_mul: float,
                                 stop_early: bool) -> None:
        """444 path (comp_mask=7, factors 1): vmapped zeroing + refinement.
        (4:2:0 passes comp_mask 1 and 6; supported via the same machinery
        once factor-2 tiles land.)"""
        assert comp_mask == 7, "4:2:0 masking passes not yet wired"
        width, height = img.width, img.height
        nbx = -(-width // 8)
        nby = -(-height // 8)
        num_blocks = nbx * nby

        comps = img.components
        quant = np.stack([c.quant for c in comps])          # (3, 64)

        cur = jnp.stack([c.coeffs.reshape(num_blocks, 64)
                         for c in comps], axis=1)           # (N, 3, 64)
        orig = np.stack(
            [jpg.components[c].coeffs.reshape(
                jpg.components[c].height_in_blocks,
                jpg.components[c].width_in_blocks, 64)[:nby, :nbx]
             .reshape(num_blocks, 64) for c in range(3)], axis=1)

        # --- per-block zeroing order (one batched device pass) ---
        self.comparator.start_block_comparisons()
        mask3 = self.comparator.corner_masks(1, 1).reshape(num_blocks, 3)
        xyb0 = self.comparator.original_block_opsin().reshape(
            num_blocks, 3, 8, 8)
        vw = np.minimum(width - 8 * (np.arange(num_blocks) % nbx), 8)
        vh = np.minimum(height - 8 * (np.arange(num_blocks) // nbx), 8)

        n_cand = int(np.max(np.sum(
            (np.asarray(cur).reshape(num_blocks, 192) != 0)
            & (np.arange(192) % 64 != 0)[None, :], axis=1), initial=1))
        steps = max(8, -(-n_cand // 16) * 16)
        idx_seq, err_seq, counts = zeroing.compute_zeroing_order_batch(
            cur, jnp.asarray(orig), xyb0, mask3,
            jnp.asarray(vw, jnp.int32), jnp.asarray(vh, jnp.int32),
            self.comparator.block_error_limit(),
            steps, self.params.zeroing_greedy_lookahead)
        self.comparator.finish_block_comparisons()
        cand_idx = np.asarray(idx_seq)                      # (N, steps)
        cand_err = np.asarray(err_seq)
        cand_count = np.asarray(counts)                     # (N,)

        # --- base size estimate ---
        state = np.asarray(cur).copy()                      # (N, 3, 64)
        divided = state // quant[None]
        jpg_out = img.save_to_jpeg_data()
        jpg_header_size = hstats.jpeg_header_size(
            jpg_out, self.params.clear_metadata)
        dc_size = writer.cluster_histograms_cost(
            self._dc_histograms(divided))
        ac_histos = self._ac_histograms(divided)
        base_size = jpg_header_size + dc_size + self._entropy_size(ac_histos)
        prev_size = base_size

        max_block_error = np.zeros(num_blocks, dtype=np.float64)
        last_indexes = np.zeros(num_blocks, dtype=np.int64)
        first_up_iter = True

        orig_div_quant = np.asarray(quantize_nearest(
            jnp.asarray(orig.reshape(num_blocks, 3, 64)),
            jnp.asarray(quant[None])))                      # requantized orig

        # precious guard precomputation (processor.cc:722-731)
        sum_of_hf = np.zeros((num_blocks, 3))
        hf_sel = np.array([i for i in range(64)
                           if not ((i & 7) < 3 and i < 24) and i >= 3])
        sum_of_hf = np.abs(orig[:, :, hf_sel]).sum(axis=2)  # (N, 3)
        precious_limit = np.where(sum_of_hf < 60, 4, 8)     # (N, 3)

        for direction in (1, -1):
            while True:
                if stop_early and direction == -1:
                    if prev_size > 1.01 * len(self.final_output.jpeg_data):
                        break
                # --- global order ---
                global_blocks = None
                block_weight = None
                for rblock in range(1, 5):
                    distmap = (self.comparator.distmap()
                               if not first_up_iter else
                               jnp.zeros((height, width), jnp.float32))
                    bw = np.asarray(
                        self.comparator.
                        compute_block_error_adjustment_weights(
                            direction, rblock, target_mul, 1, 1, distmap)
                    ).reshape(-1)
                    block_weight = bw
                    gb, gv, blocks_to_change = self._build_global_order(
                        direction, bw, cand_err, cand_count, last_indexes,
                        max_block_error)
                    if len(gb):
                        global_blocks, global_vals = gb, gv
                        break
                if global_blocks is None or not len(global_blocks):
                    break
                order = np.argsort(global_vals, kind="stable")
                global_blocks = global_blocks[order]
                global_vals = global_vals[order]

                rel_size_delta = 0.01 if direction > 0 else 0.0005
                if direction > 0 and self.comparator.distance_ok(1.0):
                    rel_size_delta = 0.05
                min_size_delta = base_size * rel_size_delta
                coeffs_per_block = 2.0 if direction > 0 else 0.2
                min_coeffs = int(coeffs_per_block * blocks_to_change)
                if first_up_iter:
                    limit = 0.75 * self.comparator.block_error_limit()
                    min_coeffs = max(min_coeffs,
                                     int(np.searchsorted(global_vals,
                                                         limit, "left")))
                    first_up_iter = False

                m, est_size, state, divided, ac_histos = \
                    self._apply_candidates(
                        direction, global_blocks, state, quant,
                        cand_idx, last_indexes, orig.reshape(
                            -1, 3, 64), orig_div_quant,
                        precious_limit, min_coeffs, min_size_delta,
                        prev_size, jpg_header_size, dc_size)
                if m == 0:
                    break
                val_threshold = global_vals[m - 1]
                applied = np.bincount(global_blocks[:m],
                                      minlength=num_blocks)
                last_indexes += direction * applied
                max_block_error += block_weight * val_threshold * direction

                self.stats.num_iterations += 1
                if direction > 0:
                    self.stats.num_iterations_up += 1
                else:
                    self.stats.num_iterations_down += 1

                # push new state into the image + true output
                for c in range(3):
                    img.components[c].coeffs = jnp.asarray(
                        state[:, c, :].reshape(nby, nbx, 64))
                encoded = self.output_jpeg(img.save_to_jpeg_data())
                self.comparator.compare(img)
                _log(self.stats,
                     f"Iter {self.stats.num_iterations}: "
                     f"{'up' if direction > 0 else 'down'} "
                     f"Coeffs[{m}] ValThres[{val_threshold:.4f}] "
                     f"Out[{len(encoded)}] D[{self.comparator.distance:.4f}]")
                self.maybe_output(encoded)
                prev_size = est_size

    @staticmethod
    def _build_global_order(direction, block_weight, cand_err, cand_count,
                            last_indexes, max_block_error):
        """Vectorized global-order construction
        (reference processor.cc:636-663)."""
        num_blocks, steps = cand_err.shape
        t = np.arange(steps)[None, :]
        w = block_weight[:, None]
        if direction > 0:
            sel = ((t >= last_indexes[:, None])
                   & (t < cand_count[:, None]) & (w > 0))
            vals = (cand_err - max_block_error[:, None]) / np.where(
                w > 0, w, 1.0)
            blocks_to_change = int(np.sum(
                (last_indexes < cand_count) & (block_weight > 0)))
        else:
            sel = (t < last_indexes[:, None]) & (w > 0)
            vals = (max_block_error[:, None] - cand_err) / np.where(
                w > 0, w, 1.0)
            blocks_to_change = int(np.sum(
                (last_indexes > 0) & (block_weight > 0)))
        b, tt = np.nonzero(sel)
        return b, vals[b, tt], blocks_to_change

    def _apply_candidates(self, direction, global_blocks, state, quant,
                          cand_idx, last_indexes, orig, orig_requant,
                          precious_limit, min_coeffs, min_size_delta,
                          prev_size, jpg_header_size, dc_size):
        """Applies the first M candidates of the global order, choosing M
        by binary search on the entropy-size estimate (reference
        processor.cc:704-750 applied candidates one-at-a-time)."""
        total = len(global_blocks)

        def apply_first(m):
            st = state.copy()
            if m == 0:
                return st, None, prev_size
            blocks = global_blocks[:m]
            # per-block count applied
            cnt = np.bincount(blocks, minlength=state.shape[0])
            touched = np.nonzero(cnt)[0]
            for b in touched:
                li = last_indexes[b]
                k = cnt[b]
                if direction > 0:
                    sel = cand_idx[b, li:li + k]
                    for idx in sel:
                        c, kk = idx // 64, idx % 64
                        # precious guard: don't zero strong k=1/k=8 coeffs
                        # (reference processor.cc:722-731)
                        prec = (kk in (1, 8)) and (
                            abs(orig[b, c, kk]) >= precious_limit[b, c])
                        if not prec:
                            st[b, c, kk] = 0
                else:
                    sel = cand_idx[b, li - k:li][::-1]
                    for idx in sel:
                        c, kk = idx // 64, idx % 64
                        st[b, c, kk] = orig_requant[b, c, kk]
            div = st // quant[None]
            ac = self._ac_histograms(div)
            est = jpg_header_size + dc_size + self._entropy_size(ac)
            return st, ac, est

        def cond(m):
            if m == 0:
                return False
            _, _, est = apply_first(m)
            return (m > min_coeffs
                    and abs(est - prev_size) > min_size_delta)

        # binary search the smallest m satisfying cond; if none, m = total.
        lo, hi = 1, total
        if not cond(total):
            m = total
        else:
            while lo < hi:
                mid = (lo + hi) // 2
                if cond(mid):
                    hi = mid
                else:
                    lo = mid + 1
            m = lo
        st, ac, est = apply_first(m)
        if ac is None:
            div = st // quant[None]
            ac = self._ac_histograms(div)
            est = jpg_header_size + dc_size + self._entropy_size(ac)
        return m, est, st, st // quant[None], ac

    # ------------------------------------------------------------------
    def process_jpeg_data(self, params: Params, jpg_in: JPEGData,
                          comparator: Optional[Comparator],
                          out: GuetzliOutput, stats: ProcessStats) -> bool:
        self.params = params
        self.comparator = comparator
        self.final_output = out
        self.stats = stats

        if params.butteraugli_target > 2.0:
            raise ValueError(
                "quality must be >= 84 (butteraugli target <= 2.0)")
        if len(jpg_in.components) != 3 or not has_ycbcr_color_space(jpg_in):
            raise ValueError("only 3-component YCbCr input supported")
        if jpg_in.is_444():
            input_is_420 = False
        elif jpg_in.is_420():
            input_is_420 = True
        else:
            raise ValueError("unsupported sampling factors")

        encoded = self.output_jpeg(jpg_in)
        out.score = -1
        if comparator is None:
            # image too small for butteraugli: pass through
            out.jpeg_data = encoded
            out.score = len(encoded)
            return True

        import copy
        jpg = copy.deepcopy(jpg_in)
        q_in = remove_original_quantization(jpg)
        img = OutputImage(jpg.width, jpg.height)
        img.copy_from_jpeg_data(jpg)
        comparator.compare(img)
        self.maybe_output(encoded)

        try_420 = 1 if (input_is_420 or params.force_420
                        or (params.try_420 and not is_grayscale(jpg_in))
                        ) else 0
        force_420 = 1 if (input_is_420 or params.force_420) else 0
        for downsample in range(force_420, try_420 + 1):
            jpg = copy.deepcopy(jpg_in)
            q_in = remove_original_quantization(jpg)
            img = OutputImage(jpg.width, jpg.height)
            img.copy_from_jpeg_data(jpg)
            if downsample:
                raise NotImplementedError("4:2:0 path lands next")
            ok, best_q = self.select_quant_matrix(jpg, downsample != 0,
                                                  q_in, img)
            if not ok:
                best_q = np.ones((3, 64), dtype=np.int32)
            img.copy_from_jpeg_data(jpg)
            img.apply_global_quantization(best_q)
            if not downsample:
                self.select_frequency_masking(jpg, img, 7, 1.0, False)
            else:
                ymul = 0.97
                self.select_frequency_masking(jpg, img, 1, ymul, False)
                self.select_frequency_masking(jpg, img, 6, 1.0, True)
        return True


def process_jpeg_bytes(params: Params, stats: ProcessStats,
                       data: bytes) -> bytes:
    """JPEG-input entry (reference Process, processor.cc:890-912)."""
    jpg = reader.parse(data)
    if not check_jpeg_sanity(jpg):
        raise ValueError("unexpectedly large coefficient values in input")
    img = OutputImage(jpg.width, jpg.height)
    import copy
    jc = copy.deepcopy(jpg)
    remove_original_quantization(jc)
    img.copy_from_jpeg_data(jc)
    rgb = np.asarray(img.to_srgb()).transpose(1, 2, 0).astype(np.uint8)
    return _run(params, stats, jpg, rgb)


def process_rgb(params: Params, stats: ProcessStats,
                rgb: np.ndarray) -> bytes:
    """PNG/RGB-input entry (reference Process, processor.cc:926-958)."""
    from guetzli_tpu.jpeg.encoder import encode_rgb_to_jpeg_data
    h, w = rgb.shape[:2]
    jpg = encode_rgb_to_jpeg_data(rgb)
    return _run(params, stats, jpg, rgb)


def _run(params: Params, stats: ProcessStats, jpg: JPEGData,
         rgb: np.ndarray) -> bytes:
    h, w = jpg.height, jpg.width
    comparator = None
    if w >= 32 and h >= 32:
        comparator = ButteraugliComparatorTPU(
            rgb, params.butteraugli_target, stats)
    out = GuetzliOutput()
    Processor().process_jpeg_data(params, jpg, comparator, out, stats)
    return out.jpeg_data


def process(rgb_or_jpeg, quality: float = 95.0,
            params: Optional[Params] = None,
            stats: Optional[ProcessStats] = None) -> bytes:
    """Convenience entry: uint8 (H, W, 3) array or JPEG bytes -> optimized
    JPEG bytes."""
    params = params or Params()
    params.butteraugli_target = butteraugli_score_for_quality(quality)
    stats = stats or ProcessStats()
    if isinstance(rgb_or_jpeg, (bytes, bytearray)):
        return process_jpeg_bytes(params, stats, bytes(rgb_or_jpeg))
    return process_rgb(params, stats, np.asarray(rgb_or_jpeg))
