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

from guetzli_tpu import native
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


import os as _os
_PARANOID = bool(_os.environ.get("GUETZLI_TPU_PARANOID"))
# Legacy round-1 refinement (one host-driven device call per iteration)
# for A/B debugging; the default is the on-device chunked engine.
_HOST_REFINE = bool(_os.environ.get("GUETZLI_TPU_HOST_REFINE"))
# Phase timing to stderr (perf diagnosis): GUETZLI_TPU_TIMING=1
_TIMING = bool(_os.environ.get("GUETZLI_TPU_TIMING"))
# Sequential (non-speculative) quant search for A/B debugging.
_SEQ_QUANT = bool(_os.environ.get("GUETZLI_TPU_SEQ_QUANT"))


class _Phase:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        import time as _t
        self.t0 = _t.time()
        return self

    def __exit__(self, *a):
        import time as _t
        import sys as _sys
        if _TIMING:
            _sys.stderr.write(
                f"[timing] {self.name}: {_t.time() - self.t0:.3f}s\n")


def _log(stats, msg):
    from guetzli_tpu.config import print_debug
    if stats is not None and stats.debug:
        print_debug(stats, msg + "\n")


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
    def __init__(self, batcher=None):
        self.params: Params = Params()
        self.comparator: Optional[Comparator] = None
        self.final_output: Optional[GuetzliOutput] = None
        self.stats: Optional[ProcessStats] = None
        self.batcher = batcher  # cross-image device-call batching

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
        # dispatch the compare first: the device evaluates while the host
        # serializes (true output size for MaybeOutput)
        finalize = self.comparator.compare_coeffs_async(
            [c.coeffs for c in img.components],
            [c.factor_x for c in img.components], 1, target_mul)
        encoded = self.output_jpeg(img.save_to_jpeg_data())
        self.stats.num_iterations += 1
        if self.stats.debug:
            from guetzli_tpu.config import log_quant
            _log(self.stats,
                 f"Iter {self.stats.num_iterations:2d}: "
                 f"{img.frame_type_str()} quantization matrix:")
            log_quant(self.stats, q)
        _log(self.stats,
             f"Iter {self.stats.num_iterations}: {img.frame_type_str()} "
             f"GQ[{quant_search.quant_matrix_heuristic_score(q):5.2f}] "
             f"Out[{len(encoded)}]")
        finalize()
        data.dist_ok = self.comparator.distance_ok(target_mul)
        data.jpg_size = len(encoded)
        self.maybe_output(encoded)
        return data

    def select_quant_matrix(self, jpg_in: JPEGData, downsample: bool,
                            q_init: np.ndarray, img: OutputImage
                            ) -> (bool, np.ndarray):
        """Quant-matrix search (reference SelectQuantMatrix,
        processor.cc:328-360). Default: speculative tree evaluation —
        the generator's next candidates for every DistanceOK outcome are
        scored in one batched device call (compare_requant_batch), so the
        ~9 sequential tunnel round trips of the one-at-a-time protocol
        collapse to ~ceil(levels/depth). Candidate visit order, logging
        and acceptance are identical to the sequential path
        (GUETZLI_TPU_SEQ_QUANT=1 restores it)."""
        from guetzli_tpu.metric.comparator import _BUCKETS
        if not _BUCKETS or _SEQ_QUANT:
            return self._select_quant_matrix_seq(jpg_in, downsample,
                                                 q_init, img)
        qgen = quant_search.QuantMatrixGenerator(downsample)
        target_mul_high, target_mul_low = 0.97, 0.95

        img.copy_from_jpeg_data(jpg_in)
        self.comparator.quant_search_begin(
            [c.coeffs for c in img.components],
            [c.factor_x for c in img.components])
        # deeper speculation while per-compare device cost is small
        from guetzli_tpu.metric.fused_pallas import quant_search_nslots
        nslots = quant_search_nslots(self.comparator.hb,
                                     self.comparator.wb)
        depth = 3 if nslots == 8 else 2

        def finish(q, dist) -> quant_search.QuantData:
            """Host half of a visited candidate: serialization for the
            true size, stats/logging, MaybeOutput — try_quant_matrix
            minus the device work."""
            data = quant_search.QuantData(q=q.copy())
            self.comparator.distance = float(dist)
            img.copy_from_jpeg_data(jpg_in)
            img.apply_global_quantization(q)
            encoded = self.output_jpeg(img.save_to_jpeg_data())
            self.stats.num_iterations += 1
            if self.stats.debug:
                from guetzli_tpu.config import log_quant, print_debug
                _log(self.stats,
                     f"Iter {self.stats.num_iterations:2d}: "
                     f"{img.frame_type_str()} quantization matrix:")
                log_quant(self.stats, q)
            _log(self.stats,
                 f"Iter {self.stats.num_iterations}: "
                 f"{img.frame_type_str()} "
                 f"GQ[{quant_search.quant_matrix_heuristic_score(q):5.2f}] "
                 f"Out[{len(encoded)}]")
            if self.stats.debug:
                from guetzli_tpu.config import print_debug
                print_debug(self.stats,
                            f" BA D[{self.comparator.distance:.4f}]\n")
            data.dist_ok = self.comparator.distance_ok(target_mul_high)
            data.jpg_size = len(encoded)
            self.maybe_output(encoded)
            return data

        best = None
        extra = q_init          # evaluated once, never fed to the generator
        stop = False
        while not stop:
            tree = quant_search.speculative_tree(qgen, depth)
            nodes = sorted(
                ((p, q) for p, q in tree.items() if q is not None),
                key=lambda pq: (len(pq[0]), pq[0]))
            slots = ([(None, extra)] if extra is not None else []) + nodes
            slots = slots[:nslots]
            if not slots:
                break
            qb = np.zeros((nslots, 3, 64), np.int32)
            for i, (_, q) in enumerate(slots):
                qb[i] = q
            for i in range(len(slots), nslots):
                qb[i] = slots[0][1]
            dists = self.comparator.compare_requant_batch(qb)
            slot_of = {p: i for i, (p, _) in enumerate(slots)}
            if extra is not None:
                best = finish(extra, dists[slot_of[None]])
                extra = None
            path = ()
            while True:
                if tree.get(path, False) is None:
                    stop = True              # generator exhausted
                    break
                if path not in slot_of:
                    break                    # deeper than this batch
                q_real = qgen.get_next()
                if q_real is None:
                    stop = True
                    break
                assert np.array_equal(q_real, tree[path]), \
                    "speculative quant tree diverged from the generator"
                data = finish(q_real, dists[slot_of[path]])
                qgen.add(data)
                if quant_search.better_quant_data(data, best):
                    best = data
                    if data.dist_ok and not self.comparator.distance_ok(
                            target_mul_low):
                        stop = True
                        break
                path = path + (data.dist_ok,)
        return best.dist_ok, best.q

    def _select_quant_matrix_seq(self, jpg_in: JPEGData, downsample: bool,
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
    def _entropy_size(ac_histos: List[np.ndarray]) -> int:
        """ComputeEntropyCodes + EntropyCodedDataSize combined: DHT header
        bytes + entropy-coded bytes for the clustered AC codes."""
        from guetzli_tpu import native
        if native.available():
            return int(native.entropy_size(ac_histos))
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
        """One masking pass: comp_mask=7 (444), 1 (420 luma) or
        6 (420 chroma). Reference guetzli/processor.cc:539-780."""
        width, height = img.width, img.height
        mask_comps = [c for c in range(3) if comp_mask & (1 << c)]
        last_c = mask_comps[-1]
        if last_c >= len(jpg.components):
            return  # grayscale: no chroma pass (reference :546-547)
        factor = img.components[last_c].factor_x
        nbx = -(-width // (8 * factor))
        nby = -(-height // (8 * factor))
        num_blocks = nbx * nby

        comps = img.components
        quant = np.stack([c.quant for c in comps])          # (3, 64)

        _tp = _Phase("sfm_prep"); _tp.__enter__()
        cur = np.zeros((num_blocks, 3, 64), dtype=np.int32)
        orig = np.zeros((num_blocks, 3, 64), dtype=np.int32)
        for c in mask_comps:
            cur[:, c, :] = np.asarray(comps[c].coeffs).reshape(
                num_blocks, 64)
            jc = jpg.components[c]
            orig[:, c, :] = jc.coeffs.reshape(
                jc.height_in_blocks, jc.width_in_blocks,
                64)[:nby, :nbx].reshape(num_blocks, 64)

        _tp.__exit__()
        # --- per-block zeroing order (one batched device pass) ---
        with _Phase("zeroing_prep_masks"):
            self.comparator.start_block_comparisons()
        lookahead = self.params.zeroing_greedy_lookahead
        limit = self.comparator.block_error_limit()
        in_mask = np.repeat([(comp_mask >> c) & 1 for c in range(3)],
                            64).astype(bool)
        nvalid_blocks = np.sum(
            (cur.reshape(num_blocks, 192) != 0)
            & ((np.arange(192) % 64 != 0) & in_mask)[None, :], axis=1)
        n_cand = int(np.max(nvalid_blocks, initial=1))
        # Rounded up to a 64-multiple so concurrent images in batch mode
        # land in the same compiled zeroing variant (padding is inert: the
        # extra greedy steps are inactive and their errors stay +inf).
        steps = max(64, -(-n_cand // 64) * 64)

        if comp_mask == 7:
            mask3 = self.comparator.corner_masks().reshape(
                num_blocks, 3)
            xyb0 = self.comparator.original_block_opsin().reshape(
                num_blocks, 3, 8, 8)
            vw = np.minimum(width - 8 * (np.arange(num_blocks) % nbx), 8)
            vh = np.minimum(height - 8 * (np.arange(num_blocks) // nbx), 8)
            zargs = (jnp.asarray(cur), jnp.asarray(orig), xyb0, mask3,
                     jnp.asarray(vw, jnp.int32), jnp.asarray(vh, jnp.int32))
        elif comp_mask == 1:
            zargs = self._zeroing_420_luma(img, cur, orig, nbx, nby)
        elif comp_mask == 6:
            zargs = self._zeroing_420_chroma(img, cur, orig, nbx, nby)
        else:
            raise ValueError(f"unsupported comp_mask {comp_mask}")
        _tz = _Phase("zeroing_pass"); _tz.__enter__()
        if getattr(self, "batcher", None) is not None:
            from guetzli_tpu.parallel import runtime as prt
            spm = prt.current_sp_mesh()
            placement = (None if spm is None else
                         tuple(d.id for d in spm.devices.flat))
            idx_seq, err_seq, counts = self.batcher.submit("zeroing", {
                "comp_mask": comp_mask, "args": zargs,
                "limit": float(limit), "steps": steps,
                "lookahead": lookahead, "n": num_blocks,
                "n_valid": nvalid_blocks,
                "placement": placement,
                "new_model": self.params.new_zeroing_model})
        else:
            kernel = {7: zeroing.compute_zeroing_order_batch,
                      1: zeroing.compute_zeroing_order_420_luma,
                      6: zeroing.compute_zeroing_order_420_chroma}[comp_mask]
            idx_seq, err_seq, counts = zeroing.run_chunked(
                kernel, zargs, limit, steps, lookahead,
                n_valid=nvalid_blocks,
                new_model=self.params.new_zeroing_model)
        self.comparator.finish_block_comparisons()
        _tz.__exit__()
        cand_idx = np.asarray(idx_seq)                      # (N, steps)
        cand_err = np.asarray(err_seq)
        cand_count = np.asarray(counts)                     # (N,)

        # --- base size estimate ---
        state = cur.copy()                                  # (N, 3, 64)
        jpg_out = img.save_to_jpeg_data()
        jpg_header_size = hstats.jpeg_header_size(
            jpg_out, self.params.clear_metadata)
        from guetzli_tpu import native
        use_native = native.available()
        dc_histos = []
        out_zz = []
        out_ac_hist = []
        for comp in jpg_out.components:
            order = hstats.mcu_block_order(comp, jpg_out)
            zz = np.ascontiguousarray(
                comp.coeffs[order][:, NATURAL_ORDER], dtype=np.int32)
            out_zz.append(zz)
            if use_native:
                dch, ach = native.component_histograms(zz)
            else:
                st = hstats.component_symbol_stream(zz)
                dch = hstats.new_histogram()
                np.add.at(dch, st.dc_symbols, 2)
                ach = hstats.new_histogram()
                np.add.at(ach, st.ac_symbols, 2)
            dc_histos.append(dch)
            out_ac_hist.append(ach)
        dc_size = writer.cluster_histograms_cost(dc_histos)
        # Frozen AC histograms for components outside the mask, and the
        # constant padding-block EOB contribution for masked components
        # (padding blocks in the MCU grid always encode as one EOB).
        frozen_ac = {}
        pad_eob = {}
        for ci, ach in enumerate(out_ac_hist):
            if ci in mask_comps:
                n_out_blocks = (jpg_out.components[ci].height_in_blocks
                                * jpg_out.components[ci].width_in_blocks)
                pad_eob[ci] = n_out_blocks - num_blocks
            else:
                frozen_ac[ci] = ach
        n_out_comps = len(jpg_out.components)

        def block_hists(zz):
            """(T, 64) zigzag coeffs -> (T, 256) AC histograms."""
            if use_native:
                return native.block_ac_histograms(zz)
            st = hstats.component_symbol_stream(zz)
            pb = np.zeros((zz.shape[0], 256), dtype=np.int64)
            np.add.at(pb, (st.ac_block_id, st.ac_symbols), 2)
            return pb

        def make_incremental(st):
            """Full per-comp AC histograms of st plus per-block histogram
            contributions (so a candidate application only re-streams the
            touched blocks — the in-loop size estimate is O(touched), not
            O(all blocks), per evaluation)."""
            div = st // quant[None]
            perblock = {}
            histos = []
            for ci in range(n_out_comps):
                if ci in frozen_ac:
                    histos.append(frozen_ac[ci].copy())
                    continue
                pb = block_hists(div[:, ci, :][:, NATURAL_ORDER])
                h = hstats.new_histogram()
                h[:256] += pb.sum(axis=0)
                h[0] += 2 * pad_eob.get(ci, 0)
                perblock[ci] = pb
                histos.append(h)
            return histos, perblock

        def total_histos(st):
            """Per-comp TOTAL histograms of st — the chunk-boundary
            entropy refresh needs no per-block materialization (native
            path is one strided C pass per comp; ~4x cheaper than
            make_incremental on a 1-core host)."""
            if not use_native:
                return make_incremental(st)[0]
            histos = []
            for ci in range(n_out_comps):
                if ci in frozen_ac:
                    histos.append(frozen_ac[ci].copy())
                    continue
                h = hstats.new_histogram()
                h[:256] += native.total_ac_hist_nat(st, ci, quant[ci])
                h[0] += 2 * pad_eob.get(ci, 0)
                histos.append(h)
            return histos

        def entropy_with_touched(histos_base, perblock, touched, new_rows):
            """Entropy size of (base state with rows `touched` replaced by
            new_rows)."""
            div_new = new_rows // quant[None]
            histos = []
            for ci in range(n_out_comps):
                if ci in frozen_ac:
                    histos.append(frozen_ac[ci].copy())
                    continue
                h = histos_base[ci].copy()
                if use_native:
                    h[:256] += native.delta_hist(perblock[ci], touched,
                                                 div_new[:, ci, :])
                else:
                    pb_new = block_hists(div_new[:, ci, :][:, NATURAL_ORDER])
                    h[:256] += (pb_new.sum(axis=0)
                                - perblock[ci][touched].sum(axis=0))
                histos.append(h)
            return self._entropy_size(histos)

        def update_incremental(histos_base, perblock, touched, new_rows):
            """Commit an accepted candidate application into the persistent
            incremental structures (so the next iteration skips the full
            O(all blocks) rebuild)."""
            div_new = new_rows // quant[None]
            for ci in range(n_out_comps):
                if ci in frozen_ac:
                    continue
                if use_native:
                    native.commit_hist(perblock[ci], touched,
                                       div_new[:, ci, :], histos_base[ci])
                else:
                    pb_new = block_hists(div_new[:, ci, :][:, NATURAL_ORDER])
                    histos_base[ci][:256] += (
                        pb_new.sum(axis=0)
                        - perblock[ci][touched].sum(axis=0))
                    perblock[ci][touched] = pb_new

        _tb = _Phase("sfm_basesize"); _tb.__enter__()
        inc_histos, inc_perblock = make_incremental(state)
        base_size = jpg_header_size + dc_size + self._entropy_size(inc_histos)
        prev_size = base_size
        _log(self.stats,
             f"[mask {comp_mask}] GQ[{quant_search.quant_matrix_heuristic_score(quant):.2f}] "
             f"candidates={int(cand_count.sum())} steps={steps} "
             f"base={base_size}")

        _tb.__exit__()
        # precious guard precomputation (processor.cc:722-731)
        hf_sel = np.array([i for i in range(64)
                           if not ((i & 7) < 3 and i < 24) and i >= 3])
        sum_of_hf = np.abs(orig[:, :, hf_sel]).sum(axis=2)  # (N, 3)
        precious_limit = np.where(sum_of_hf < 60, 4, 8)     # (N, 3)

        if not _HOST_REFINE:
            # Device-resident refinement: K iterations per device program
            # (refine_device.py); host syncs only at chunk boundaries for
            # serialization + Huffman-depth refresh. Batch mode included:
            # chunk calls from different image threads interleave on the
            # device (the batcher still coalesces the zeroing and
            # quant-search compares), and the per-image trajectory is
            # deterministic, so batch output stays byte-identical to
            # single-image output.
            self._refine_engine(
                img=img, comp_mask=comp_mask, target_mul=target_mul,
                stop_early=stop_early, factor=factor, nbx=nbx, nby=nby,
                mask_comps=mask_comps, quant=quant, state=state,
                orig=orig, cand_idx=cand_idx, cand_err=cand_err,
                cand_count=cand_count, precious_limit=precious_limit,
                jpg_header_size=jpg_header_size, dc_size=dc_size,
                make_incremental=make_incremental,
                total_histos=total_histos, base_size=base_size,
                pad_eob=pad_eob)
            return

        max_block_error = np.zeros(num_blocks, dtype=np.float64)
        last_indexes = np.zeros(num_blocks, dtype=np.int64)
        first_up_iter = True
        # Device-resident coefficient state: the refine loop ships only the
        # changed (index, value) pairs per iteration (full re-upload when a
        # huge fraction changes, i.e. the first up iteration).
        self.comparator.reset_coeff_state(
            [c.coeffs for c in img.components],
            [c.factor_x for c in img.components])

        from guetzli_tpu.ops.quantize import quantize_nearest_np
        orig_div_quant = quantize_nearest_np(
            orig.reshape(num_blocks, 3, 64), quant[None])  # requantized orig

        w_grids = None   # (2, 4, bh, bw) from the last fused compare

        for direction in (1, -1):
            di = 0 if direction > 0 else 1
            while True:
                if stop_early and direction == -1:
                    if prev_size > 1.01 * len(self.final_output.jpeg_data):
                        break
                # --- global order (weight grids come precomputed from the
                # previous iteration's fused device call; the zero-distmap
                # first-up case reduces to all-ones/zeros on host) ---
                global_blocks = None
                block_weight = None
                for rblock in range(1, 5):
                    if first_up_iter or w_grids is None:
                        bw = (np.ones(num_blocks, np.float32)
                              if direction > 0
                              else np.zeros(num_blocks, np.float32))
                    else:
                        bw = w_grids[di, rblock - 1].reshape(-1)
                    block_weight = bw
                    if native.available():
                        gb, gv, blocks_to_change = native.global_order(
                            cand_err, cand_count, last_indexes, bw,
                            max_block_error, direction)
                    else:
                        gb, gv, blocks_to_change = self._build_global_order(
                            direction, bw, cand_err, cand_count,
                            last_indexes, max_block_error)
                        order = np.argsort(gv, kind="stable")
                        gb, gv = gb[order], gv[order]
                    if len(gb):
                        global_blocks, global_vals = gb, gv
                        break
                if global_blocks is None or not len(global_blocks):
                    break

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

                prev_state = state
                m, est_size, state, touched, new_rows = (
                    self._apply_candidates(
                        direction, global_blocks, state,
                        cand_idx, last_indexes, orig, orig_div_quant,
                        precious_limit, min_coeffs, min_size_delta,
                        prev_size, jpg_header_size, dc_size,
                        inc_histos, inc_perblock, entropy_with_touched))
                if m == 0:
                    break
                update_incremental(inc_histos, inc_perblock, touched,
                                   new_rows)
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

                # push new state into the image + true output; the compare
                # and the next iteration's weight grids are ONE fused
                # device call (a single tunnel round trip per iteration),
                # shipping only the changed coefficient entries
                for c in mask_comps:
                    img.components[c].coeffs = np.ascontiguousarray(
                        state[:, c, :].reshape(nby, nbx, 64))
                encoded = self.output_jpeg(img.save_to_jpeg_data())
                chg = new_rows != prev_state[touched]
                ti, ci, ki = np.nonzero(chg)
                from guetzli_tpu.metric.comparator import DELTA_MAX
                if len(ti) == 0:
                    # nothing changed on-device (all applications were
                    # precious-guard skips): distance/weights are unchanged
                    pass
                elif len(ti) <= DELTA_MAX:
                    upd_idx = self.comparator.flat_index(
                        ci, touched[ti], ki)
                    w_grids = self.comparator.compare_delta(
                        upd_idx, new_rows[chg], factor, target_mul)
                    if _PARANOID:
                        self.comparator.verify_device_state(
                            [c.coeffs for c in img.components])
                else:
                    self.comparator.reset_coeff_state(
                        [c.coeffs for c in img.components],
                        [c.factor_x for c in img.components])
                    w_grids = self.comparator.compare_coeffs(
                        [c.coeffs for c in img.components],
                        [c.factor_x for c in img.components], factor,
                        target_mul)
                _log(self.stats,
                     f"Iter {self.stats.num_iterations}: "
                     f"{'up' if direction > 0 else 'down'} "
                     f"Coeffs[{m}] ValThres[{val_threshold:.4f}] "
                     f"Out[{len(encoded)}] D[{self.comparator.distance:.4f}]")
                self.maybe_output(encoded)
                prev_size = est_size

    # --- device-resident refinement loop ------------------------------
    def _refine_engine(self, img, comp_mask, target_mul, stop_early,
                       factor, nbx, nby, mask_comps, quant, state, orig,
                       cand_idx, cand_err, cand_count, precious_limit,
                       jpg_header_size, dc_size, make_incremental,
                       total_histos, base_size, pad_eob):
        """Chunked on-device up/down refinement (refine_device.py). Host
        work per chunk: exact entropy/Huffman refresh, serialization of
        the best/final candidates, verbose trace. Same acceptance
        semantics as the host loop (reference processor.cc:611-765) with
        two documented approximations: the in-loop size estimate uses
        chunk-frozen Huffman depths (vs the reference's refresh every 10
        coefficients), and MaybeOutput candidates are the per-chunk
        est-score best + phase finals (vs every iteration)."""
        import jax.numpy as jnp
        from guetzli_tpu.search import refine_device as rd

        num_blocks = nbx * nby
        steps = cand_idx.shape[1]
        cand_idx = np.ascontiguousarray(cand_idx, dtype=np.int32)
        cand_err = np.ascontiguousarray(cand_err, dtype=np.float32)
        cand_count = np.ascontiguousarray(cand_count, dtype=np.int32)
        factors = tuple(c.factor_x for c in img.components)
        prec = rd.precious_mask(cand_idx, cand_count, orig,
                                precious_limit)
        init192 = np.ascontiguousarray(
            state.reshape(num_blocks, 192), dtype=np.int32)

        from guetzli_tpu.metric.comparator import _BUCKETS
        bucketed = _BUCKETS
        if bucketed:
            # Re-lay block-level arrays onto the comparator's bucket
            # canvas grid (pad rows have no candidates / zero coeffs), so
            # the chunk executable is keyed by the bucket, not the size.
            cmp_ = self.comparator
            nbyb = cmp_.hb // (8 * factor)
            nbxb = cmp_.wb // (8 * factor)
            nb_eff = nbyb * nbxb

            def regrid(a, fill=0):
                out = np.full((nbyb, nbxb) + a.shape[1:], fill,
                              dtype=a.dtype)
                out[:nby, :nbx] = a.reshape((nby, nbx) + a.shape[1:])
                return out.reshape((nb_eff,) + a.shape[1:])

            cand_idx = regrid(cand_idx)
            cand_err = regrid(cand_err)
            cand_count = regrid(cand_count)
            prec = regrid(prec)
            init192 = regrid(init192)
            row_valid = regrid(
                np.ones(num_blocks, dtype=bool), fill=False)
            canvas_w, canvas_h = cmp_.wb, cmp_.hb
        else:
            nb_eff = num_blocks
            row_valid = np.ones(num_blocks, dtype=bool)
            canvas_w, canvas_h = img.width, img.height

        fused = getattr(cmp_, "fused", False)
        # Grouped bisection probes win where the stopping rule is
        # launch-overhead-bound (small canvases); at megapixel scale the
        # batched probes' extra bandwidth outweighs the saved launches.
        blevels = int(_os.environ.get("GUETZLI_TPU_BISECT_LEVELS",
                                      3 if fused else 1))
        cfg = rd.RefineCfg(nb_eff, steps, canvas_w, canvas_h,
                           factors, int(factor), int(comp_mask),
                           bucketed=bucketed, fused=fused,
                           bisect_group=blevels)
        zero_order, cand_zpos, zero_order_nat = rd.zeroing_order_tables(
            cand_idx, cand_count, prec)
        init_at_cand = init192[np.arange(nb_eff)[:, None], cand_idx]
        quant_zz = np.stack([quant[c][NATURAL_ORDER[1:]]
                             for c in range(3)]).astype(np.int32)

        def frozen_grid(c):
            arr = np.asarray(img.components[c].coeffs, dtype=np.int32)
            if bucketed:
                arr = self.comparator.pad_comp_grid(
                    arr, img.components[c].factor_x)
            return jnp.asarray(arr)

        if comp_mask == 7:
            frozen = ()
        elif comp_mask == 1:
            frozen = (frozen_grid(1), frozen_grid(2))
        else:
            frozen = (frozen_grid(0),)
        target = float(self.comparator.target_distance)

        def entropy_consts(state3):
            """Exact clustering + Huffman depths of the current state →
            the frozen-entropy fields for the next chunk."""
            histos = total_histos(state3)
            clustered, indexes, depths_list, _ = (
                writer._cluster_histograms(histos))
            depth_t = np.zeros((3, 256), dtype=np.int32)
            pad_bits = np.zeros(3, dtype=np.int32)
            frozen_fudged = 0
            for ci in range(len(histos)):
                d = np.asarray(depths_list[indexes[ci]],
                               dtype=np.int32)[:256]
                if ci in mask_comps:
                    depth_t[ci] = d
                    pad_bits[ci] = pad_eob.get(ci, 0) * int(d[0])
                else:
                    frozen_fudged += hstats.histogram_entropy_cost(
                        histos[ci], depths_list[indexes[ci]])
            ac_header = sum(hstats.histogram_header_cost(h) // 8
                            for h in clustered)
            return depth_t, pad_bits, frozen_fudged, \
                jpg_header_size + dc_size + ac_header

        _tc = _Phase("engine_setup"); _tc.__enter__()
        consts = rd.RefineConsts(
            cand_idx=jnp.asarray(cand_idx),
            cand_err=jnp.asarray(cand_err),
            cand_count=jnp.asarray(cand_count),
            init192=jnp.asarray(init192),
            init_at_cand=jnp.asarray(init_at_cand, jnp.int32),
            prec=jnp.asarray(prec),
            quant_zz=jnp.asarray(quant_zz),
            depths=jnp.zeros((3, 256), jnp.int32),
            pad_eob_bits=jnp.zeros(3, jnp.int32),
            frozen_fudged=jnp.int32(0),
            header_dc=jnp.int32(0),
            base_size=jnp.float32(base_size),
            target=jnp.float32(target),
            wtarget=jnp.float32(target * target_mul),
            block_limit=jnp.float32(self.comparator.block_error_limit()),
            stop_threshold=jnp.float32(np.inf),
            pi0=self.comparator._pi0,
            frozen_coeffs=frozen,
            valid_h=jnp.int32(img.height),
            valid_w=jnp.int32(img.width),
            row_valid=jnp.asarray(row_valid),
            zero_order=jnp.asarray(zero_order),
            cand_zpos=jnp.asarray(cand_zpos),
            zero_order_nat=jnp.asarray(zero_order_nat))
        # Pass-constant bit-curve symbol grids (one device program per
        # pass; saves ~290 ms/chunk at 1 MPix vs re-deriving in-chunk).
        consts = consts._replace(
            bit_setup=rd.bits_setup_device(consts, cfg))

        # sp sharding: pi0 is row-sharded by the comparator; the block
        # bookkeeping replicates on the same submesh so the whole chunk
        # compiles SPMD (GSPMD partitions the diffmap, replicates the
        # small sort/bisect compute).
        sp_mesh = getattr(self.comparator, "sp_mesh", None)
        if sp_mesh is not None:
            from guetzli_tpu.parallel import runtime as prt
            consts = consts._replace(**{
                f: prt.replicate_tree(getattr(consts, f), sp_mesh)
                for f in consts._fields if f != "pi0"})

        _tc.__exit__()
        carry = rd.init_carry(nb_eff, float(self.comparator.distance))
        if sp_mesh is not None:
            from guetzli_tpu.parallel import runtime as prt
            carry = prt.replicate_tree(carry, sp_mesh)
        last_best_serialized = np.inf

        def unpad_state(st):
            """(nb_eff, 192) engine state -> (num_blocks, 3, 64) true."""
            if bucketed:
                st = st.reshape(nbyb, nbxb, 192)[:nby, :nbx]
            return st.reshape(num_blocks, 3, 64)

        def state_np(n_np):
            """Numpy state at prefix counts n via the natural-layout
            zeroing-order table — one vectorized where (the
            nonzero+scatter twin cost ~25 ms/call at 1 MPix)."""
            return np.where(zero_order_nat < n_np[:, None], 0, init192)

        def maybe_out(n_np, dist):
          with _Phase("refine_serialize"):
            st3 = unpad_state(state_np(n_np))
            for c in mask_comps:
                img.components[c].coeffs = np.ascontiguousarray(
                    st3[:, c, :].reshape(nby, nbx, 64))
            encoded = self.output_jpeg(img.save_to_jpeg_data())
            score = score_jpeg(dist, len(encoded), target)
            _log(self.stats, f" Score[{score:.4f}]")
            if score < self.final_output.score or \
                    self.final_output.score < 0:
                self.final_output.jpeg_data = encoded
                self.final_output.score = score
            return len(encoded)

        # Anytime-best serialization runs on a worker thread, overlapped
        # with the next chunk's device execution (the tunnel pull
        # releases the GIL; serialization is ~0.12 s/chunk of host time
        # at 1 MPix). One job in flight; join-before-submit keeps
        # maybe_out's final_output updates sequential. Flush before any
        # read of final_output (the stop-early threshold) and at phase
        # end, so trajectory-visible state is exactly as in the
        # synchronous order.
        import threading
        ser_thread = [None]

        def ser_flush():
            t = ser_thread[0]
            if t is not None:
                t.join()
                ser_thread[0] = None

        def maybe_out_async(n_np, dist):
            ser_flush()
            t = threading.Thread(target=maybe_out,
                                 args=(np.array(n_np, copy=True), dist))
            t.start()
            ser_thread[0] = t

        cur_n = np.zeros(nb_eff, dtype=np.int32)
        for direction in (1, -1):
            carry = carry._replace(direction=jnp.int32(direction),
                                   phase_done=jnp.bool_(False))
            while True:
                with _Phase("refine_boundary"):
                    state3 = unpad_state(state_np(cur_n))
                    depth_t, pad_bits, frozen_fudged, header_dc = \
                        entropy_consts(state3)
                if stop_early and direction == -1:
                    ser_flush()   # stop_thr reads final_output
                    stop_thr = 1.01 * len(self.final_output.jpeg_data)
                else:
                    stop_thr = np.inf
                refreshed = dict(
                    depths=jnp.asarray(depth_t),
                    pad_eob_bits=jnp.asarray(pad_bits),
                    frozen_fudged=jnp.int32(frozen_fudged),
                    header_dc=jnp.int32(header_dc),
                    stop_threshold=jnp.float32(stop_thr))
                if sp_mesh is not None:
                    from guetzli_tpu.parallel import runtime as prt
                    refreshed = {k: prt.replicate(v, sp_mesh)
                                 for k, v in refreshed.items()}
                consts = consts._replace(**refreshed)
                with _Phase("refine_chunk"):
                    if self.batcher is not None and sp_mesh is None:
                        # batch mode: chunks from same-bucket images
                        # coalesce into one vmapped device program
                        carry, pulled = self.batcher.submit("refine", {
                            "carry": carry, "consts": consts, "cfg": cfg,
                            "uid": self.comparator.uid})
                    else:
                        carry, pulled = rd.refine_chunk(carry, consts,
                                                        cfg)
                    logs, summary, cur_n = rd.unpack_chunk_result(
                        pulled, cfg.k_iters)
                for row in logs:
                    if row[0] <= 0:
                        continue
                    self.stats.num_iterations += 1
                    if row[1] > 0:
                        self.stats.num_iterations_up += 1
                    else:
                        self.stats.num_iterations_down += 1
                    _log(self.stats,
                         f"Iter {self.stats.num_iterations}: "
                         f"{'up' if row[1] > 0 else 'down'} "
                         f"Coeffs[{int(row[2])}] ValThres[{row[3]:.4f}] "
                         f"Est[{int(row[4])}] D[{row[5]:.4f}]")
                if summary["best_flag"] and \
                        summary["best_score"] < last_best_serialized:
                    maybe_out_async(np.asarray(carry.best_n),
                                    summary["best_dist"])
                    last_best_serialized = summary["best_score"]
                if summary["phase_done"]:
                    ser_flush()
                    maybe_out(cur_n, summary["dist"])
                    break
        ser_flush()
        self.comparator.distance = summary["dist"]

    # --- 420 zeroing-pass data assembly -------------------------------
    def _zeroing_420_luma(self, img, cur, orig, nbx, nby):
        """comp_mask=1: Y candidates at factor 1; chroma pixels frozen.
        Returns the kernel's positional (N, ...) arrays."""
        from guetzli_tpu.image.output_image import dither_to_u8
        width, height = img.width, img.height
        num_blocks = nbx * nby

        def tiles_of(plane_u8):
            p = jnp.pad(plane_u8, ((0, nby * 8 - height),
                                   (0, nbx * 8 - width)), mode="edge")
            return p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).reshape(
                num_blocks, 8, 8)

        cb = tiles_of(dither_to_u8(img.components[1].pixels16()))
        cr = tiles_of(dither_to_u8(img.components[2].pixels16()))
        mask3 = self.comparator.corner_masks().reshape(num_blocks, 3)
        xyb0 = self.comparator.original_block_opsin().reshape(
            num_blocks, 3, 8, 8)
        vw = np.minimum(width - 8 * (np.arange(num_blocks) % nbx), 8)
        vh = np.minimum(height - 8 * (np.arange(num_blocks) // nbx), 8)
        return (jnp.asarray(cur[:, 0, :]), jnp.asarray(orig[:, 0, :]),
                cb, cr, xyb0, mask3, jnp.asarray(vw, jnp.int32),
                jnp.asarray(vh, jnp.int32))

    def _zeroing_420_chroma(self, img, cur, orig, nbx, nby):
        """comp_mask=6: U+V candidates at factor 2; Y and the subsampled
        neighbor ring frozen at the pass's initial state. Returns the
        kernel's positional (N, ...) arrays."""
        from guetzli_tpu.image.output_image import (dither_to_u8,
                                                    idct_pixels16)
        width, height = img.width, img.height
        num_blocks = nbx * nby

        def rings_of(comp):
            sub = idct_pixels16(comp.coeffs)        # (nby*8, nbx*8) x16
            sh, sw = -(-height // 2), -(-width // 2)
            # valid region only, then edge-pad out to the block grid + ring
            sub = jnp.pad(sub[:sh, :sw],
                          ((1, nby * 8 - sh + 1), (1, nbx * 8 - sw + 1)),
                          mode="edge")
            # (N, 10, 10) sliding windows at stride 8
            idx_y = (np.arange(nby)[:, None] * 8
                     + np.arange(10)[None, :])      # (nby, 10)
            idx_x = (np.arange(nbx)[:, None] * 8
                     + np.arange(10)[None, :])
            win = sub[jnp.asarray(idx_y)][:, :, jnp.asarray(idx_x)]
            # win: (nby, 10, nbx, 10) -> (N, 10, 10)
            return win.transpose(0, 2, 1, 3).reshape(num_blocks, 10, 10)

        rings_u = rings_of(img.components[1])
        rings_v = rings_of(img.components[2])

        y_plane = dither_to_u8(img.components[0].pixels16())
        y_pad = jnp.pad(y_plane, ((0, nby * 16 - height),
                                  (0, nbx * 16 - width)), mode="edge")
        y_tiles = y_pad.reshape(nby, 16, nbx, 16).transpose(
            0, 2, 1, 3).reshape(num_blocks, 16, 16)

        # original opsin + corner masks on the full-res 8x8 grid, padded to
        # the 2x-chroma grid; sub-block (iy, ix) of chroma block (by, bx)
        # is full-res block (2by+iy, 2bx+ix).
        fb_y, fb_x = -(-height // 8), -(-width // 8)
        xyb0 = self.comparator.original_block_opsin()   # (fb_y, fb_x, ...)
        m3 = self.comparator.corner_masks()         # (fb_y, fb_x, 3)
        sy = np.minimum(np.arange(nby * 2), fb_y - 1)
        sx = np.minimum(np.arange(nbx * 2), fb_x - 1)
        xyb0 = xyb0[jnp.asarray(sy)][:, jnp.asarray(sx)]
        m3 = m3[jnp.asarray(sy)][:, jnp.asarray(sx)]
        # regroup (2*nby, 2*nbx, ...) -> (N, 4, ...)
        xyb0_4 = xyb0.reshape(nby, 2, nbx, 2, 3, 8, 8).transpose(
            0, 2, 1, 3, 4, 5, 6).reshape(num_blocks, 4, 3, 8, 8)
        mask3_4 = m3.reshape(nby, 2, nbx, 2, 3).transpose(
            0, 2, 1, 3, 4).reshape(num_blocks, 4, 3)

        by = np.arange(num_blocks) // nbx
        bx = np.arange(num_blocks) % nbx
        subvalid = np.zeros((num_blocks, 4), dtype=bool)
        for iy in range(2):
            for ix in range(2):
                j = iy * 2 + ix
                subvalid[:, j] = ((8 * (2 * bx + ix) < width)
                                  & (8 * (2 * by + iy) < height))
        xpar16 = np.tile((np.arange(16) & 1).astype(np.int32),
                         (num_blocks, 1))

        return (jnp.asarray(cur[:, 1:, :]), jnp.asarray(orig[:, 1:, :]),
                rings_u, rings_v, y_tiles, xyb0_4, mask3_4,
                jnp.asarray(subvalid), jnp.asarray(xpar16))

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

    def _apply_candidates(self, direction, global_blocks, state,
                          cand_idx, last_indexes, orig, orig_requant,
                          precious_limit, min_coeffs, min_size_delta,
                          prev_size, jpg_header_size, dc_size,
                          histos_base, perblock, entropy_with_touched):
        """Applies the first M candidates of the global order, choosing M
        by interpolation search on the entropy-size estimate (the reference
        applies candidates one-at-a-time with a periodic Huffman refresh,
        processor.cc:704-750; the estimate's deviation from prev_size is
        monotone in M so the first stopping index can be bracketed). Each
        size evaluation only re-streams the touched blocks against the
        pass-persistent per-block histograms, and the candidate expansion
        is fully vectorized."""
        total = len(global_blocks)

        # Expand the global order once: the j-th occurrence of block b in
        # global_blocks maps to cand_idx[b, last_indexes[b] +- occ] — so
        # every prefix application is a pure vector scatter.
        gb = global_blocks
        sorter = np.argsort(gb, kind="stable")
        sorted_b = gb[sorter]
        grp_first = np.ones(total, dtype=bool)
        grp_first[1:] = sorted_b[1:] != sorted_b[:-1]
        grp_id = np.cumsum(grp_first) - 1
        grp_start = np.nonzero(grp_first)[0]
        occ_sorted = np.arange(total) - grp_start[grp_id]
        occ = np.empty(total, dtype=np.int64)
        occ[sorter] = occ_sorted
        if direction > 0:
            flat_idx = cand_idx[gb, last_indexes[gb] + occ]
        else:
            flat_idx = cand_idx[gb, last_indexes[gb] - 1 - occ]
        ap_c, ap_k = flat_idx // 64, flat_idx % 64
        if direction > 0:
            # precious guard: don't zero strong k=1/k=8 coefficients
            # (reference processor.cc:722-731)
            prec = (((ap_k == 1) | (ap_k == 8))
                    & (np.abs(orig[gb, ap_c, ap_k])
                       >= precious_limit[gb, ap_c]))
        else:
            prec = np.zeros(total, dtype=bool)

        cache = {}

        def apply_first(m):
            if m == 0:
                return None, None, prev_size
            if m in cache:
                return cache[m]
            b, c, k = gb[:m], ap_c[:m], ap_k[:m]
            touched = np.unique(b)
            inv = np.searchsorted(touched, b)
            rows = state[touched].copy()
            if direction > 0:
                keep = ~prec[:m]
                rows[inv[keep], c[keep], k[keep]] = 0
            else:
                rows[inv, c, k] = orig_requant[b, c, k]
            est = jpg_header_size + dc_size + entropy_with_touched(
                histos_base, perblock, touched, rows)
            cache[m] = (touched, rows, est)
            return cache[m]

        def delta(m):
            _, _, est = apply_first(m)
            return abs(est - prev_size)

        def cond(m):
            if m == 0:
                return False
            return m > min_coeffs and delta(m) > min_size_delta

        # Find the smallest m satisfying cond (same invariant as a binary
        # search — cond(lo) False, cond(hi) True — but with interpolation
        # guesses on the near-linear size curve, alternating with bisection
        # to bound the worst case).
        if not cond(total):
            m = total
        else:
            lo, hi = max(min_coeffs, 0), total
            d_lo = delta(lo) if lo > 0 else 0.0
            d_hi = delta(hi)
            use_interp = True
            while hi - lo > 1:
                if use_interp and d_hi > d_lo:
                    frac = (min_size_delta - d_lo) / (d_hi - d_lo)
                    mid = lo + int(frac * (hi - lo))
                    mid = min(max(mid, lo + 1), hi - 1)
                else:
                    mid = (lo + hi) // 2
                use_interp = not use_interp
                d_mid = delta(mid)
                if mid > min_coeffs and d_mid > min_size_delta:
                    hi, d_hi = mid, d_mid
                else:
                    lo, d_lo = mid, d_mid
            m = hi
        touched, rows, est = apply_first(m)
        st = state.copy()
        if touched is not None:
            st[touched] = rows
        return m, est, st, touched, rows

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

        with _Phase("output_initial"):
            encoded = self.output_jpeg(jpg_in)
        out.score = -1
        if comparator is None:
            # image too small for butteraugli: pass through
            out.jpeg_data = encoded
            out.score = len(encoded)
            return True

        import copy
        with _Phase("initial_compare"):
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
                if img.components[1].factor_x == 1:
                    img.downsample(self.params.use_silver_screen)
                jpg = img.save_to_jpeg_data()
            with _Phase("quant_search"):
                ok, best_q = self.select_quant_matrix(
                    jpg, downsample != 0, q_in, img)
            if not ok:
                best_q = np.ones((3, 64), dtype=np.int32)
            img.copy_from_jpeg_data(jpg)
            img.apply_global_quantization(best_q)
            if not downsample:
                with _Phase("sfm_total"):
                    self.select_frequency_masking(jpg, img, 7, 1.0, False)
            else:
                ymul = 1.0 if len(jpg.components) == 1 else 0.97
                self.select_frequency_masking(jpg, img, 1, ymul, False)
                self.select_frequency_masking(jpg, img, 6, 1.0, True)
        return True


def process_jpeg_bytes(params: Params, stats: ProcessStats,
                       data: bytes, batcher=None) -> bytes:
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
    return _run(params, stats, jpg, rgb, batcher=batcher)


def process_rgb(params: Params, stats: ProcessStats,
                rgb: np.ndarray, batcher=None) -> bytes:
    """PNG/RGB-input entry (reference Process, processor.cc:926-958)."""
    from guetzli_tpu.jpeg.encoder import encode_rgb_to_jpeg_data
    h, w = rgb.shape[:2]
    with _Phase("bootstrap_encode"):
        jpg = encode_rgb_to_jpeg_data(rgb)
    return _run(params, stats, jpg, rgb, batcher=batcher)


def _run(params: Params, stats: ProcessStats, jpg: JPEGData,
         rgb: np.ndarray, batcher=None) -> bytes:
    h, w = jpg.height, jpg.width
    comparator = None
    if w >= 32 and h >= 32:
        with _Phase("comparator_init"):
            comparator = ButteraugliComparatorTPU(
                rgb, params.butteraugli_target * params.distance_margin,
                stats, batcher=batcher)
    out = GuetzliOutput()
    Processor(batcher=batcher).process_jpeg_data(params, jpg, comparator,
                                                 out, stats)
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
