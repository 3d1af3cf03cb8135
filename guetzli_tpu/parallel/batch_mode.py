"""Batch encoding: B images, one chip, batched device calls.

Each image's search runs unchanged in its own host thread; the shared
DeviceBatcher coalesces their per-iteration device work into single
batched executions (see batcher.py). Same-shaped fused-compare requests
are stacked and vmapped; zeroing requests are concatenated along the
block axis (per-block computations are image-independent, so blocks of
different images can share one kernel launch — even across different
image sizes or quality targets).

This is the framework's image/batch data-parallel layer (SURVEY.md §2
parallelism inventory): the reference achieves batch throughput with
`xargs -P nproc` over processes; here the batch shares one accelerator.
"""

from __future__ import annotations

import os
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from guetzli_tpu.parallel.batcher import DeviceBatcher


def _placement_of(tree) -> tuple:
    """Stable device-placement key of a pytree of device arrays (images
    assigned to different dp submeshes must never share one stacked
    device call)."""
    leaf = jax.tree.leaves(tree)[0]
    try:
        return tuple(sorted(d.id for d in leaf.devices()))
    except AttributeError:           # numpy leaf: default placement
        return ()


def _fused_handler(payloads: List[dict], cache: dict
                   ) -> List[Tuple[float, object, np.ndarray]]:
    """Batched fused compare. payload keys: coeffs (list of np arrays),
    pi0 (device PsychoImage), target, width, height, factors, wfactor.
    Returns per-payload (distance, distmap_device, weight_grids)."""
    from guetzli_tpu.metric.comparator import (_compare_coeffs_fused,
                                               _compare_coeffs_fused_batch)

    # Group by everything static + coefficient shapes + device placement
    # (images on different dp submeshes cannot stack into one call).
    groups: Dict[tuple, List[int]] = {}
    for i, p in enumerate(payloads):
        key = (p["width"], p["height"], p["factors"], p["wfactor"],
               tuple(c.shape for c in p["coeffs"]), _placement_of(p["pi0"]))
        groups.setdefault(key, []).append(i)

    results: List[Optional[tuple]] = [None] * len(payloads)
    for key, idxs in groups.items():
        width, height, factors, wfactor, _, _placement = key
        if len(idxs) == 1:
            p = payloads[idxs[0]]
            same = all(c.shape == p["coeffs"][0].shape
                       for c in p["coeffs"][1:])
            coeffs = (jnp.asarray(np.stack(p["coeffs"])) if same else
                      tuple(jnp.asarray(c) for c in p["coeffs"]))
            dmap, packed = _compare_coeffs_fused(
                coeffs, p["pi0"], jnp.float32(p["target"]), width, height,
                factors, wfactor)
            host = np.asarray(packed)
            bw = -(-width // (8 * wfactor))
            bh = -(-height // (8 * wfactor))
            results[idxs[0]] = (float(host[0]), dmap,
                                host[1:].reshape(2, 4, bh, bw))
            continue
        ps = [payloads[i] for i in idxs]
        # Pad the group to a power-of-two bucket so only log2(B) batched
        # executables ever compile (group sizes drift as images desync).
        bucket = 1
        while bucket < len(ps):
            bucket *= 2
        ps_padded = ps + [ps[-1]] * (bucket - len(ps))
        # The per-image psycho-images never change: cache the stacked tree
        # per group composition (stacking ~12 full-image arrays every
        # iteration costs real dispatch time).
        pi_key = ("pi0",) + tuple(p.get("uid", id(p["pi0"]))
                                  for p in ps_padded)
        same = all(c.shape == ps[0]["coeffs"][0].shape
                   for c in ps[0]["coeffs"][1:])
        if same:
            coeffs = jnp.asarray(np.stack(
                [np.stack(p["coeffs"]) for p in ps_padded]))
        else:
            coeffs = tuple(
                jnp.asarray(np.stack([p["coeffs"][c] for p in ps_padded]))
                for c in range(3))
        pi0s = cache.get(pi_key)
        if pi0s is None:
            if len(cache) > 64:
                cache.clear()
            pi0s = jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[p["pi0"] for p in ps_padded])
            cache[pi_key] = pi0s
        tds = jnp.asarray([p["target"] for p in ps_padded], jnp.float32)
        dmaps, packed = _compare_coeffs_fused_batch(
            coeffs, pi0s, tds, width, height, factors, wfactor)
        host = np.asarray(packed)                      # one pull
        bw = -(-width // (8 * wfactor))
        bh = -(-height // (8 * wfactor))
        for j, i in enumerate(idxs):
            results[i] = (float(host[j, 0]), dmaps[j],
                          host[j, 1:].reshape(2, 4, bh, bw))
    return results


def _delta_handler(payloads: List[dict], cache: dict) -> List[tuple]:
    """Batched delta compare against per-image device-resident coefficient
    state. payload keys: state (device flat), idx, val (np, bucket-padded),
    pi0, target, width, height, shapes, factors, wfactor. Returns
    (distance, distmap, weight_grids, new_state) per payload. All state
    stacking/unstacking stays on device — only the (idx, val) pairs and the
    packed result cross the tunnel."""
    from guetzli_tpu.metric.comparator import (_compare_delta_fused,
                                               _compare_delta_fused_batch)

    groups: Dict[tuple, List[int]] = {}
    for i, p in enumerate(payloads):
        key = (p["width"], p["height"], p["shapes"], p["factors"],
               p["wfactor"], _placement_of(p["pi0"]))
        groups.setdefault(key, []).append(i)

    results: List[Optional[tuple]] = [None] * len(payloads)
    for key, idxs in groups.items():
        width, height, shapes, factors, wfactor, _placement = key
        # re-pad every member to the group's max K so the whole group
        # shares one executable (idempotent repeats of the last pair)
        kmax = max(len(payloads[i]["idx"]) for i in idxs)
        for i in idxs:
            p = payloads[i]
            pad = kmax - len(p["idx"])
            if pad:
                p["idx"] = np.concatenate(
                    [p["idx"], np.full(pad, p["idx"][-1], p["idx"].dtype)])
                p["val"] = np.concatenate(
                    [p["val"], np.full(pad, p["val"][-1], p["val"].dtype)])
        if len(idxs) == 1:
            p = payloads[idxs[0]]
            st, dmap, packed = _compare_delta_fused(
                p["state"], jnp.asarray(p["idx"]), jnp.asarray(p["val"]),
                p["pi0"], jnp.float32(p["target"]), width, height,
                shapes, factors, wfactor)
            host = np.asarray(packed)
            bw = -(-width // (8 * wfactor))
            bh = -(-height // (8 * wfactor))
            results[idxs[0]] = (float(host[0]), dmap,
                                host[1:].reshape(2, 4, bh, bw), st)
            continue
        ps = [payloads[i] for i in idxs]
        bucket = 1
        while bucket < len(ps):
            bucket *= 2
        ps_padded = ps + [ps[-1]] * (bucket - len(ps))
        pi_key = ("pi0",) + tuple(p.get("uid", id(p["pi0"]))
                                  for p in ps_padded)
        states = jnp.stack([p["state"] for p in ps_padded])  # on-device
        idx_b = jnp.asarray(np.stack([p["idx"] for p in ps_padded]))
        val_b = jnp.asarray(np.stack([p["val"] for p in ps_padded]))
        pi0s = cache.get(pi_key)
        if pi0s is None:
            if len(cache) > 64:
                cache.clear()
            pi0s = jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[p["pi0"] for p in ps_padded])
            cache[pi_key] = pi0s
        tds = jnp.asarray([p["target"] for p in ps_padded], jnp.float32)
        new_states, dmaps, packed = _compare_delta_fused_batch(
            states, idx_b, val_b, pi0s, tds, width, height, shapes,
            factors, wfactor)
        host = np.asarray(packed)
        bw = -(-width // (8 * wfactor))
        bh = -(-height // (8 * wfactor))
        for j, i in enumerate(idxs):
            results[i] = (float(host[j, 0]), dmaps[j],
                          host[j, 1:].reshape(2, 4, bh, bw),
                          new_states[j])
    return results


def _grouping_disabled() -> bool:
    return bool(os.environ.get("GUETZLI_TPU_NO_GROUPING"))


def _lanes_for_canvas(width: int, height: int) -> int:
    """Fixed vmap lane count for a canvas — a pure function of the
    compile config so batch-mode outputs stay DETERMINISTIC: every call
    of a given cfg runs in the same executable regardless of how many
    images happen to be in flight (vmap lanes are numerically isolated,
    so a lane's trajectory depends only on its own image; timing then
    changes nothing). Scaled down for big canvases to bound device
    memory; 1 under GUETZLI_TPU_NO_GROUPING (the unbatched executables —
    byte-identical to single-image mode)."""
    if _grouping_disabled():
        return 1
    cap = int(os.environ.get("GUETZLI_TPU_GROUP_LANES", "8"))
    return max(1, min(cap, 16_777_216 // (width * height)))


def _refine_lanes(cfg) -> int:
    return _lanes_for_canvas(cfg.width, cfg.height)


def _refine_handler(payloads: List[dict], cache: dict) -> List[tuple]:
    """Cross-image batched refine chunks. payload keys: carry (device
    RefineCarry), consts (device RefineConsts), cfg (RefineCfg, the group
    key), uid (stable per-image id for the pi0 stack cache). Returns
    (new_carry, pulled_np) per payload.

    Images sharing a size/steps bucket run their chunks in ONE vmapped
    device program (refine_device.refine_chunk_batch): the per-iteration
    compare is dispatch-overhead-bound at typical sizes, so a full group
    costs far less than its members run singly. Groups always pad to the
    cfg's fixed lane count (see _refine_lanes) — determinism. The
    per-image pi0 trees are chunk-invariant and cached stacked; the rest
    of consts restacks each chunk (entropy fields refresh at chunk
    boundaries)."""
    from guetzli_tpu.search import refine_device as rd

    groups: Dict[tuple, List[int]] = {}
    for i, p in enumerate(payloads):
        groups.setdefault((p["cfg"], _placement_of(p["consts"].pi0)),
                          []).append(i)

    results: List[Optional[tuple]] = [None] * len(payloads)
    for (cfg, _placement), idxs in groups.items():
        lanes = _refine_lanes(cfg)
        if lanes == 1:
            # big-canvas cfgs: the unbatched executable (also what
            # single-image mode runs, so outputs match it byte-for-byte)
            for i in idxs:
                p = payloads[i]
                carry, pulled = rd.refine_chunk(p["carry"], p["consts"],
                                                cfg)
                results[i] = (carry, np.asarray(pulled))
            continue
        for start in range(0, len(idxs), lanes):
            sub = idxs[start:start + lanes]
            ps = [payloads[i] for i in sub]
            ps_p = ps + [ps[-1]] * (lanes - len(ps))
            pi_key = ("refine_pi0", cfg) + tuple(p["uid"] for p in ps_p)
            pi0s = cache.get(pi_key)
            if pi0s is None:
                if len(cache) > 64:
                    cache.clear()
                pi0s = jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[p["consts"].pi0 for p in ps_p])
                cache[pi_key] = pi0s
            try:
                carry_t, pulled_b = rd.refine_chunk_group(
                    tuple(p["carry"] for p in ps_p),
                    tuple(p["consts"]._replace(pi0=()) for p in ps_p),
                    pi0s, cfg)
                pulled_np = np.asarray(pulled_b)       # one pull; async
                # execution errors surface HERE, so it stays in the try
            except Exception as e:          # noqa: BLE001
                # Trace/compile/runtime failure of the vmapped chunk
                # program (deterministic): run the group's chunks
                # unbatched — same executable single-image mode uses, so
                # outputs stay correct, just slower for this group.
                import sys
                import traceback
                print(f"guetzli_tpu: batched refine chunk failed for "
                      f"cfg {cfg} ({type(e).__name__}); running the "
                      f"group unbatched", file=sys.stderr)
                if os.environ.get("GUETZLI_TPU_DEBUG_FALLBACK"):
                    traceback.print_exc(file=sys.stderr)
                for i in sub:
                    p = payloads[i]
                    carry, pulled = rd.refine_chunk(p["carry"],
                                                    p["consts"], cfg)
                    results[i] = (carry, np.asarray(pulled))
                continue
            for j, i in enumerate(sub):
                results[i] = (carry_t[j], pulled_np[j])
    return results


def _requant_handler(payloads: List[dict], cache: dict) -> List[np.ndarray]:
    """Cross-image batched speculative quant-search evaluations. payload
    keys: base (device tree), q (nslots, 3, 64) np, pi0, uid, h, w,
    wb, hb (canvas dims), factors. Returns (nslots,) distances per
    payload. Groups pad to a fixed lane count (pure function of the
    canvas) for determinism, exactly like _refine_handler."""
    from guetzli_tpu.metric.comparator import (_requant_compare_batch_dyn,
                                               _requant_compare_images)

    def base_struct(b):
        return (tuple(x.shape for x in b) if isinstance(b, tuple)
                else b.shape)

    groups: Dict[tuple, List[int]] = {}
    for i, p in enumerate(payloads):
        # `fused` is in the key so a lane group never mixes metric
        # paths: ps[0]'s flag below applies to the whole group.
        key = (p["wb"], p["hb"], p["factors"], p["q"].shape,
               base_struct(p["base"]), _placement_of(p["pi0"]),
               p.get("fused", False))
        groups.setdefault(key, []).append(i)

    results: List[Optional[np.ndarray]] = [None] * len(payloads)
    for key, idxs in groups.items():
        wb, hb, factors = key[0], key[1], key[2]
        lanes = _lanes_for_canvas(wb, hb)
        if lanes == 1:
            for i in idxs:
                p = payloads[i]
                results[i] = np.asarray(_requant_compare_batch_dyn(
                    p["base"], jnp.asarray(p["q"]), p["pi0"],
                    jnp.int32(p["h"]), jnp.int32(p["w"]), wb, hb,
                    factors, fused=p.get("fused", False)))
            continue
        for start in range(0, len(idxs), lanes):
            sub = idxs[start:start + lanes]
            ps = [payloads[i] for i in sub]
            ps_p = ps + [ps[-1]] * (lanes - len(ps))
            pi_key = ("requant_pi0", key) + tuple(p["uid"] for p in ps_p)
            pi0s = cache.get(pi_key)
            if pi0s is None:
                if len(cache) > 64:
                    cache.clear()
                pi0s = jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *[p["pi0"] for p in ps_p])
                cache[pi_key] = pi0s
            bases = jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *[p["base"] for p in ps_p])
            qs = jnp.asarray(np.stack([p["q"] for p in ps_p]))
            hs = jnp.asarray([p["h"] for p in ps_p], jnp.int32)
            ws = jnp.asarray([p["w"] for p in ps_p], jnp.int32)
            fused = ps[0].get("fused", False)
            try:
                dists = np.asarray(_requant_compare_images(
                    bases, qs, pi0s, hs, ws, wb, hb, factors,
                    fused=fused))
            except Exception as e:          # noqa: BLE001
                # Trace/compile failure of the fused metric at this
                # batched shape (deterministic, so falling back keeps
                # batch outputs reproducible): degrade the bucket and
                # re-run the group on the XLA metric path — an encode
                # must never die on a metric-path defect.
                if not fused:
                    raise
                import sys
                from guetzli_tpu.metric import fused_pallas
                fused_pallas.mark_bucket_broken(hb, wb)
                print(f"guetzli_tpu: batched fused requant failed at "
                      f"bucket {(hb, wb)} ({type(e).__name__}); "
                      f"degrading the group to the XLA metric path",
                      file=sys.stderr)
                dists = np.asarray(_requant_compare_images(
                    bases, qs, pi0s, hs, ws, wb, hb, factors,
                    fused=False))
            for j, i in enumerate(sub):
                results[i] = dists[j]
    return results


def _zeroing_handler(payloads: List[dict], cache: dict) -> List[tuple]:
    """Concatenated zeroing kernel. payload keys: comp_mask, args (tuple of
    (N, ...) arrays), limit (float), steps, lookahead, n."""
    from guetzli_tpu.search import zeroing

    kernels = {7: zeroing.compute_zeroing_order_batch,
               1: zeroing.compute_zeroing_order_420_luma,
               6: zeroing.compute_zeroing_order_420_chroma}
    groups: Dict[tuple, List[int]] = {}
    for i, p in enumerate(payloads):
        # placement: images on different dp submeshes cannot share one
        # device call (concatenating across submeshes is an error)
        groups.setdefault((p["comp_mask"], p["steps"], p["lookahead"],
                           p.get("new_model", True),
                           p.get("placement")), []).append(i)

    results: List[Optional[tuple]] = [None] * len(payloads)
    for (comp_mask, steps, lookahead, new_model,
         _placement), idxs in groups.items():
        kernel = kernels[comp_mask]
        ps = [payloads[i] for i in idxs]
        nargs = len(ps[0]["args"])
        if len(ps) == 1:
            cat = ps[0]["args"]
            limit_np = np.full(ps[0]["n"], ps[0]["limit"], np.float32)
        else:
            cat = tuple(jnp.concatenate(
                [jnp.asarray(p["args"][a]) for p in ps], axis=0)
                for a in range(nargs))
            limit_np = np.concatenate(
                [np.full(p["n"], p["limit"], np.float32) for p in ps])
        nv = np.concatenate([np.asarray(p["n_valid"]) for p in ps]) \
            if all("n_valid" in p for p in ps) else None
        # run_chunked pads to the fixed chunk size: one compiled variant
        # per `steps` value, shared with single-image mode.
        host = zeroing.run_chunked(kernel, cat, limit_np, steps, lookahead,
                                   n_valid=nv, new_model=new_model)
        off = 0
        for j, i in enumerate(idxs):
            n = ps[j]["n"]
            results[i] = tuple(h[off:off + n] for h in host)
            off += n
    return results


def make_batcher(timeout: float = 0.5) -> DeviceBatcher:
    # Per-kind grouping: the on-device refine chunks and the zeroing
    # kernels batch across images (dispatch-overhead-bound — a group of 8
    # costs far less than 8 singles); the legacy fused/delta compares
    # stay singleton (measured slower vmapped on this backend, and the
    # engine path has replaced them in the hot loop), overlapping via
    # concurrent flushes instead.
    group_caps = {"refine": 8, "zeroing": 8, "requant": 8,
                  # fused/delta default to singleton (their group path
                  # uses pow-2 padding, so grouping them is NOT
                  # deterministic across timings — measurement knob only)
                  "fused": int(os.environ.get("GUETZLI_TPU_FUSED_CAP",
                                              "1")),
                  "delta": int(os.environ.get("GUETZLI_TPU_DELTA_CAP",
                                              "1"))}
    if os.environ.get("GUETZLI_TPU_NO_GROUPING"):
        group_caps = {k: 1 for k in group_caps}
    return DeviceBatcher({"fused": _fused_handler,
                          "delta": _delta_handler,
                          "zeroing": _zeroing_handler,
                          "refine": _refine_handler,
                          "requant": _requant_handler}, timeout=timeout,
                         max_group=group_caps)


def process_batch(inputs: Sequence, quality: float = 95.0,
                  params=None, stats_list=None,
                  timeout: float = 0.5,
                  on_complete=None) -> List[Optional[bytes]]:
    """Encodes a batch of images concurrently on one chip.

    inputs: list of (H, W, 3) uint8 arrays or JPEG byte strings. Returns
    one optimized JPEG (or None on per-image failure — failures are
    isolated, matching the reference test harness's per-file behavior).

    on_complete(i, jpeg_bytes_or_None): called as each image finishes —
    the checkpoint hook (callers persist finished outputs immediately, so
    an interrupted batch run resumes by skipping already-written files).
    Called from worker threads; must be thread-safe."""
    from guetzli_tpu.config import Params, ProcessStats
    from guetzli_tpu.search.processor import (process_jpeg_bytes,
                                              process_rgb)
    from guetzli_tpu.search.quality import butteraugli_score_for_quality

    n = len(inputs)
    results: List[Optional[bytes]] = [None] * n
    errors: List[Optional[BaseException]] = [None] * n
    batcher = make_batcher(timeout=timeout)
    # Default concurrency: enough workers to FILL the vmap lane groups
    # (8 for bees-class canvases). With the quiescence-flush batcher,
    # 16 workers measured fastest on a 1-core host (BATCH_AB.json:
    # 78.5 s vs 129-131 s at 4/8 workers for batch16 — more in-flight
    # images mean fuller groups and better link-latency overlap); the
    # old poll/deadline batcher lost with many workers, which is where
    # the previous cores-scaled default came from.
    default_workers = 16
    max_workers = int(os.environ.get("GUETZLI_TPU_BATCH_WORKERS",
                                     str(default_workers)))
    slots = threading.Semaphore(max_workers)
    # dp: with a global ('dp', 'sp') mesh set, image i runs on submesh
    # i % dp — independent images on disjoint device groups (the on-mesh
    # analog of the reference harness's `xargs -P` fan-out).
    from guetzli_tpu.parallel import runtime as prt
    gmesh = prt.global_mesh()
    submeshes = prt.sp_submeshes(gmesh) if gmesh is not None else None

    def run(i):
        slots.acquire()
        batcher.register()
        if submeshes is not None:
            prt.set_worker_mesh(submeshes[i % len(submeshes)])
        try:
            p = Params(**(params.__dict__ if params is not None else {}))
            p.butteraugli_target = butteraugli_score_for_quality(quality)
            stats = (stats_list[i] if stats_list is not None
                     else ProcessStats())
            data = inputs[i]
            if isinstance(data, (bytes, bytearray)):
                results[i] = process_jpeg_bytes(p, stats, bytes(data),
                                                batcher=batcher)
            else:
                results[i] = process_rgb(p, stats, np.asarray(data),
                                         batcher=batcher)
        except Exception as e:     # per-image failure isolation
            errors[i] = e
        finally:
            batcher.unregister()
            slots.release()
            if errors[i] is not None:
                import sys as _sys
                import traceback as _tb
                _sys.stderr.write(
                    f"image {i} failed: "
                    f"{''.join(_tb.format_exception_only(errors[i]))}")
            if on_complete is not None:
                try:
                    on_complete(i, results[i])
                except Exception:
                    pass

    threads = [threading.Thread(target=run, args=(i,), daemon=True)
               for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    batcher.close()
    return results
