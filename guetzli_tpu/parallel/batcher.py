"""Cross-image device-call batching.

Batch mode runs one host search thread per image (the per-image control
flow is identical to single-image mode) and routes every device call
through a shared DeviceBatcher. Requests coalesce into batched device
executions; handlers run with the lock RELEASED, so multiple flushes stay
in flight at once — on the axon link the ~30 ms round-trip latency is
hidden by flush concurrency while other workers' host phases run.

Flush trigger — quiescence detection: a flush fires the moment EVERY
active worker is blocked inside submit() on a request that is not
already executing. At that point no further request can arrive (each
worker is single-threaded), so waiting longer cannot improve grouping
and flushing sooner cannot reduce it — grouping is maximal with zero
added latency, with no tuning knob. The round-2..4 design instead
polled a condition variable every 5 ms and held each request up to a
fixed 0.5 s deadline hoping peers would align; on a 1-core host the
poll wakeups and desync stalls made batch-of-16 3.2x SLOWER than a
serial loop (BENCH_r04.json). The `timeout` deadline is retained only
as a safety net for workers blocked outside the batcher (e.g. file IO).

This is the on-mesh analog of the reference test-suite's `xargs -P
nproc` fan-out (SURVEY.md §2, parallelism inventory).
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, Dict, List


class DeviceBatcher:
    """Coalesces concurrent device requests from worker threads.

    handlers: kind -> callable(list[payload], cache) -> list[result]. A
    handler receives every pending payload of its kind (it may subgroup by
    shape internally) and returns one result per payload, in order.
    """

    def __init__(self, handlers: Dict[str, Callable[..., List[Any]]],
                 timeout: float = 0.5, max_group=8):
        """max_group: int, or dict kind -> int (missing kinds default 1).
        A quiescence flush takes every pending request regardless of the
        caps — handlers subgroup to their lane widths internally — but a
        kind's cap also serves as an early trigger: once `cap` requests
        of a kind are pending, they flush without waiting for full
        quiescence (the group is as wide as its executable can use)."""
        self._handlers = handlers
        self._timeout = timeout
        self._max_group = (max_group if isinstance(max_group, dict)
                           else {k: max_group for k in handlers})
        self._cv = threading.Condition()
        self._active = 0          # registered workers
        self._waiting = 0         # workers blocked inside submit()
        self._pending: List[dict] = []   # submitted, not yet executing
        self.stats = {"flushes": 0, "requests": 0, "handler_s": 0.0,
                      "group_sizes": {}, "quiescence_flushes": 0,
                      "cap_flushes": 0, "deadline_flushes": 0,
                      "by_kind": {}}
        self.cache: Dict[Any, Any] = {}  # handler scratch (stacked pi0s)

    def register(self) -> None:
        with self._cv:
            self._active += 1

    def unregister(self) -> None:
        with self._cv:
            self._active -= 1
            # One fewer producer: the remaining waiters may now satisfy
            # the quiescence condition — let one of them re-check.
            self._cv.notify_all()

    def close(self) -> None:
        pass  # no dispatcher threads to stop

    # --- flush-policy helpers (call with the lock held) ---

    def _take_all_pending(self) -> List[dict]:
        batch, self._pending = self._pending, []
        return batch

    def _take_kind(self, kind: str) -> List[dict]:
        batch = [r for r in self._pending if r["kind"] == kind]
        self._pending = [r for r in self._pending if r["kind"] != kind]
        return batch

    def _quiescent(self) -> bool:
        """True when no pending request can gain further peers: every
        active worker is blocked in submit(). Workers whose request is
        already executing in a concurrent flush count as blocked (they
        cannot produce anything new until their result lands)."""
        return self._waiting >= self._active and self._pending

    def submit(self, kind: str, payload: Any) -> Any:
        req = {"kind": kind, "payload": payload, "done": False,
               "result": None, "error": None}
        cap = self._max_group.get(kind, 1)
        with self._cv:
            self._pending.append(req)
            self._waiting += 1
            try:
                deadline = time.monotonic() + self._timeout
                while not req["done"]:
                    batch = None
                    trigger = None
                    if len([r for r in self._pending
                            if r["kind"] == kind]) >= cap:
                        # the kind's executable is maximally wide
                        batch, trigger = self._take_kind(kind), "cap"
                    elif self._quiescent():
                        batch, trigger = self._take_all_pending(), \
                            "quiescence"
                    elif time.monotonic() >= deadline:
                        # safety net: a peer is blocked outside the
                        # batcher; stop waiting for it
                        if any(r is req for r in self._pending):
                            batch, trigger = self._take_kind(kind), \
                                "deadline"
                    if batch is not None:
                        self.stats[trigger + "_flushes"] += 1
                        self._execute(batch)  # releases the lock inside
                        continue   # req may or may not be in `batch`
                    # Event-driven wait: woken on new submissions (they
                    # re-check quiescence themselves before waiting, so
                    # only result delivery and unregister notify), with
                    # a bounded sleep so the safety deadline is checked.
                    self._cv.wait(timeout=max(
                        0.0, deadline - time.monotonic()) or 0.05)
            finally:
                self._waiting -= 1
        if req["error"] is not None:
            raise req["error"]
        return req["result"]

    def _execute(self, batch: List[dict]) -> None:
        """Runs handlers for `batch` with the lock RELEASED (device time
        overlaps other workers' host phases and other in-flight flushes),
        then delivers results."""
        self.stats["flushes"] += 1
        self.stats["requests"] += len(batch)
        g = self.stats["group_sizes"]
        g[len(batch)] = g.get(len(batch), 0) + 1
        by_kind: Dict[str, List[dict]] = {}
        for r in batch:
            by_kind.setdefault(r["kind"], []).append(r)
        self._cv.release()
        t0 = time.time()
        try:
            for kind, reqs in by_kind.items():
                tk = time.time()
                try:
                    results = self._handlers[kind](
                        [r["payload"] for r in reqs], self.cache)
                    for r, res in zip(reqs, results):
                        r["result"] = res
                except Exception as e:
                    # fail only requests without a delivered result, so a
                    # partially-processed flush keeps per-image isolation
                    for r in reqs:
                        if r["result"] is None:
                            r["error"] = e
                finally:
                    ks = self.stats["by_kind"].setdefault(
                        kind, {"calls": 0, "requests": 0, "seconds": 0.0})
                    ks["calls"] += 1
                    ks["requests"] += len(reqs)
                    ks["seconds"] += time.time() - tk
        finally:
            self.stats["handler_s"] += time.time() - t0
            self._cv.acquire()
            for r in batch:
                r["done"] = True
            self._cv.notify_all()
