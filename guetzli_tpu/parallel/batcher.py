"""Cross-image device-call batching.

Batch mode runs one host search thread per image (the per-image control
flow is identical to single-image mode) and routes every device call
through a shared DeviceBatcher. Requests coalesce into batched device
executions; crucially, handlers run with the lock RELEASED and any waiting
worker may flush, so MANY flushes stay in flight at once — on the axon
link the ~60 ms round-trip latency is hidden by flush concurrency (each
puller drops the GIL), while other workers' Python/native host phases run.

Flush trigger: half the active workers pending, or the per-request
deadline (stragglers). Measured on bees.png q95: batch-of-16 runs at
~2.1x the reference encoder's published throughput on one chip.

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
                 timeout: float = 0.05, max_group=8):
        """max_group: int, or dict kind -> int (missing kinds default 1).
        Kinds with max_group 1 flush as singletons (requests overlap via
        concurrent flushes); kinds with a larger cap wait up to `timeout`
        to coalesce into one grouped handler call."""
        self._handlers = handlers
        self._timeout = timeout
        self._max_group = (max_group if isinstance(max_group, dict)
                           else {k: max_group for k in handlers})
        self._cv = threading.Condition()
        self._active = 0
        self._pending: List[dict] = []
        self.stats = {"flushes": 0, "requests": 0, "handler_s": 0.0,
                      "group_sizes": {}}
        self.cache: Dict[Any, Any] = {}  # handler scratch (stacked pi0s)

    def register(self) -> None:
        with self._cv:
            self._active += 1

    def unregister(self) -> None:
        with self._cv:
            self._active -= 1
            self._cv.notify_all()

    def close(self) -> None:
        pass  # no dispatcher threads to stop

    def _group_target(self, kind: str) -> int:
        cap = self._max_group.get(kind, 1)
        if cap <= 1:
            return 1
        # Grouped kinds aim for every active worker (lockstep images all
        # arrive within ms of each other once groups synchronize them);
        # the per-request deadline flushes a partial group when phases
        # are misaligned, so a high target costs at most `timeout`.
        return max(1, min(cap, self._active))

    def submit(self, kind: str, payload: Any) -> Any:
        req = {"kind": kind, "payload": payload, "done": False,
               "result": None, "error": None}
        with self._cv:
            self._pending.append(req)
            self._cv.notify_all()
            deadline = time.monotonic() + self._timeout
            while not req["done"]:
                batch = None
                mine = [r for r in self._pending if r["kind"] == kind]
                if (len(mine) >= self._group_target(kind)
                        or time.monotonic() >= deadline):
                    # identity check: payload dicts hold numpy arrays, so
                    # `in` (== comparison) would be ambiguous
                    if any(r is req for r in mine):
                        batch = mine
                        keep = [r for r in self._pending
                                if r["kind"] != kind]
                        self._pending = keep
                if batch is not None:
                    self._execute(batch)   # releases the lock inside
                    # _execute completes this request; loop exits next pass
                elif not self._cv.wait(0.005):
                    pass                   # re-check trigger/deadline
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
            self.stats["handler_s"] += time.time() - t0
            self._cv.acquire()
            for r in batch:
                r["done"] = True
            self._cv.notify_all()
