"""Cross-image device-call batching.

Batch mode runs one host search thread per image (the per-image control
flow is identical to single-image mode), but routes every device call
through a shared DeviceBatcher. The batcher coalesces concurrent requests
of the same kind into ONE batched device execution — so a group of images
pays a single tunnel round trip (~60 ms on the axon link) per optimizer
iteration instead of one each.

Scheduling (single-core host): the flush trigger is HALF the active
workers, and handlers execute OUTSIDE the lock — so while one half-group's
batched device call is in flight (the waiting thread releases the GIL),
the other half's threads run their Python/native host phases. Device and
host work pipeline instead of strictly alternating.

This is the on-mesh analog of the reference test-suite's `xargs -P nproc`
fan-out (SURVEY.md §2, parallelism inventory).
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
                 timeout: float = 0.05):
        self._handlers = handlers
        self._timeout = timeout
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

    def _group_target(self) -> int:
        # Half the workers per flush: the other half's host work overlaps
        # this flush's device time.
        return max(1, (self._active + 1) // 2)

    def submit(self, kind: str, payload: Any) -> Any:
        req = {"kind": kind, "payload": payload, "done": False,
               "result": None, "error": None}
        with self._cv:
            self._pending.append(req)
            self._cv.notify_all()
            deadline = time.monotonic() + self._timeout
            while not req["done"]:
                batch = None
                if (len(self._pending) >= self._group_target()
                        or time.monotonic() >= deadline):
                    if req in self._pending:
                        batch = self._pending
                        self._pending = []
                if batch is not None:
                    self._execute(batch)   # releases the lock inside
                    deadline = time.monotonic() + self._timeout
                elif not self._cv.wait(0.005):
                    pass                   # re-check trigger/deadline
        if req["error"] is not None:
            raise req["error"]
        return req["result"]

    def _execute(self, batch: List[dict]) -> None:
        """Runs handlers for `batch` with the lock RELEASED (device time
        overlaps other workers' host phases), then delivers results."""
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
                    for r in reqs:
                        r["error"] = e
        finally:
            self.stats["handler_s"] += time.time() - t0
            self._cv.acquire()
            for r in batch:
                r["done"] = True
            self._cv.notify_all()
