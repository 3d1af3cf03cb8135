"""Cross-image device-call batching.

Batch mode runs one host search thread per image (the per-image control
flow is identical to single-image mode), but routes every device call
through a shared DeviceBatcher. The batcher coalesces concurrent requests
of the same kind into ONE batched device execution — so B images pay a
single tunnel round trip (~70 ms on the axon link) per optimizer
iteration instead of B of them, and the batched tensors are big enough to
utilize the chip.

This is the on-mesh analog of the reference test-suite's `xargs -P nproc`
fan-out (SURVEY.md section 2, parallelism inventory): independent images,
data-parallel — except the parallelism is batched device executions
rather than processes.

Flush policy: a request flushes when every registered worker has one
pending (the common lock-step case) or after `timeout` seconds, whichever
comes first — stragglers and desynced searches run in smaller groups.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Dict, List, Optional


class DeviceBatcher:
    """Coalesces concurrent device requests from worker threads.

    handlers: kind -> callable(list[payload]) -> list[result]. A handler
    receives every pending payload of its kind (the handler may subgroup
    by shape internally) and returns one result per payload, in order.
    """

    def __init__(self, handlers: Dict[str, Callable[[List[Any]], List[Any]]],
                 timeout: float = 0.02):
        self._handlers = handlers
        self._timeout = timeout
        self._cv = threading.Condition()
        self._active = 0
        self._pending: List[dict] = []   # {kind, payload, done, result}
        self.stats = {"flushes": 0, "requests": 0, "handler_s": 0.0,
                      "group_sizes": {}}
        self.cache: Dict[Any, Any] = {}  # handler scratch (e.g. stacked pi0)

    def register(self) -> None:
        with self._cv:
            self._active += 1

    def unregister(self) -> None:
        with self._cv:
            self._active -= 1
            # A departing worker may be what a full flush was waiting for.
            self._cv.notify_all()

    def submit(self, kind: str, payload: Any) -> Any:
        req = {"kind": kind, "payload": payload, "done": False,
               "result": None, "error": None}
        with self._cv:
            self._pending.append(req)
            self._cv.notify_all()
            while not req["done"]:
                n_waiting = sum(1 for r in self._pending if not r["done"])
                if n_waiting >= self._active:
                    self._flush_locked()
                elif not self._cv.wait(self._timeout):
                    # timed out: flush whatever is pending
                    if not req["done"]:
                        self._flush_locked()
        if req["error"] is not None:
            raise req["error"]
        return req["result"]

    def _flush_locked(self) -> None:
        import time as _time
        batch = [r for r in self._pending if not r["done"]]
        self._pending = []
        if not batch:
            return
        by_kind: Dict[str, List[dict]] = {}
        for r in batch:
            by_kind.setdefault(r["kind"], []).append(r)
        self.stats["flushes"] += 1
        self.stats["requests"] += len(batch)
        g = self.stats["group_sizes"]
        g[len(batch)] = g.get(len(batch), 0) + 1
        # Execute while holding the lock: the device is a single serial
        # resource and the host side of these handlers is the GIL-bound
        # bottleneck anyway; holding it keeps result delivery simple.
        t0 = _time.time()
        for kind, reqs in by_kind.items():
            try:
                results = self._handlers[kind](
                    [r["payload"] for r in reqs], self.cache)
                for r, res in zip(reqs, results):
                    r["result"] = res
                    r["done"] = True
            except Exception as e:  # deliver the failure to every waiter
                for r in reqs:
                    r["error"] = e
                    r["done"] = True
        self.stats["handler_s"] += _time.time() - t0
        self._cv.notify_all()
