"""Dynamic request coalescing for the serving engine (beyond-reference).

Each CP scoring request is one fused device program (serve/engine.py), but
a device dispatch has a hard latency floor — ~30 ms through a remote relay,
~0.2 ms direct-attached (BENCHMARKS.md serving table). Under concurrent
load those dispatches serialize. The coalescer collects requests that
arrive within a small window and scores them through ONE
``cp_score_batch`` program: N concurrent requests cost one dispatch
instead of N.

The reference demo has no equivalent (one Gradio click = one forward,
reference demo/app.py:121-145); this exists for the production-serving
story. Opt-in via ``serve(..., coalesce_ms=...)`` / ``cli demo
--coalesce-ms``.
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
from typing import List, Sequence

_CLOSE = object()


class CoalescingCPScorer:
    """Batches concurrent ``cp_score`` calls into ``cp_score_batch``.

    window_ms: how long the collector waits for more requests after the
        first one arrives (the added worst-case latency when idle).
    max_batch: every fused call is padded to exactly this size (duplicate
        of the first request, sliced away), so the coalescer compiles ONE
        cp_score_batch bucket — warmed at construction — and no request
        ever stalls behind a fresh remote compile (minutes, CLAUDE.md).
        Padding is device-side batch rows: ~free next to the dispatch.
    """

    def __init__(self, engine, window_ms: float = 3.0, max_batch: int = 64):
        self.engine = engine
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self.batch_calls = 0  # observability + tests
        self._closed = False
        self._q: queue.Queue = queue.Queue()
        if not engine.mock:  # compile the single bucket before serving
            dummy = engine.sample_outfit(2)
            engine.cp_score_batch([dummy] * max_batch)
        self._thread = threading.Thread(
            target=self._loop, name="cp-coalescer", daemon=True
        )
        self._thread.start()

    def score(self, item_ids: Sequence[int]) -> float:
        """Blocking scoring call, safe from many threads."""
        if self._closed:
            raise RuntimeError("CoalescingCPScorer is closed")
        ids = [int(i) for i in item_ids]
        # Validate ids on the caller's thread so a bad request cannot
        # poison the shared batch it would have joined.
        for i in ids:
            self.engine.lookup_row(i)
        fut: concurrent.futures.Future = concurrent.futures.Future()
        self._q.put((ids, fut))
        return fut.result()

    def close(self) -> None:
        self._closed = True
        self._q.put(_CLOSE)
        self._thread.join(timeout=5)

    # ------------------------------------------------------- collector --
    def _drain(self, first) -> List:
        import time

        batch = [first]
        deadline = time.monotonic() + self.window
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if item is _CLOSE:
                self._q.put(_CLOSE)  # re-post for the outer loop
                break
            batch.append(item)
        return batch

    def _flush_on_close(self) -> None:
        """Fail any request that raced past the _closed check and landed
        behind the close sentinel — nobody may block forever."""
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is not _CLOSE:
                item[1].set_exception(
                    RuntimeError("CoalescingCPScorer closed")
                )

    def _loop(self) -> None:
        while True:
            item = self._q.get()
            if item is _CLOSE:
                self._flush_on_close()
                return
            batch = self._drain(item)
            try:
                outfits = [b[0] for b in batch]
                # fixed-size submission: one compiled bucket, ever
                outfits += [outfits[0]] * (self.max_batch - len(outfits))
                scores = self.engine.cp_score_batch(outfits)
                self.batch_calls += 1
                for (_, fut), s in zip(batch, scores):
                    fut.set_result(float(s))
            except Exception:
                # Score individually so one failing outfit (or a transient
                # device error) does not fail the whole coalesced batch.
                for ids, fut in batch:
                    try:
                        fut.set_result(self.engine.cp_score(ids))
                    except Exception as e:  # per-request failure
                        fut.set_exception(e)
