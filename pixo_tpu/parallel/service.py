"""Compression service: the operational analog of the reference's web
worker RPC (``web/src/lib/compress-client.ts:1-117`` + ``compress.worker.ts``).

The reference front-end wraps its WASM encoder in a Worker with request
ids, a 120 s per-request timeout, a cancellation set, and crash recovery
that rejects every pending request and respawns the worker. This module
provides the same contract around the native/JAX encoders for batch and
serving deployments:

  - ``CompressService.submit_png/submit_jpeg/submit_resize`` -> request
    handle with an id (the postMessage id analog)
  - per-request timeout (default 120 s, like ``REQUEST_TIMEOUT_MS``)
  - ``cancel(request)`` — pending requests are dropped; in-flight results
    are discarded on arrival (the cancellation-set semantics)
  - worker-crash detection: a dead worker process rejects ALL pending
    requests with ``WorkerCrashed`` and the pool respawns, matching
    ``compress-client.ts:52-60``.

Workers are separate processes (like the Worker thread boundary), so a
native-code crash cannot take down the caller.
"""

from __future__ import annotations

import concurrent.futures
import itertools
import multiprocessing
import os
import threading
import time
from concurrent.futures.process import BrokenProcessPool
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np


def _worker_init() -> None:
    # Workers only ever need the host tier; pinning the CPU platform keeps
    # them off the TPU runtime (one process per chip is the TPU contract).
    # The env var alone is not enough: this harness's TPU plugin injects
    # itself over JAX_PLATFORMS, and a worker that touches a wedged TPU
    # runtime hangs its first request past any deadline — set the config
    # explicitly after import, before any backend initialization.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")


class RequestTimeout(Exception):
    """The request exceeded its deadline (client-side reject, like the
    reference's 120 s timer; the worker's eventual result is dropped)."""


class RequestCancelled(Exception):
    """The request was cancelled before completion."""


class WorkerCrashed(Exception):
    """A worker process died; all requests pending at crash time are
    rejected with this error and the pool is respawned."""


def _encode_png_task(img: np.ndarray, options) -> bytes:
    from ..png import encoder as penc

    return penc.encode(img, options)


def _encode_jpeg_task(img: np.ndarray, options) -> bytes:
    from ..jpeg import encoder as jenc

    return jenc.encode(img, options)


def _resize_task(img: np.ndarray, options) -> np.ndarray:
    from ..resize import resize as do_resize

    return do_resize(img, options)


@dataclass
class Request:
    """Handle for one submitted compression request."""

    id: int
    deadline: float
    _future: concurrent.futures.Future = field(repr=False)
    _service: "CompressService" = field(repr=False)

    def result(self, timeout: Optional[float] = None) -> Any:
        """Block for the result, honoring the request deadline."""
        budget = self.deadline - time.monotonic()
        if timeout is not None:
            budget = min(budget, timeout)
        try:
            return self._future.result(timeout=max(budget, 0.0))
        except concurrent.futures.TimeoutError:
            self._service.cancel(self)
            raise RequestTimeout(
                f"request {self.id} timed out"
            ) from None
        except concurrent.futures.CancelledError:
            raise RequestCancelled(f"request {self.id} cancelled") from None
        except BrokenProcessPool:
            raise WorkerCrashed(
                f"worker died while serving request {self.id}"
            ) from None

    def done(self) -> bool:
        return self._future.done()


class CompressService:
    """Process-pool compression service with the reference front-end's
    operational contract (ids, timeout, cancellation, crash recovery)."""

    def __init__(self, workers: int = 2, timeout_s: float = 120.0):
        self._workers = workers
        self._timeout_s = timeout_s
        self._ids = itertools.count(1)
        self._lock = threading.Lock()
        self._pending: dict = {}  # id -> Request
        self._pool = self._spawn()

    def _spawn(self):
        # spawn, not fork: the parent runs JAX/XLA threads, and forking a
        # threaded process can copy held mutexes into the child (deadlock).
        return concurrent.futures.ProcessPoolExecutor(
            max_workers=self._workers,
            mp_context=multiprocessing.get_context("spawn"),
            initializer=_worker_init,
        )

    # -- submission ---------------------------------------------------------

    def _submit(self, fn, *args, timeout: Optional[float] = None) -> Request:
        deadline = time.monotonic() + (
            timeout if timeout is not None else self._timeout_s
        )
        with self._lock:
            try:
                fut = self._pool.submit(fn, *args)
            except BrokenProcessPool:
                self._recover_locked()
                fut = self._pool.submit(fn, *args)
            req = Request(
                id=next(self._ids), deadline=deadline,
                _future=fut, _service=self,
            )
            self._pending[req.id] = req
            fut.add_done_callback(lambda f, rid=req.id: self._on_done(rid, f))
        return req

    def submit_png(self, img, options, timeout: Optional[float] = None) -> Request:
        return self._submit(_encode_png_task, np.asarray(img), options,
                            timeout=timeout)

    def submit_jpeg(self, img, options, timeout: Optional[float] = None) -> Request:
        return self._submit(_encode_jpeg_task, np.asarray(img), options,
                            timeout=timeout)

    def submit_resize(self, img, options, timeout: Optional[float] = None) -> Request:
        return self._submit(_resize_task, np.asarray(img), options,
                            timeout=timeout)

    def submit_raw(self, fn, *args, timeout: Optional[float] = None) -> Request:
        """Run an arbitrary picklable callable in a worker (test hook and
        escape hatch, like the worker's generic message dispatch)."""
        return self._submit(fn, *args, timeout=timeout)

    # -- lifecycle ----------------------------------------------------------

    def _on_done(self, rid: int, fut: concurrent.futures.Future) -> None:
        with self._lock:
            self._pending.pop(rid, None)
        exc = fut.exception() if not fut.cancelled() else None
        if isinstance(exc, BrokenProcessPool):
            self._handle_crash()

    def cancel(self, req: Request) -> bool:
        """Drop a request: pending ones are cancelled outright; in-flight
        results are discarded when they arrive (cancellation-set
        semantics — the worker cannot be interrupted mid-encode)."""
        with self._lock:
            self._pending.pop(req.id, None)
        return req._future.cancel()

    def _handle_crash(self) -> None:
        with self._lock:
            self._recover_locked()

    def _recover_locked(self) -> None:
        """Reject all pending requests and respawn the pool
        (``compress-client.ts:52-60`` worker-crash behavior)."""
        stale = list(self._pending.values())
        self._pending.clear()
        for req in stale:
            if not req._future.done():
                req._future.cancel()
        old = self._pool
        self._pool = self._spawn()
        # Tear the broken pool down off-thread: this method can run on the
        # old pool's own management thread (future done-callbacks fire
        # inside its _terminate_broken, which holds executor locks that
        # shutdown() would need — calling it here deadlocks).
        threading.Thread(
            target=lambda: old.shutdown(wait=False, cancel_futures=True),
            daemon=True,
        ).start()

    def pending_count(self) -> int:
        with self._lock:
            return len(self._pending)

    def close(self) -> None:
        self._pool.shutdown(wait=True, cancel_futures=True)

    def __enter__(self) -> "CompressService":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
