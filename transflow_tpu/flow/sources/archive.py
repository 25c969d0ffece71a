"""Replay of a precomputed .flow.zip archive.

Parity reference: transflow/flow/sources/archive.py:10-51 — meta.json
(direction, width, height, framerate) + one %09d.npy per frame.

TPU-side this is the fastest render mode (no estimator in the device
program — engine.device_scan_flows), which makes the host-side
unzip+np.load the throughput wall. Two measures:

* whole-member reads (``zf.read`` + ``np.load`` from memory) instead of
  streamed ``np.load`` over ``zf.open`` — one large zlib inflate call
  per frame instead of ZipExtFile's small-chunk loop (+23% single-
  thread, 3.5 -> 4.3 fps on a 16.6 MB/frame incompressible archive);
* a thread-pool prefetcher decoding several frames concurrently —
  DEFLATE inflation runs in zlib with the GIL released, each worker
  owns its own ZipFile handle (reads on a shared handle serialize on
  an internal lock), entries are keyed by exact frame index so
  seek/repeat/checkpoint-resume replay the same bytes as the
  sequential reader, and a bounded lookahead caps the decoded-frame
  cache. The pool sizes to ``min(4, cpu_count)`` and self-disables on
  single-CPU hosts, where threads only add contention (measured: 4
  threads = 0.97x on this 1-CPU image — the pool's win needs real
  cores). ``TRANSFLOW_ARCHIVE_THREADS`` overrides (0|1 = sequential;
  output is bit-identical either way, tested).
"""
import concurrent.futures
import io
import json
import os
import threading
import zipfile

import numpy as np

from .. import Direction
from .base import FlowItem, FlowSource

#: frames decoded ahead of the cursor; bounds the cache at
#: LOOKAHEAD x (H x W x 2 x itemsize) bytes (~133 MB at 1080p f32)
LOOKAHEAD = 8


class ArchiveFlowSource(FlowSource):

    yields_frames = False

    def __init__(self, path: str, **kwargs):
        super().__init__(**kwargs)
        self.path = path
        self.archive: zipfile.ZipFile | None = None
        self._pool: concurrent.futures.ThreadPoolExecutor | None = None
        self._pending: dict[int, concurrent.futures.Future] = {}
        self._names: frozenset[str] = frozenset()
        self._tls = threading.local()
        self._handles: list[zipfile.ZipFile] = []
        self._handles_lock = threading.Lock()

    def _open_reader(self):
        self.archive = zipfile.ZipFile(self.path)
        with self.archive.open("meta.json") as file:
            meta = json.loads(file.read().decode())
        # archives carry their own direction (older ones were forward-only)
        self.direction = Direction(
            meta.get("direction", Direction.FORWARD.value))
        self.width = meta["width"]
        self.height = meta["height"]
        self.framerate = meta["framerate"]
        self._names = frozenset(
            n for n in self.archive.namelist() if n.endswith(".npy"))
        self.base_length = len(self._names)
        workers = int(os.environ.get("TRANSFLOW_ARCHIVE_THREADS",
                                     min(4, os.cpu_count() or 1)))
        if workers > 1:
            self._pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=workers,
                thread_name_prefix="transflow-archive")

    def _rewind_reader(self, frame_index: int):
        pass  # random access by name; prefetch is keyed by exact index

    def _worker_zip(self) -> zipfile.ZipFile:
        handle = getattr(self._tls, "zip", None)
        if handle is None:
            handle = zipfile.ZipFile(self.path)
            self._tls.zip = handle
            with self._handles_lock:
                self._handles.append(handle)
        return handle

    def _load(self, index: int) -> np.ndarray:
        # whole-member read: ONE large inflate (GIL released) per frame
        return np.load(io.BytesIO(
            self._worker_zip().read(f"{index:09d}.npy")))

    def _read_item(self) -> FlowItem:
        index = self.input_frame_index
        name = f"{index:09d}.npy"
        if self._pool is None:
            try:
                flow = np.load(io.BytesIO(self.archive.read(name)))
            except KeyError:
                raise StopIteration from None
            return FlowItem(FlowItem.FLOW, flow.astype(np.float32))
        if name not in self._names:
            raise StopIteration
        # drop entries a seek/rewind left behind (stale indexes would pin
        # decoded frames for the rest of the run)
        window = range(index, index + LOOKAHEAD)
        for stale in [i for i in self._pending if i not in window]:
            self._pending.pop(stale).cancel()
        for ahead in window:
            if (ahead not in self._pending
                    and f"{ahead:09d}.npy" in self._names):
                self._pending[ahead] = self._pool.submit(self._load, ahead)
        flow = self._pending.pop(index).result()
        return FlowItem(FlowItem.FLOW, flow.astype(np.float32))

    def _close_reader(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None
        self._pending.clear()
        with self._handles_lock:
            for handle in self._handles:
                handle.close()
            self._handles.clear()
        if self.archive is not None:
            self.archive.close()
