"""ctypes bindings for the native host IO runtime (native/transflow_io.cpp).

Decode/resize/convert and encode run on native threads with no GIL,
exchanging frames with the JAX loop through bounded ring buffers — the
native equivalent of the reference's SourceProcess/OutputProcess
(transflow/pipeline.py:56-136). Builds on demand with make; everything
degrades gracefully to the pure-Python IO path when the library is
unavailable (is_available()).
"""
import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtransflow_io.so")
_lib = None
_build_lock = threading.Lock()


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=300)
            except (subprocess.SubprocessError, FileNotFoundError) as err:
                logger.warning("native IO build failed: %s", err)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as err:
            logger.warning("native IO load failed: %s", err)
            return None
        lib.tfio_reader_open.restype = ctypes.c_void_p
        lib.tfio_reader_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.tfio_reader_meta.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64)]
        lib.tfio_reader_next.restype = ctypes.c_int
        lib.tfio_reader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int]
        lib.tfio_reader_close.argtypes = [ctypes.c_void_p]
        lib.tfio_writer_open.restype = ctypes.c_void_p
        lib.tfio_writer_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_char_p]
        lib.tfio_writer_feed.restype = ctypes.c_int
        lib.tfio_writer_feed.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.tfio_writer_close.argtypes = [ctypes.c_void_p]
        lib.tfio_display.restype = ctypes.c_int
        lib.tfio_display.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


class NativeReader:
    """Background-decoded frame stream (file or camera)."""

    def __init__(self, path: str | int, width: int = 0, height: int = 0,
                 gray: bool = False, skip_frames: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        camera = path if isinstance(path, int) else -1
        encoded = b"" if isinstance(path, int) else str(path).encode()
        self._handle = lib.tfio_reader_open(encoded, camera, width, height,
                                            int(gray), skip_frames)
        if not self._handle:
            raise FileNotFoundError(f"Could not open {path!r}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        count = ctypes.c_int64()
        lib.tfio_reader_meta(self._handle, ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(fps), ctypes.byref(count))
        self.width, self.height = w.value, h.value
        self.fps = fps.value or 30.0
        self.frame_count = count.value
        self.gray = gray
        channels = 1 if gray else 3
        self._buffer = np.empty(
            (self.height, self.width, channels) if not gray
            else (self.height, self.width), dtype=np.uint8)

    def read(self, timeout_ms: int = 10000):
        """Next frame as a numpy array (copy), or None at end of stream."""
        ptr = self._buffer.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        status = self._lib.tfio_reader_next(
            self._handle, ptr, self._buffer.nbytes, timeout_ms)
        if status == -1:
            return None
        if status == 0:
            raise TimeoutError("native reader timed out")
        if status < 0:
            raise RuntimeError(f"native reader error {status}")
        return self._buffer.copy()

    def __iter__(self):
        while True:
            frame = self.read()
            if frame is None:
                return
            yield frame

    def close(self):
        if self._handle:
            self._lib.tfio_reader_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class NativeWriter:
    """Background-encoded RGB video writer."""

    def __init__(self, path: str, width: int, height: int, fps: float,
                 fourcc: str = "MJPG"):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._handle = lib.tfio_writer_open(
            str(path).encode(), width, height, fps, fourcc.encode()[:4])
        if not self._handle:
            raise RuntimeError(f"Could not open writer for {path!r}")

    def feed(self, rgb: np.ndarray):
        rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
        ptr = rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if not self._lib.tfio_writer_feed(self._handle, ptr, rgb.nbytes):
            raise RuntimeError("native writer rejected frame")

    def close(self):
        if self._handle:
            self._lib.tfio_writer_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def display(window: str, rgb: np.ndarray, wait_ms: int = 1) -> int:
    """Show a frame in a native window; returns the pressed key or -1."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    ptr = rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    return lib.tfio_display(window.encode(), ptr, rgb.shape[1], rgb.shape[0],
                            wait_ms)
