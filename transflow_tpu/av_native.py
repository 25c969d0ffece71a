"""ctypes bindings for the native libav shim (native/transflow_av.cpp).

Gives this framework direct FFmpeg-library access where the runtime image
has neither an ``ffmpeg`` binary nor PyAV:

* ``MvReader`` — motion-vector export decode, the production backend for
  ``--mv`` (reference semantics: transflow/flow/sources/av.py:29-77). The
  shim hands back the decoder's raw ``AVMotionVector`` side-data records;
  numpy parses them zero-copy with :data:`MV_DTYPE`.
* ``H264Writer`` — libx264 encode (rgb24 in, yuv420p out, container from
  the path), the real-codec tier of the encoded-output chain and the
  generator for bf=0/refs=1 fixtures the MV source requires (av.py:69).

Builds on demand with make; degrades gracefully (is_available()).
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
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtransflow_av.so")
_lib = None
_build_lock = threading.Lock()

# libavutil/motion_vector.h AVMotionVector, x86-64 layout: the uint64 flags
# field aligns to 8, padding the 14 leading bytes to 16; trailing pad takes
# the struct to 40. The shim reports sizeof(AVMotionVector) and MvReader
# asserts it matches, so an ABI drift fails loudly instead of misparsing.
MV_DTYPE = np.dtype({
    "names": ["source", "w", "h", "src_x", "src_y", "dst_x", "dst_y",
              "flags", "motion_x", "motion_y", "motion_scale"],
    "formats": ["<i4", "u1", "u1", "<i2", "<i2", "<i2", "<i2",
                "<u8", "<i4", "<i4", "<u2"],
    "offsets": [0, 4, 5, 6, 8, 10, 12, 16, 24, 28, 32],
    "itemsize": 40,
})


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.isfile(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR,
                                "libtransflow_av.so"], check=True,
                               capture_output=True, timeout=300)
            except (subprocess.SubprocessError, FileNotFoundError) as err:
                logger.warning("native libav build failed: %s", err)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as err:
            logger.warning("native libav load failed: %s", err)
            return None
        lib.tfav_dec_open.restype = ctypes.c_void_p
        lib.tfav_dec_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.tfav_dec_error.restype = ctypes.c_char_p
        lib.tfav_dec_error.argtypes = [ctypes.c_void_p]
        lib.tfav_dec_info.restype = ctypes.c_int
        lib.tfav_dec_info.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64)]
        lib.tfav_dec_next.restype = ctypes.c_int
        lib.tfav_dec_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.tfav_dec_rewind.restype = ctypes.c_int
        lib.tfav_dec_rewind.argtypes = [ctypes.c_void_p]
        lib.tfav_dec_close.argtypes = [ctypes.c_void_p]
        lib.tfav_enc_open.restype = ctypes.c_void_p
        lib.tfav_enc_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p]
        lib.tfav_enc_error.restype = ctypes.c_char_p
        lib.tfav_enc_error.argtypes = [ctypes.c_void_p]
        lib.tfav_enc_write.restype = ctypes.c_int
        lib.tfav_enc_write.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_uint8)]
        lib.tfav_enc_close.restype = ctypes.c_int
        lib.tfav_enc_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


class MvReader:
    """Sequential decode of a video's motion-vector side data.

    ``next()`` returns one frame's records as a numpy recarray over
    :data:`MV_DTYPE` (attribute access mirrors PyAV's MotionVector fields:
    source, w, h, src_x, src_y, dst_x, dst_y, motion_x, motion_y,
    motion_scale), an empty array for frames without side data, or None at
    end of stream."""

    def __init__(self, path: str, format: str | None = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native libav library unavailable")
        self._lib = lib
        self._handle = lib.tfav_dec_open(
            str(path).encode(), format.encode() if format else None)
        err = lib.tfav_dec_error(self._handle)
        if err:
            message = err.decode()
            lib.tfav_dec_close(self._handle)
            self._handle = None
            raise FileNotFoundError(f"Could not open {path!r}: {message}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        count = ctypes.c_int64()
        lib.tfav_dec_info(self._handle, ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(fps), ctypes.byref(count))
        self.width, self.height = w.value, h.value
        self.fps = fps.value
        self.frame_count = count.value  # 0 = container doesn't know

    def next(self) -> np.recarray | None:
        data = ctypes.POINTER(ctypes.c_uint8)()
        n = ctypes.c_int()
        rec = ctypes.c_int()
        status = self._lib.tfav_dec_next(
            self._handle, ctypes.byref(data), ctypes.byref(n),
            ctypes.byref(rec))
        if status == 0:
            return None
        if status < 0:
            err = self._lib.tfav_dec_error(self._handle)
            raise RuntimeError("native decode failed: "
                               + (err.decode() if err else str(status)))
        assert rec.value == MV_DTYPE.itemsize, (
            f"AVMotionVector ABI drift: sizeof={rec.value}, "
            f"dtype={MV_DTYPE.itemsize} — update MV_DTYPE for this libav")
        if n.value == 0 or not data:
            return np.recarray(0, dtype=MV_DTYPE)
        raw = ctypes.string_at(data, n.value * rec.value)  # copy out
        return np.frombuffer(raw, dtype=MV_DTYPE).view(np.recarray)

    def rewind(self):
        if self._lib.tfav_dec_rewind(self._handle) < 0:
            err = self._lib.tfav_dec_error(self._handle)
            raise RuntimeError("native rewind failed: "
                               + (err.decode() if err else "?"))

    def close(self):
        if self._handle:
            self._lib.tfav_dec_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# user-facing vcodec names -> libavcodec encoder names available here
ENCODERS = {"h264": "libx264", "libx264": "libx264",
            "h265": "libx265", "hevc": "libx265", "libx265": "libx265"}


class H264Writer:
    """Real-codec video writer (rgb24 frames in, muxer picked from the
    path, encoder from ``codec`` — libx264 by default, libx265 works too).

    ``max_b_frames=0, refs=1`` (the defaults) produce streams whose motion
    vectors the MV flow source accepts (reference av.py:69 asserts
    source == -1, i.e. no bidirectional prediction)."""

    def __init__(self, path: str, width: int, height: int, fps: float,
                 gop: int = 0, max_b_frames: int = 0, refs: int = 1,
                 crf: int = 18, preset: str = "fast",
                 codec: str = "libx264"):
        lib = _load()
        if lib is None:
            raise RuntimeError("native libav library unavailable")
        self._lib = lib
        self.width, self.height = width, height
        self._handle = lib.tfav_enc_open(
            str(path).encode(), ENCODERS.get(codec, codec).encode(),
            width, height, fps, gop, max_b_frames, refs, crf,
            preset.encode())
        err = lib.tfav_enc_error(self._handle)
        if err:
            message = err.decode()
            lib.tfav_enc_close(self._handle)
            self._handle = None
            raise RuntimeError(f"Could not open H264 writer for "
                               f"{path!r}: {message}")

    def feed(self, rgb: np.ndarray):
        if rgb.shape != (self.height, self.width, 3):
            raise ValueError(f"expected {(self.height, self.width, 3)}, "
                             f"got {rgb.shape}")
        rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
        ptr = rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if self._lib.tfav_enc_write(self._handle, ptr) < 0:
            err = self._lib.tfav_enc_error(self._handle)
            raise RuntimeError("native encode failed: "
                               + (err.decode() if err else "?"))

    def close(self):
        if self._handle:
            status = self._lib.tfav_enc_close(self._handle)
            self._handle = None
            if status < 0:
                raise RuntimeError(f"native encoder close failed ({status})")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
