"""Encoded video file output.

Parity reference: transflow/output/ffmpeg.py:10-66 (raw rgb24 piped into an
ffmpeg subprocess). Writer chain, best first:

1. native libav writer (transflow_tpu/av_native.py) — real libx264/libx265
   encode through the system FFmpeg libraries, for h264/h265 vcodecs;
2. native IO writer (native/transflow_io.cpp) — cv2 codecs off the GIL;
3. ffmpeg binary subprocess (the reference's own mechanism), when present;
4. cv2.VideoWriter fallback.
"""
import logging
import shutil
import subprocess

import numpy as np

from ..utils import find_unique_path, startfile
from .video_output import VideoOutput

logger = logging.getLogger(__name__)

_FOURCC = {
    "h264": "avc1",
    "h265": "hev1",
    "hevc": "hev1",
    "mp4v": "mp4v",
    "mjpeg": "MJPG",
    "vp9": "VP90",
}


class EncodedVideoOutput(VideoOutput):

    def __init__(self, path: str, width: int, height: int, framerate: float,
                 vcodec: str = "h264", execute: bool = False,
                 replace: bool = False):
        super().__init__(width, height, framerate)
        self.output_path = path if replace else find_unique_path(path)
        self.vcodec = vcodec
        self.execute = execute
        self.process: subprocess.Popen | None = None
        self.writer = None
        self.native = None
        self.libav = None

    def open(self):
        # first choice for real codecs: the native libav writer — actual
        # libx264/libx265 encode (the reference's default is `-vcodec
        # h264`, transflow/output/ffmpeg.py:40-47), which neither cv2 (no
        # H.264 encoder in this build) nor the MJPG native writer gives;
        # ctypes releases the GIL for the duration of each encode call
        try:
            from ..av_native import ENCODERS, H264Writer
            if self.vcodec in ENCODERS:
                self.libav = H264Writer(
                    self.output_path, self.width, self.height,
                    self.framerate, codec=self.vcodec)
                return self
        except Exception:  # noqa: BLE001 — fall through to other writers
            logger.debug("libav writer unavailable", exc_info=True)
        self.libav = None
        # next, the native IO writer: encode + color conversion run on a
        # C++ thread with no GIL (native/transflow_io.cpp)
        try:
            from ..native import NativeWriter, is_available
            if is_available():
                self.native = NativeWriter(
                    self.output_path, self.width, self.height,
                    self.framerate,
                    fourcc=_FOURCC.get(self.vcodec, "mp4v"))
                return self
        except Exception:  # noqa: BLE001 — fall through to python writers
            logger.debug("native writer unavailable", exc_info=True)
        self.native = None
        ffmpeg = shutil.which("ffmpeg")
        if ffmpeg is not None:
            self.process = subprocess.Popen(
                [ffmpeg, "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
                 "-s", f"{self.width}x{self.height}",
                 "-r", str(self.framerate), "-i", "-",
                 "-pix_fmt", "yuv420p", "-vcodec", self.vcodec,
                 "-loglevel", "error", self.output_path],
                stdin=subprocess.PIPE)
            return self
        import cv2
        fourcc = cv2.VideoWriter_fourcc(*_FOURCC.get(self.vcodec, "mp4v"))
        self.writer = cv2.VideoWriter(
            self.output_path, fourcc, self.framerate,
            (self.width, self.height))
        if not self.writer.isOpened():
            # last-resort codec
            self.writer = cv2.VideoWriter(
                self.output_path, cv2.VideoWriter_fourcc(*"mp4v"),
                self.framerate, (self.width, self.height))
        if not self.writer.isOpened():
            raise RuntimeError(
                f"Could not open video writer for {self.output_path!r}")
        return self

    def feed(self, frame):
        frame = np.asarray(frame, dtype=np.uint8)
        if self.libav is not None:
            self.libav.feed(frame)
        elif self.native is not None:
            self.native.feed(frame)
        elif self.process is not None:
            self.process.stdin.write(frame.tobytes())
        else:
            import cv2
            self.writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))

    def close(self):
        if self.libav is not None:
            self.libav.close()
            self.libav = None
        if self.native is not None:
            self.native.close()
            self.native = None
        if self.process is not None:
            self.process.stdin.close()
            self.process.wait()
            self.process = None
        if self.writer is not None:
            self.writer.release()
            self.writer = None
        if self.execute and self.output_path:
            startfile(self.output_path)
