"""Video pixmap source (cv2 reader with seek / repeat / alteration).

Parity reference: transflow/pixmap/cv.py:11-66.
"""
import warnings

import cv2
import numpy as np

from .base import PixmapSource


class VideoPixmapSource(PixmapSource):

    def __init__(self, path: str, seek: int | None = None,
                 seek_time: float | None = None,
                 alteration_path: str | None = None, repeat: int = 1):
        super().__init__(alteration_path)
        self.path = path
        self.capture: cv2.VideoCapture | None = None
        self.seek = seek
        self.seek_time = seek_time
        self.repeat = repeat
        self.loop_index = 1

    @property
    def is_constant(self) -> bool:
        return False

    def rewind(self):
        assert self.capture is not None
        self.capture.set(cv2.CAP_PROP_POS_MSEC, 0)
        if self.seek is not None:
            for _ in range(self.seek):
                self.capture.read()

    def open(self):
        self.load_alteration()
        self.capture = cv2.VideoCapture(self.path)
        if not self.capture.isOpened():
            raise FileNotFoundError(
                f"Could not open pixmap source {self.path!r}")
        self.width = int(self.capture.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.capture.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.framerate = round(self.capture.get(cv2.CAP_PROP_FPS))
        frame_count = int(self.capture.get(cv2.CAP_PROP_FRAME_COUNT))
        if self.repeat > 0 and frame_count > 0:
            self.length = frame_count * self.repeat
        if self.seek_time is not None:
            self.seek = int(self.seek_time * self.framerate)
            if self.length is not None:
                self.length -= self.seek * self.repeat
        self.rewind()
        return self

    def __next__(self) -> np.ndarray:
        assert self.capture is not None
        if not self.capture.isOpened():
            warnings.warn("Pixmap capture is not opened")
            raise StopIteration
        while True:
            success, frame = self.capture.read()
            if success and frame is not None:
                break
            if self.repeat == 0 or self.loop_index < self.repeat:
                self.loop_index += 1
                self.rewind()
                continue
            raise StopIteration
        return self.alter(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))

    def close(self):
        if self.capture is not None:
            self.capture.release()
