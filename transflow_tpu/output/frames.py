"""Image-sequence output ('%d'-template paths).

Parity reference: transflow/output/frames.py:9-36, including counter resume
from a checkpoint (initial_counter).
"""
import os

import cv2
import numpy as np

from .video_output import VideoOutput


class FramesOutput(VideoOutput):

    def __init__(self, template: str, width: int, height: int,
                 framerate: float, initial_counter: int = 0):
        super().__init__(width, height, framerate)
        self.template = template
        self.counter = initial_counter
        self.output_path = template

    def open(self):
        directory = os.path.dirname(self.template)
        if directory:
            os.makedirs(directory, exist_ok=True)
        return self

    def feed(self, frame):
        path = self.template % self.counter
        frame = np.asarray(frame, dtype=np.uint8)
        cv2.imwrite(path, cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        self.counter += 1
