"""OpenCV-decoded flow source: yields grayscale frames for on-device estimation.

Parity reference: transflow/flow/sources/cv.py (CvFlowConfig :271-363,
CvFlowSource :366-524). The reference runs the estimator on the CPU inside
the source process; here the source only decodes + resizes + grayscales —
the estimator (flow/estimators/) runs on the TPU inside the pipeline step,
warm-started from device-resident state. The estimator hyper-parameter
surface (fb_*/hs_*/lk_* + JSON round-trip) is identical.
"""
import json
import re

import cv2
import numpy as np

from .base import FlowItem, FlowSource

METHODS = ("farneback", "horn-schunck", "lukas-kanade", "liteflownet")


class CvFlowConfig:
    """Estimator selection + hyper-parameters, JSON round-trip."""

    DEFAULTS = dict(
        method="farneback",
        fb_pyr_scale=0.5, fb_levels=3, fb_winsize=15, fb_iterations=3,
        fb_poly_n=5, fb_poly_sigma=1.2, fb_flags=0, fb_downscale=1,
        fb_select_warp=0,
        hs_alpha=1.0, hs_iterations=3, hs_decay=0.0, hs_delta=1.0,
        lk_window_size=15, lk_max_level=2, lk_step=1,
        lfn_warp_bound=0, lfn_scale=1.0,
    )

    def __init__(self, show_window: bool = False, **kwargs):
        unknown = set(kwargs) - set(self.DEFAULTS)
        if unknown:
            raise ValueError(f"Unknown cv_config keys: {sorted(unknown)}")
        for key, default in self.DEFAULTS.items():
            setattr(self, key, kwargs.get(key, default))
        if self.method not in METHODS:
            raise ValueError(f"Unknown flow method {self.method!r}")
        if int(self.lfn_warp_bound) < 0:
            # a negative bound would reach _warp_bound's floor and clamp
            # all motion to +-3 px — refuse up front like --halo < 0
            raise ValueError(
                f"lfn_warp_bound must be >= 0, got {self.lfn_warp_bound}")
        if not 0.0 < float(self.lfn_scale) <= 1.0:
            raise ValueError(
                f"lfn_scale must be in (0, 1], got {self.lfn_scale}")
        if int(self.fb_downscale) < 1:
            raise ValueError(
                f"fb_downscale must be >= 1, got {self.fb_downscale}")
        if int(self.fb_select_warp) < 0:
            raise ValueError(
                f"fb_select_warp must be >= 0, got {self.fb_select_warp}")
        self.show_window = show_window
        self.window = None
        self.version = 0  # bumped by the tuning window; engine re-jits

    def start(self):
        """Open the live-tuning window if requested.

        Parity: cv.py:17-268 (reference uses PySide6; ours is tkinter)."""
        if not self.show_window:
            return
        from ...gui.tuning import CvFlowConfigWindow
        self.window = CvFlowConfigWindow(self)
        self.window.start()

    def update(self, name, value):
        setattr(self, name, value)
        self.version += 1

    def to_dict(self) -> dict:
        return {key: getattr(self, key) for key in self.DEFAULTS}

    def to_file(self, path: str):
        with open(path, "w", encoding="utf8") as file:
            json.dump(self.to_dict(), file, indent=4)

    @classmethod
    def from_file(cls, path: str) -> "CvFlowConfig":
        with open(path, "r", encoding="utf8") as file:
            return cls(**json.load(file))

    def estimator_kwargs(self) -> dict:
        """Static kwargs for the device estimator (flow/estimators/)."""
        if self.method == "farneback":
            return dict(pyr_scale=self.fb_pyr_scale, levels=int(self.fb_levels),
                        winsize=int(self.fb_winsize),
                        iterations=int(self.fb_iterations),
                        poly_n=int(self.fb_poly_n),
                        poly_sigma=self.fb_poly_sigma,
                        flags=int(self.fb_flags),
                        downscale=int(self.fb_downscale),
                        select_warp=int(self.fb_select_warp))
        if self.method == "horn-schunck":
            return dict(alpha=self.hs_alpha, max_iters=int(self.hs_iterations),
                        decay=self.hs_decay, delta=self.hs_delta)
        if self.method == "lukas-kanade":
            return dict(win_size=int(self.lk_window_size),
                        max_level=int(self.lk_max_level),
                        step=int(self.lk_step))
        if self.method == "liteflownet":
            # level-2 displacement bound: route the CNN's backwarps
            # through the Pallas bounded kernel (ops/pallas_warp.py).
            # Passed explicitly even when 0 so the config is
            # authoritative: 0 reaches _warp_bound as base=0 -> exact
            # path, overriding any TRANSFLOW_LITEFLOWNET_WARP_BOUND env
            # (the env fallback only applies to direct API calls that
            # leave warp_bound unset).
            return dict(warp_bound=int(self.lfn_warp_bound),
                        scale=float(self.lfn_scale))
        return {}


class CvFlowSource(FlowSource):
    """Video file or webcam decoded with cv2, yielding grayscale frames."""

    yields_frames = True

    def __init__(self, file: str, config: CvFlowConfig | None = None,
                 size: tuple[int, int] | None = None, **kwargs):
        super().__init__(**kwargs)
        self.file = file
        self.config = config if config is not None else CvFlowConfig()
        self.size = size
        self.capture: cv2.VideoCapture | None = None

    def _open_reader(self):
        if re.fullmatch(r"\d+", self.file):
            self.capture = cv2.VideoCapture(int(self.file))
        else:
            self.capture = cv2.VideoCapture(self.file)
        if not self.capture.isOpened():
            raise FileNotFoundError(
                f"Could not open flow source {self.file!r}")
        if self.size is not None:
            self.capture.set(cv2.CAP_PROP_FRAME_WIDTH, self.size[0])
            self.capture.set(cv2.CAP_PROP_FRAME_HEIGHT, self.size[1])
        self.width = int(self.capture.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.capture.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.framerate = float(self.capture.get(cv2.CAP_PROP_FPS)) or 30.0
        # N frames give N-1 flow steps (cv.py:428)
        self.base_length = int(self.capture.get(cv2.CAP_PROP_FRAME_COUNT)) - 1
        self.config.start()

    def _decode_gray(self):
        success, frame = self.capture.read()
        if not success or frame is None:
            raise StopIteration
        if frame.shape[1] != self.width or frame.shape[0] != self.height:
            frame = cv2.resize(frame, dsize=(self.width, self.height),
                               interpolation=cv2.INTER_NEAREST)
        if self.config.method == "liteflownet":
            # the CNN estimator consumes color frames (cv.py:509-516)
            return cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        return cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)

    # beyond this many frames, use the container's frame seek instead of
    # sequentially decoding the prefix (the reference re-decodes from 0,
    # source cv.py:447-458 — O(n) per rewind)
    FAST_SEEK_THRESHOLD = 300

    def _rewind_reader(self, frame_index: int):
        """Reposition so the PREVIOUS frame is frame_index (estimation pairs
        frames i and i+1); yields a priming frame on the next read."""
        if self.capture is None:
            return
        if frame_index > self.FAST_SEEK_THRESHOLD:
            self.capture.set(cv2.CAP_PROP_POS_FRAMES, frame_index)
            if int(self.capture.get(cv2.CAP_PROP_POS_FRAMES)) == frame_index:
                self._primed = False
                return
        self.capture.set(cv2.CAP_PROP_POS_MSEC, 0)
        for _ in range(frame_index):
            self.capture.read()
        self._primed = False

    def _read_item(self) -> FlowItem:
        prime = None
        if not getattr(self, "_primed", False):
            # first frame after open/rewind re-seeds estimator state on
            # device; it does not count as an output (a flow needs 2 frames)
            prime = np.asarray(self._decode_gray())
            self._primed = True
        return FlowItem(FlowItem.FRAME, np.asarray(self._decode_gray()),
                        prime=prime)

    def _close_reader(self):
        if self.capture is not None:
            self.capture.release()
