"""Flow source base: seek/duration/repeat/lock bookkeeping (host side).

Parity reference: transflow/flow/sources/source.py (Builder :58-209, iterator
core :286-335). Architectural difference from the reference: a source yields
*raw items* — either a grayscale frame (estimator-based sources, estimation
then runs on-device inside the pipeline step) or a raw flow array (archive /
motion-vector sources). Post-processing (filters/mask/kernel/direction) is a
device-side function built from the source's config (flow/transforms.py) and
fused into the per-frame step; the reference applies it per __next__ on the
CPU. Lock semantics are identical: 'stay' pauses the underlying reader and
replays the previous raw flow (re-post-processing it with the current t),
'skip' keeps reading but drops every other result.
"""
import logging
import os
from typing import Callable, Iterator, Optional

import numpy as np

from .. import Direction, LockMode
from ..transforms import make_postprocess
from ...utils import (load_float_mask, parse_expression, parse_lock_intervals)

logger = logging.getLogger(__name__)


class FlowItem:
    """One tick of a flow source."""
    __slots__ = ("kind", "array", "locked", "discarded", "prime")

    FRAME = "frame"  # uint8 grayscale frame -> estimator input
    FLOW = "flow"    # float32 (H, W, 2) raw flow
    REPLAY = "replay"  # lock: reuse previous raw flow

    def __init__(self, kind: str, array=None, locked: bool = False,
                 discarded: "FlowItem | None" = None, prime=None):
        self.kind = kind
        self.array = array
        self.locked = locked
        # lock 'skip': the raw item read-and-dropped underneath the lock —
        # frame-based estimators must still consume it to stay continuous
        self.discarded = discarded
        # frame that re-seeds estimator state (first frame after open/rewind)
        self.prime = prime


class FlowSource:
    """Iterator over FlowItems with seek/duration/repeat/lock logic."""

    yields_frames = False  # True when items are frames needing estimation

    def __init__(self,
                 direction: Direction = Direction.FORWARD,
                 mask_path: str | None = None,
                 kernel_path: str | None = None,
                 flow_filters: str | None = None,
                 seek_ckpt: int | None = None,
                 seek_time: float | None = None,
                 duration_time: float | None = None,
                 repeat: int = 1,
                 lock_expr: str | None = None,
                 lock_mode=LockMode.STAY):
        self.direction = Direction.from_arg(direction)
        self.mask_path = mask_path
        self.kernel_path = kernel_path
        self.flow_filters = flow_filters
        self.seek_ckpt = seek_ckpt
        self.seek_time = seek_time
        self.duration_time = duration_time
        self.repeat = repeat
        self.lock_mode = LockMode.from_arg(lock_mode)
        self.lock_expr = lock_expr
        # filled by open()
        self.width: int = 0
        self.height: int = 0
        self.framerate: float = 30.0
        self.base_length: int | None = None
        self.is_stream = False
        self.start_frame = 0
        self.ckpt_start_frame = 0
        self.end_frame = 0
        self.length: int | None = None
        self.input_frame_index = 0
        self.output_frame_index = 0
        self.lock_intervals = None
        self.lock_interval_index = 0
        self.lock_skip_fn: Optional[Callable] = None
        self.lock_start: float | None = None
        # output frames rendered before this instance (checkpoint resume):
        # keeps the lock timeline t continuous across resumes
        self.t_base_frames = 0
        self._opened = False

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def _open_reader(self):
        """Open the underlying media; set width/height/framerate/base_length."""
        raise NotImplementedError

    def _close_reader(self):
        pass

    def _read_item(self) -> FlowItem:
        """Read the next raw item; raise StopIteration at end of media."""
        raise NotImplementedError

    def _rewind_reader(self, frame_index: int):
        """Reposition the reader so the next read yields ``frame_index``."""
        raise NotImplementedError

    def open(self):
        """Two-phase init mirroring Builder.build (source.py:125-197)."""
        self._open_reader()
        if self.lock_expr is not None:
            if self.lock_mode == LockMode.STAY:
                self.lock_intervals = parse_lock_intervals(self.lock_expr)
            else:
                self.lock_skip_fn = parse_expression(self.lock_expr)
        if self.base_length is not None and self.base_length <= 0:
            self.base_length = None
        self.is_stream = self.base_length is None
        if self.is_stream and self.repeat > 1:
            logger.warning("Flow source is a stream, cannot repeat it")
            self.repeat = 1
        if self.is_stream and self.seek_time:
            logger.warning("Flow source is a stream, seek time is ignored")
            self.seek_time = None
        if self.seek_time is not None and not self.is_stream:
            self.start_frame = int(self.seek_time * self.framerate)
        else:
            self.start_frame = 0
        if self.duration_time is not None:
            self.end_frame = self.start_frame + int(
                round(self.duration_time * self.framerate, 3))
            if self.base_length is not None:
                self.end_frame = min(self.end_frame, self.base_length)
        elif self.base_length is not None:
            self.end_frame = self.base_length
        if self.repeat == 0:
            self.length = None
        elif self.is_stream:
            self.length = self.end_frame
        else:
            self.length = self.repeat * (self.end_frame - self.start_frame)
        if (self.length is not None and self.lock_mode == LockMode.STAY
                and self.lock_intervals is not None):
            for _, lock_duration in self.lock_intervals:
                self.length += int(lock_duration * self.framerate)
        # Checkpoint resume: position the input at start + cursor (wrapping
        # inside the repeat span) and shorten the remaining output length.
        # The reference combines a shifted seek_time with a modulo reposition
        # (source.py:191-197 + pipeline.py:301-303), which double-seeks when
        # no duration is set; this formulation is exact for both the plain
        # and the repeat case.
        self.ckpt_start_frame = self.start_frame
        if self.seek_ckpt is not None:
            span = max(1, self.end_frame - self.start_frame)
            if (self.lock_mode == LockMode.STAY
                    and self.lock_intervals is not None):
                # Locks shift the input/output alignment: a lock-stay frame
                # replays prev_flow and consumes NO input, so the input
                # position after ``seek_ckpt`` outputs is not a simple
                # modulo. Replay the lock bookkeeping for the already-
                # rendered outputs (pure integer host loop) — this both
                # finds the true input position and reconstructs the
                # interval cursor/lock_start state, so resume==original
                # bit-exactly. (The reference instead resets its interval
                # index while t keeps counting, replaying consumed locks
                # after resume — source.py:296-310 — a bug we document in
                # docs/DEVIATIONS.md rather than reproduce.)
                consumed = 0
                for _ in range(self.seek_ckpt):
                    if not self._locked():
                        consumed += 1
                    self.output_frame_index += 1
                self.output_frame_index = 0
                self.ckpt_start_frame += consumed % span
            else:
                # no lock (or lock-skip, which consumes exactly one input
                # per output either way): input position is a modulo
                self.ckpt_start_frame += self.seek_ckpt % span
            # t must keep counting across the resume so time-positioned
            # locks (stay intervals, skip expressions of t) don't re-fire
            self.t_base_frames = self.seek_ckpt
            if self.length is not None:
                self.length = max(0, self.length - self.seek_ckpt)
        self.rewind(self.ckpt_start_frame)
        self._opened = True
        return self

    def __enter__(self):
        return self.open()

    def __exit__(self, *exc):
        self._close_reader()

    def close(self):
        self._close_reader()

    # ------------------------------------------------------------------
    # iteration
    # ------------------------------------------------------------------

    @property
    def t(self) -> float:
        return (0.0 if not self.framerate
                else (self.t_base_frames + self.output_frame_index)
                / self.framerate)

    def rewind(self, frame_index: int | None = None):
        if frame_index is None:
            frame_index = self.start_frame
        self.input_frame_index = frame_index
        self._rewind_reader(frame_index)

    def _read_with_loop(self) -> FlowItem:
        if self.input_frame_index == self.end_frame:
            self.rewind()
        item = self._read_item()
        self.input_frame_index += 1
        return item

    def _locked(self) -> bool:
        """Lock bookkeeping. Parity: source.py:296-310."""
        if self.lock_mode == LockMode.STAY and self.lock_intervals is not None:
            if self.lock_interval_index >= len(self.lock_intervals):
                return False
            was_locked = self.lock_start is not None
            locked = False
            if was_locked:
                elapsed = self.t - self.lock_start
                locked = elapsed < self.lock_intervals[
                    self.lock_interval_index][1]
                if not locked:
                    self.lock_interval_index += 1
                    self.lock_start = None
                    if self.lock_interval_index >= len(self.lock_intervals):
                        return False
            if not was_locked or not locked:
                locked = self.t >= self.lock_intervals[
                    self.lock_interval_index][0]
                if locked:
                    self.lock_start = self.t
            return locked
        if self.lock_mode == LockMode.SKIP and self.lock_skip_fn is not None:
            return bool(self.lock_skip_fn(self.t))
        return False

    def __next__(self) -> FlowItem:
        if (self.length is not None
                and self.output_frame_index >= self.length):
            raise StopIteration
        locked = self._locked()
        if locked:
            if self.output_frame_index == 0:
                # parity: reference source.py:313-314 (also fires when a
                # checkpoint resume lands inside a lock window — the
                # replayed flow predates the resume and is not
                # reconstructable; the reference crashes there too, less
                # legibly, via its None prev_flow)
                raise RuntimeError(
                    "Flow is locked but has not been initialized. "
                    "Maybe lock the flow later?")
            discarded = None
            if self.lock_mode == LockMode.SKIP:
                # the stream advances underneath the lock (source.py:318-319)
                try:
                    discarded = self._read_with_loop()
                except StopIteration:
                    discarded = None
            item = FlowItem(FlowItem.REPLAY, locked=True, discarded=discarded)
        else:
            item = self._read_with_loop()
        self.output_frame_index += 1
        return item

    def __iter__(self) -> Iterator[FlowItem]:
        return self

    def __len__(self):
        return self.length

    # ------------------------------------------------------------------
    # device-side post-process builder
    # ------------------------------------------------------------------

    def build_postprocess(self):
        mask = None
        if self.mask_path is not None:
            # DSL rules need the source size (known after open()); image
            # masks carry their own. The reference loads with shape (0,0)
            # (source.py:127-129), so its --mask only works with images —
            # here every rule works.
            mask = load_float_mask(self.mask_path,
                                   (self.height, self.width))
        kernel = None
        if self.kernel_path is not None:
            kernel = np.load(self.kernel_path)
        return make_postprocess(self.flow_filters, mask, kernel,
                                self.direction)

    # ------------------------------------------------------------------
    # factory
    # ------------------------------------------------------------------

    @classmethod
    def from_args(cls,
                  flow_path: str,
                  use_mvs: bool = False,
                  mask_path: str | None = None,
                  kernel_path: str | None = None,
                  cv_config: str | None = None,
                  flow_filters: str | None = None,
                  size: tuple[int, int] | None = None,
                  direction=None,
                  seek_ckpt: int | None = None,
                  seek_time: float | None = None,
                  duration_time: float | None = None,
                  repeat: int = 1,
                  lock_expr: str | None = None,
                  lock_mode=LockMode.STAY) -> "FlowSource":
        """Route to the concrete source. Parity: source.py:365-411."""
        if "::" in flow_path:
            avformat, file = flow_path.split("::")
        else:
            avformat, file = None, flow_path
        kwargs = dict(direction=direction, mask_path=mask_path,
                      kernel_path=kernel_path, flow_filters=flow_filters,
                      seek_ckpt=seek_ckpt, seek_time=seek_time,
                      duration_time=duration_time, repeat=repeat,
                      lock_expr=lock_expr, lock_mode=lock_mode)
        if file.endswith(".flow.zip"):
            from .archive import ArchiveFlowSource
            return ArchiveFlowSource(file, **kwargs)
        if use_mvs:
            from .mv import MotionVectorFlowSource
            return MotionVectorFlowSource(file, avformat, **kwargs)
        from .cv import CvFlowConfig, CvFlowSource
        if isinstance(cv_config, dict):
            # inline settings (the GUI client sends {"method": ...} dicts;
            # config JSON files may embed them the same way)
            config = CvFlowConfig(**cv_config)
        elif cv_config is not None and os.path.isfile(cv_config):
            config = CvFlowConfig.from_file(cv_config)
        elif cv_config == "window":
            config = CvFlowConfig(show_window=True)
        elif isinstance(cv_config, str) and cv_config.lstrip().startswith("{"):
            # inline JSON on the CLI: -c '{"method": "horn-schunck"}'
            import json as _json
            config = CvFlowConfig(**_json.loads(cv_config))
        elif cv_config is not None:
            raise FileNotFoundError(
                f"cv_config {cv_config!r} is neither a file, 'window', nor "
                "inline JSON")
        else:
            config = CvFlowConfig()
        return CvFlowSource(file, config, size, **kwargs)
