"""H.264/H.265 motion-vector flow source (decode-side flow, no estimation).

Parity reference: transflow/flow/sources/av.py:10-79 — PyAV decode with
+export_mvs, rasterizing macroblock motion vectors into a dense field.
Gated: the `av` module is optional in this image; the source raises a clear
ImportError when missing.
"""
import numpy as np

from .base import FlowItem, FlowSource


class MotionVectorFlowSource(FlowSource):

    yields_frames = False

    def __init__(self, file: str, avformat: str | None = None, **kwargs):
        super().__init__(**kwargs)
        self.file = file
        self.avformat = avformat
        self.container = None
        self.iterator = None

    def _open_reader(self):
        try:
            import av.container
        except ImportError as err:
            raise ImportError(
                "Motion-vector flow extraction (--mv) requires PyAV, which "
                "is not installed in this environment") from err
        self.container = av.container.open(format=self.avformat,
                                           file=self.file)
        stream = self.container.streams.video[0]
        stream.codec_context.options = {"flags2": "+export_mvs"}
        first = next(self.container.decode(video=0))
        self.width = first.width
        self.height = first.height
        if stream.codec_context.framerate:
            self.framerate = float(stream.codec_context.framerate)
        self.base_length = stream.frames - 1
        self.iterator = self.container.decode(video=0)

    def _rewind_reader(self, frame_index: int):
        if self.container is None:
            return
        self.container.seek(0)
        self.iterator = self.container.decode(video=0)
        for _ in range(frame_index + 1):
            next(self.iterator)

    def _read_item(self) -> FlowItem:
        flow = np.zeros((self.height, self.width, 2), dtype=np.float32)
        frame = next(self.iterator)
        vectors = frame.side_data.get("MOTION_VECTORS")
        if vectors is None:
            return FlowItem(FlowItem.FLOW, flow)
        for mv in vectors:
            assert mv.source == -1, "Encode with bf=0 and refs=1"
            i0 = mv.src_y - mv.h // 2
            i1 = mv.src_y + mv.h // 2
            j0 = mv.src_x - mv.w // 2
            j1 = mv.src_x + mv.w // 2
            flow[i0:i1, j0:j1] = (-mv.motion_x / mv.motion_scale,
                                  -mv.motion_y / mv.motion_scale)
        return FlowItem(FlowItem.FLOW, flow)

    def _close_reader(self):
        if self.container is not None:
            self.container.close()
