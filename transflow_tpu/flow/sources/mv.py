"""H.264/H.265 motion-vector flow source (decode-side flow, no estimation).

Parity reference: transflow/flow/sources/av.py:10-79 — decode with
+export_mvs, rasterizing macroblock motion vectors into a dense field.

Two backends, picked at open time:

* PyAV, when importable (the reference's own stack);
* the native libav shim (transflow_tpu/av_native.py -> native/
  transflow_av.cpp), which talks to the system FFmpeg libraries directly —
  so ``--mv`` works on images with no PyAV and no ffmpeg binary (this one).

Both yield identical dense fields: the records carry the same fields
(AVMotionVector is what PyAV wraps), and the rasterization below is shared.
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
        self.reader = None  # native backend

    def _open_reader(self):
        try:
            self._open_pyav()
            return
        except ImportError:
            pass
        try:
            from ...av_native import MvReader, is_available
            if not is_available():
                raise RuntimeError("native libav shim did not build")
            self.reader = MvReader(self.file, format=self.avformat)
        except (RuntimeError, OSError) as err:
            if isinstance(err, FileNotFoundError):
                raise
            raise ImportError(
                "Motion-vector flow extraction (--mv) requires PyAV or the "
                "native libav shim (make -C native libtransflow_av.so); "
                f"neither is available: {err}") from err
        self.width = self.reader.width
        self.height = self.reader.height
        if self.reader.fps:
            self.framerate = float(self.reader.fps)
        self.base_length = self.reader.frame_count - 1
        # consume the first frame (an IDR carries no vectors) so flow k
        # describes the step from frame k to k+1, like the PyAV path
        self.reader.next()

    def _open_pyav(self):
        import av.container
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
        if self.reader is not None:
            self.reader.rewind()
            for _ in range(frame_index + 1):
                self.reader.next()
        elif self.container is not None:
            self.container.seek(0)
            self.iterator = self.container.decode(video=0)
            for _ in range(frame_index + 1):
                next(self.iterator)

    def _next_vectors(self):
        """One frame's motion-vector records from whichever backend is
        open; raises StopIteration at end of stream."""
        if self.reader is not None:
            vectors = self.reader.next()
            if vectors is None:
                raise StopIteration
            return vectors
        frame = next(self.iterator)
        return frame.side_data.get("MOTION_VECTORS") or ()

    def _read_item(self) -> FlowItem:
        flow = np.zeros((self.height, self.width, 2), dtype=np.float32)
        for mv in self._next_vectors():
            assert mv.source == -1, "Encode with bf=0 and refs=1"
            i0 = mv.src_y - mv.h // 2
            i1 = mv.src_y + mv.h // 2
            j0 = mv.src_x - mv.w // 2
            j1 = mv.src_x + mv.w // 2
            flow[i0:i1, j0:j1] = (-mv.motion_x / mv.motion_scale,
                                  -mv.motion_y / mv.motion_scale)
        return FlowItem(FlowItem.FLOW, flow)

    def _close_reader(self):
        if self.reader is not None:
            self.reader.close()
        if self.container is not None:
            self.container.close()
