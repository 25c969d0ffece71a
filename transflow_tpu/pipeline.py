"""Host pipeline: decode threads -> device engine -> encode threads.

Parity reference: transflow/pipeline.py (the 653-line process-parallel
orchestrator). Architectural mapping (SURVEY §2.3):

* SourceProcess + maxsize-1 mp.Queue  ->  a decode thread per source with a
  bounded queue.Queue (same backpressure, no pickling across processes);
* the numpy compositor hot loop       ->  Engine (one fused jitted device
  program per frame; jax's async dispatch overlaps host decode of frame
  t+1 with device compute of frame t);
* OutputProcess                        ->  an encode thread per output;
* metadata handshake                   ->  sources opened inline before
  tracing (static shapes for jit);
* log-queue fan-in                     ->  ordinary logging (single process);
* checkpoint = pickled Compositor      ->  meta.json + named-array .npz
  (pickle-free), same .ckpt.zip resume semantics.
"""
import dataclasses
import itertools
import json
import logging
import logging.config
import pathlib
import queue
import threading
import time
import zipfile
from typing import Optional

import numpy as np

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    tqdm = None

import jax

from .compositor.core import make_layer_params
from .config import Config
from .engine import Engine
from .flow import Direction
from .flow.sources.base import FlowSource
from .output.archive import NumpyArchiveOutput, ZipOutput
from .output.video_output import VideoOutput
from .pixmap.base import PixmapSource
from .profiling import StageTimers, device_trace
from .utils import load_bool_mask

logger = logging.getLogger(__name__)


class _SourceThread(threading.Thread):
    """Decode thread with a bounded queue (backpressure like the reference's
    maxsize-1 mp.Queue, pipeline.py:326)."""

    SENTINEL = None

    def __init__(self, iterator, maxsize: int = 2, name: str = "source"):
        super().__init__(daemon=True, name=name)
        self.iterator = iterator
        self.queue: queue.Queue = queue.Queue(maxsize=maxsize)
        self.error: Exception | None = None
        self._stop_event = threading.Event()

    def run(self):
        try:
            for item in self.iterator:
                if self._stop_event.is_set():
                    return
                while True:
                    try:
                        self.queue.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        if self._stop_event.is_set():
                            return
        except Exception as err:  # noqa: BLE001 — reported to the main loop
            self.error = err
            logger.exception("Source thread failed")
        finally:
            try:
                self.queue.put(self.SENTINEL, timeout=5)
            except queue.Full:
                pass

    def get(self, poll: float = 1.0):
        """Block until an item arrives (stalls tolerated, like the
        reference's mp.Queue consumers); fail only if the decode thread
        died without delivering its end-of-stream sentinel."""
        while True:
            try:
                item = self.queue.get(timeout=poll)
                break
            except queue.Empty:
                if not self.is_alive() and self.queue.empty():
                    if self.error is not None:
                        raise self.error
                    raise RuntimeError(
                        f"{self.name} thread died without a sentinel")
        if item is self.SENTINEL:
            if self.error is not None:
                raise self.error
            raise StopIteration
        return item

    def stop(self):
        self._stop_event.set()


class _OutputThread(threading.Thread):
    """Encode thread (reference OutputProcess, pipeline.py:104-136)."""

    SENTINEL = None

    def __init__(self, output: VideoOutput, maxsize: int = 2):
        super().__init__(daemon=True, name="output")
        self.output = output
        self.queue: queue.Queue = queue.Queue(maxsize=maxsize)
        self.error: Exception | None = None

    def run(self):
        try:
            self.output.open()
            while True:
                frame = self.queue.get()
                if frame is self.SENTINEL:
                    break
                self.output.feed(np.asarray(frame))
        except Exception as err:  # noqa: BLE001
            self.error = err
            logger.exception("Output thread failed")
        finally:
            try:
                self.output.close()
            except Exception:  # noqa: BLE001
                logger.exception("Output close failed")

    def feed(self, frame):
        if self.error is not None:
            raise self.error
        self.queue.put(frame, timeout=10)

    def finish(self):
        try:
            self.queue.put(self.SENTINEL, timeout=5)
        except queue.Full:
            pass


class Pipeline:
    """End-to-end render driver. Parity: transflow/pipeline.py:139-653."""

    @dataclasses.dataclass
    class Status:
        cursor: int
        total: int | None
        elapsed: float
        error: str | None

    def __init__(self,
                 cfg: Config,
                 safe: bool = False,
                 checkpoint_every: int | None = None,
                 checkpoint_end: bool = False,
                 execute: bool = False,
                 replace: bool = False,
                 export_config: bool = True,
                 export_flow: bool = False,
                 round_flow: bool = False,
                 preview_output: bool = False,
                 log_level: str = "DEBUG",
                 log_handler: str = "null",
                 log_path: pathlib.Path = pathlib.Path("transflow.log"),
                 cancel_event: Optional[threading.Event] = None,
                 status_queue=None,
                 progress: bool = True,
                 profile: bool = False,
                 trace_dir: str | None = None):
        self.config = cfg
        self.safe = safe
        self.checkpoint_every = checkpoint_every
        self.checkpoint_end = checkpoint_end or safe
        self.execute = execute
        self.replace = replace
        self.export_config = export_config or safe
        self.export_flow = export_flow
        self.round_flow = round_flow
        self.preview_output = preview_output
        self.log_level = log_level
        self.log_handler = log_handler
        self.log_path = pathlib.Path(log_path)
        self.cancel_event = cancel_event
        self.status_queue = status_queue
        self.progress = progress and tqdm is not None
        self.profile = profile
        self.trace_dir = trace_dir
        self.timers = StageTimers()

        self.flow_sources: list[FlowSource] = []
        self.flow_threads: list[_SourceThread] = []
        self.pixmap_sources: list[PixmapSource] = []
        self.pixmap_threads: list[Optional[_SourceThread]] = []
        self.output_threads: list[_OutputThread] = []
        self.window_outputs: list = []  # fed on the main thread (cv2 GUI)
        self.flow_output: NumpyArchiveOutput | None = None
        self.engine: Engine | None = None
        self.ckpt_meta: dict = {}
        self.ckpt_arrays: dict = {}
        self.cursor = 0
        self.fs_width = self.fs_height = 0
        self.fs_framerate: float = 30.0
        self.fs_length: int | None = None
        self.bs_framerate: float | None = None
        self.bs_length: int | None = None
        self.width_factor = 1
        self.height_factor = 1
        # per-layer-position pixmap bindings: list of (pixmap_idx,)
        self._layer_bindings: list[list[int]] = []
        # device pixmap cache: index -> (device array, frame_number)
        self._pix_current: list = []
        self._pix_constant: list[bool] = []

    # ------------------------------------------------------------------

    @property
    def has_output(self) -> bool:
        return (bool(self.config.pixmap_sources) or self.config.view_flow
                or self.config.view_flow_magnitude)

    @property
    def expected_length(self) -> int | None:
        lengths = [x for x in (self.fs_length, self.bs_length)
                   if x is not None]
        return min(lengths) if lengths else None

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def _setup_logging(self):
        handlers = [h.strip() for h in self.log_handler.split(",")]
        config: dict = {
            "version": 1,
            "disable_existing_loggers": False,
            "formatters": {"default": {
                "format": "%(asctime)s %(levelname)s %(name)s %(message)s"}},
            "handlers": {},
            "root": {"level": self.log_level, "handlers": []},
        }
        if "file" in handlers:
            self.log_path.parent.mkdir(parents=True, exist_ok=True)
            config["handlers"]["file"] = {
                "class": "logging.FileHandler", "filename": str(self.log_path),
                "formatter": "default"}
            config["root"]["handlers"].append("file")
        if "stream" in handlers:
            config["handlers"]["stream"] = {
                "class": "logging.StreamHandler", "formatter": "default"}
            config["root"]["handlers"].append("stream")
        if not config["root"]["handlers"]:
            # no handlers requested: leave logging configuration alone
            # (setting the root level to DEBUG would flood embedding apps
            # and test runners with jax internals)
            return
        logging.config.dictConfig(config)

    def _setup_checkpoint(self):
        """Resume from a .ckpt.zip action. Parity: pipeline.py:290-306."""
        action = self.config.flow_path
        if not action.endswith(".ckpt.zip"):
            return
        with zipfile.ZipFile(action) as archive:
            with archive.open("meta.json") as file:
                self.ckpt_meta = json.loads(file.read().decode())
            with archive.open("state.npz") as file:
                loaded = np.load(file)
                self.ckpt_arrays = {k: loaded[k] for k in loaded.files}
        # sources reposition themselves via seek_ckpt (see FlowSource.open);
        # the original seek/duration stay untouched so repeat spans survive
        self.config = Config.fromdict(self.ckpt_meta["config"])
        self.cursor = 0  # relative to the resumed run; absolute = base+cursor

    def _setup_flow_sources(self):
        paths = [self.config.flow_path] + list(self.config.extra_flow_paths)
        seek_ckpt = self.ckpt_meta.get("cursor")
        for path in paths:
            source = FlowSource.from_args(
                path,
                use_mvs=self.config.use_mvs,
                mask_path=self.config.mask_path,
                kernel_path=self.config.kernel_path,
                cv_config=self.config.cv_config,
                flow_filters=self.config.flow_filters,
                size=self.config.size,
                direction=self.config.direction,
                seek_ckpt=seek_ckpt,
                seek_time=self.config.seek_time,
                duration_time=self.config.duration_time,
                repeat=self.config.repeat,
                lock_expr=self.config.lock_expr,
                lock_mode=self.config.lock_mode,
            )
            source.open()
            self.flow_sources.append(source)
        main = self.flow_sources[0]
        self.fs_width, self.fs_height = main.width, main.height
        self.fs_framerate = main.framerate
        self.fs_length = main.length
        for source in self.flow_sources[1:]:
            if (source.width, source.height) != (self.fs_width,
                                                 self.fs_height):
                raise ValueError("Extra flow sources must match the main "
                                 "flow's resolution")

    def _setup_pixmap_sources(self):
        for pix_cfg in self.config.pixmap_sources:
            source = PixmapSource.from_args(
                pix_cfg.path,
                (self.fs_width, self.fs_height),
                seek=self.ckpt_meta.get("cursor"),
                seed=self.config.seed,
                seek_time=pix_cfg.seek_time,
                alteration_path=pix_cfg.alteration_path,
                repeat=pix_cfg.repeat,
                flow_path=self.config.flow_path,
            )
            source.open()
            self.pixmap_sources.append(source)
            if source.length is not None:
                if self.bs_length is None or source.length < self.bs_length:
                    self.bs_length = source.length
            if source.framerate:
                self.bs_framerate = source.framerate
        if self.pixmap_sources:
            bs_width = max(s.width for s in self.pixmap_sources)
            bs_height = max(s.height for s in self.pixmap_sources)
            if (bs_width, bs_height) != (self.fs_width, self.fs_height):
                if (bs_width % self.fs_width or bs_height % self.fs_height):
                    raise ValueError(
                        f"Resolutions do not match: flow is "
                        f"{self.fs_width}x{self.fs_height} while pixmap is "
                        f"{bs_width}x{bs_height}.")
                self.width_factor = bs_width // self.fs_width
                self.height_factor = bs_height // self.fs_height

    def _setup_engine(self):
        out_h = self.fs_height * self.height_factor
        out_w = self.fs_width * self.width_factor
        # bind pixmaps to layers: sources_by_layer[cfg.index] =
        # [(channels, introduction_mask)], order = pixmap declaration order
        sources_by_layer: dict = {}
        bindings: dict = {}
        for pix_idx, pix_cfg in enumerate(self.config.pixmap_sources):
            source = self.pixmap_sources[pix_idx]
            peek = next(source)
            self._pix_peek = getattr(self, "_pix_peek", {})
            self._pix_peek[pix_idx] = peek
            channels = peek.shape[2]
            mask = load_bool_mask(pix_cfg.introduction_path, (out_h, out_w),
                                  True)
            for layer_index in pix_cfg.layers:
                sources_by_layer.setdefault(layer_index, []).append(
                    (channels, mask))
                bindings.setdefault(layer_index, []).append(pix_idx)
        layer_params = make_layer_params(self.config.layers, out_h, out_w,
                                         sources_by_layer)
        self._layer_bindings = [bindings.get(cfg.index, [])
                                for cfg in self.config.layers]
        mesh, halo = self._build_mesh(out_h)
        self.engine = Engine(self.config, self.flow_sources, layer_params,
                             out_h, out_w, self.width_factor,
                             self.height_factor,
                             export_flows=self.export_flow,
                             mesh=mesh, halo=halo)
        self.engine._framerate = self.fs_framerate
        if self.ckpt_arrays:
            self.engine.load_state_arrays(self.ckpt_arrays)
        # device pixmap slots
        self._pix_current = [None] * len(self.pixmap_sources)
        self._pix_host = [None] * len(self.pixmap_sources)
        self._pix_frame_no = [-1] * len(self.pixmap_sources)
        self._pix_constant = [getattr(s, "is_constant", False)
                              for s in self.pixmap_sources]
        for pix_idx, peek in getattr(self, "_pix_peek", {}).items():
            self._push_pixmap(pix_idx, peek)

    def _build_mesh(self, out_h: int):
        """--mesh/--halo: build the ('space',) device mesh for this render.

        Returns (mesh, halo). halo auto-derives from a constant clip
        filter (scaled by the pixmap upscale factor — upscale_flow
        multiplies magnitudes) when --halo is not given; without either,
        the movement gather falls back to the all-gather-bound path with a
        warning (parallel/mesh.py has the measurements)."""
        from .flow.filters import static_clip_bound
        halo = self.config.halo
        if halo is not None and halo < 0:
            # bounded_row_gather(halo<0) iterates an empty shift range and
            # silently zeroes every moved pixel — refuse up front
            raise ValueError(f"--halo {halo}: must be >= 0")
        if not self.config.mesh:
            if halo is not None:
                bound = static_clip_bound(self.config.flow_filters)
                if bound is None or bound > halo:
                    logger.warning(
                        "--halo %d without --mesh clamps every movement to "
                        "%d rows; pair it with a trailing clip<=%d flow "
                        "filter (or drop it on single-device runs)",
                        halo, halo, halo)
            return None, halo
        from .parallel import make_space_mesh, parse_mesh_spec
        stream, space = parse_mesh_spec(self.config.mesh)
        if stream != 1:
            raise ValueError(
                f"--mesh {self.config.mesh}: the CLI pipeline renders one "
                "stream; use STREAM=1 (multi-stream batching lives in "
                "extra/batch_render.py)")
        if space <= 1:
            return None, halo
        if out_h % space or self.fs_height % space:
            raise ValueError(
                f"--mesh {self.config.mesh}: height {self.fs_height} "
                f"(output {out_h}) must divide by the space axis {space}")
        mesh = make_space_mesh(space)
        if halo is None:
            bound = static_clip_bound(self.config.flow_filters)
            # merging can re-amplify per-source bounds: sum of N clipped
            # flows reaches N*K, product reaches K^2 — only derive when a
            # single flow source is used or the merge preserves magnitude
            # bounds (first/average/absmax pick/average, never amplify)
            merge_ok = (len(self.config.extra_flow_paths) == 0
                        or self.config.flows_merging_function
                        in ("first", "average", "absmax"))
            if (bound is not None and bound >= 0
                    and self.config.kernel_path is None and merge_ok):
                halo = int(np.ceil(bound * max(1, self.height_factor)))
                logger.info("mesh: derived halo=%d from the clip filter",
                            halo)
            else:
                logger.warning(
                    "--mesh without --halo and no post-chain constant "
                    "displacement bound (need a trailing clip=K filter, no "
                    "kernel, and a non-amplifying merge): movement gathers "
                    "will all-gather the full state every frame; pass "
                    "--halo K to force the bounded path")
        return mesh, halo

    def _prep_pixmap_frame(self, frame: np.ndarray) -> np.ndarray:
        out_h = self.fs_height * self.height_factor
        out_w = self.fs_width * self.width_factor
        if frame.shape[0] != out_h or frame.shape[1] != out_w:
            import cv2
            frame = cv2.resize(frame, (out_w, out_h),
                               interpolation=cv2.INTER_NEAREST)
        return frame

    def _push_pixmap(self, pix_idx: int, frame: np.ndarray):
        frame = self._prep_pixmap_frame(frame)
        self._pix_host[pix_idx] = frame  # chunk stacking reads host copies
        put = (self.engine._put_repl if self.engine is not None
               else jax.device_put)  # pixmaps replicate under a mesh
        self._pix_current[pix_idx] = put(frame)
        self._pix_frame_no[pix_idx] += 1

    def _setup_flow_export(self):
        if not self.export_flow:
            return
        path = self.config.get_secondary_output_path(".flow.zip")
        meta = {
            # exported flows are post-processed, i.e. already converted to a
            # backward mapping — stamp them as such so a replay only re-clips
            # and reproduces the run exactly. (Intended-semantics deviation:
            # the reference stamps the run's original direction,
            # transflow/pipeline.py:375, so its replays re-apply the
            # non-idempotent forward->backward conversion and diverge.)
            "direction": Direction.BACKWARD.value,
            "width": self.fs_width * self.width_factor,
            "height": self.fs_height * self.height_factor,
            "framerate": self.fs_framerate,
        }
        self.flow_output = NumpyArchiveOutput(path, meta, self.replace)

    def _setup_outputs(self):
        if not self.has_output:
            return
        out_w = self.fs_width * self.width_factor
        out_h = self.fs_height * self.height_factor
        framerate = (self.bs_framerate if self.bs_framerate
                     else self.fs_framerate)
        paths: list[str | None] = []
        if isinstance(self.config.output_path, list):
            paths += self.config.output_path
        else:
            paths.append(self.config.output_path)
        if self.config.output_path is not None and self.preview_output:
            paths.append(None)
        for path in paths:
            output = VideoOutput.from_args(
                path, out_w, out_h, framerate, self.config.vcodec,
                self.execute, self.replace,
                initial_counter=self.ckpt_meta.get("cursor", 0))
            if self.export_config and output.output_path is not None:
                config_path = pathlib.Path(
                    output.output_path).with_suffix(".config.json")
                with config_path.open("w") as file:
                    json.dump(self.config.todict(), file)
            from .output.window import WindowOutput
            if isinstance(output, WindowOutput):
                # cv2 HighGUI must run on the main thread (macOS hard
                # requirement, Qt/GTK flakiness); fed inline from _drain
                output.open()
                self.window_outputs.append(output)
                continue
            thread = _OutputThread(output)
            thread.start()
            self.output_threads.append(thread)

    def _setup(self):
        self._setup_logging()
        self._setup_checkpoint()
        if not (self.has_output or self.export_flow or self.checkpoint_end):
            logger.warning("No output or exportation selected")
        self._setup_flow_sources()
        self._setup_pixmap_sources()
        self._setup_engine()
        self._setup_flow_export()
        self._setup_outputs()
        for source in self.flow_sources:
            thread = _SourceThread(source, name="flow-decode")
            thread.start()
            self.flow_threads.append(thread)
        for pix_idx, source in enumerate(self.pixmap_sources):
            if self._pix_constant[pix_idx]:
                self.pixmap_threads.append(None)
            else:
                thread = _SourceThread(source, name="pixmap-decode")
                thread.start()
                self.pixmap_threads.append(thread)

    # ------------------------------------------------------------------
    # checkpoints
    # ------------------------------------------------------------------

    def export_checkpoint(self):
        assert self.engine is not None
        base_cursor = self.ckpt_meta.get("cursor", 0) + self.cursor
        output = ZipOutput(
            self.config.get_secondary_output_path(
                f"_{base_cursor:05d}.ckpt.zip"), self.replace)
        output.write_meta({
            # the ABSOLUTE cursor: a checkpoint of a resumed run must seek
            # sources to base + cursor, not just this run's frame count
            "config": self.config.todict(),
            "cursor": base_cursor,
            "framerate": self.fs_framerate,
            "timestamp": time.time(),
        })
        output.write_arrays("state.npz", self.engine.state_arrays())
        output.close()
        logger.debug("Exported checkpoint at cursor %d", self.cursor)
        return output.path

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------

    def _gather_pixmaps(self):
        """Advance video pixmaps one frame; build the engine's args."""
        for pix_idx, thread in enumerate(self.pixmap_threads):
            if thread is None:
                continue  # constant source: device copy persists
            if self._pix_frame_no[pix_idx] < self.cursor:
                frame = thread.get()
                self._push_pixmap(pix_idx, frame)
        pixmaps = tuple(
            tuple(self._pix_current[i] for i in binding)
            for binding in self._layer_bindings)
        # reference increments each source's frame counter once per output
        # frame (pixmap_source_interface.py:26-33), so constant sources track
        # the cursor too
        frames = tuple(
            tuple(self.cursor if self._pix_constant[i]
                  else self._pix_frame_no[i] for i in binding)
            for binding in self._layer_bindings)
        return pixmaps, frames

    def _emit_status(self, started: float, error: str | None = None):
        if self.status_queue is None:
            return
        status = Pipeline.Status(self.cursor, self.expected_length,
                                 time.time() - started, error)
        try:
            self.status_queue.put(status, block=False)
        except queue.Full:
            pass

    #: frames per dispatch when --batch-frames is unset and the config is
    #: chunk-eligible: amortizes one host<->device round trip over 16 frames
    #: (decode threads keep up; 16x1080p chunks stay well under HBM)
    AUTO_BATCH = 16

    @property
    def _batch_size(self) -> int:
        """Frames per device dispatch. Chunked (lax.scan) mode needs:
        non-stream flow sources, no lock expression, no live tuning
        window, and no window output (a K-frame chunk would add K
        frames of preview latency). Frame-yielding sources scan through
        the estimator; flow-yielding sources (archive replay, motion
        vectors — the reference's fastest modes) scan the stacked raw
        flows directly; any MIX of sources batches, including the
        reference's multi-flow ``--flow`` + merge mainline
        (transflow/pipeline.py:149-158,496-507). Still AND video pixmaps
        both batch (video frames stack into scanned (K, H, W, C) chunks —
        the reference's mainline ``flow.mp4 -p pixmap.mp4`` case).
        Batching is ON by default (AUTO_BATCH); ``--batch-frames 1``
        forces the per-frame path, ``--batch-frames K`` picks the chunk
        size. Chunked output is bit-equal to per-frame (tested), so the
        default only changes throughput."""
        batch = self.config.batch_frames
        if batch is None:
            batch = self.AUTO_BATCH
        if batch <= 1:
            return 1
        if self.config.lock_expr is not None:
            return 1
        for source in self.flow_sources:
            if source.is_stream:  # webcam: realtime, keep per-frame latency
                return 1
            if getattr(getattr(source, "config", None), "show_window",
                       False):
                return 1
        if self.window_outputs:
            return 1
        return batch

    def _stack_pixmap_chunks(self, count: int):
        """Pull video-pixmap frames covering cursors [cursor, cursor+count).

        Returns ({pix_idx: (K, H, W, C) ndarray}, K) with K <= count — a
        video pixmap ending (no repeat) truncates the chunk, mirroring the
        per-frame path's StopIteration."""
        chunks: dict[int, list] = {}
        for pix_idx, thread in enumerate(self.pixmap_threads):
            if thread is None:
                continue  # constant source: persistent device copy
            frames = []
            for k in range(count):
                fno = self.cursor + k
                if self._pix_frame_no[pix_idx] < fno:
                    try:
                        frame = thread.get()
                    except StopIteration:
                        count = k
                        break
                    self._pix_host[pix_idx] = self._prep_pixmap_frame(frame)
                    self._pix_frame_no[pix_idx] += 1
                frames.append(self._pix_host[pix_idx])
            chunks[pix_idx] = frames
        return ({i: np.stack(f[:count]) for i, f in chunks.items()}
                if count else {}, count)

    def _run_short_chunk(self, rows, chunk_map, timers):
        """Run an undersized chunk frame-by-frame through the per-frame
        device program (engine.process_frame), with the scan path's exact
        RNG/timestamp/frame-number arithmetic. ``rows`` is a list of
        per-source array rows (one row per frame). Does not advance
        self.cursor — the caller accounts the whole chunk."""
        from .flow.sources.base import FlowItem
        kinds = [FlowItem.FRAME if source.yields_frames else FlowItem.FLOW
                 for source in self.flow_sources]
        base = self.ckpt_meta.get("cursor", 0) + self.cursor
        for k, row in enumerate(rows):
            pixmaps = tuple(
                tuple(self._pix_current[i] if self._pix_constant[i]
                      else self.engine._put_repl(chunk_map[i][k])
                      for i in binding)
                for binding in self._layer_bindings)
            fno = self.cursor + k
            frame_numbers = tuple(tuple(fno for _ in binding)
                                  for binding in self._layer_bindings)
            with timers.stage("device_step"):
                frame, flow = self.engine.process_frame(
                    [FlowItem(kind, arr)
                     for kind, arr in zip(kinds, row)], pixmaps,
                    (base + k) / self.fs_framerate, frame_numbers)
            with timers.stage("drain"):
                self._drain(frame, flow)

    def _mainloop_batched(self, started, total, bar, batch):
        """Chunked fast path: stack K decoded frames per source, one
        scanned dispatch. Sources advance in LOCKSTEP (one row = one item
        from every source, like the per-frame path's
        ``[thread.get() for thread in self.flow_threads]``); a rewind
        prime landing mid-chunk in ANY source flushes the chunk at that
        row so every estimator chain resets at a chunk boundary."""
        timers = self.timers
        n_sources = len(self.flow_threads)
        const_pixmaps = tuple(
            tuple(self._pix_current[i] if self._pix_constant[i] else None
                  for i in binding)
            for binding in self._layer_bindings)
        done = False
        pending = None  # item row whose prime forced a chunk flush (repeat)

        def apply_primes(row):
            for src_idx, item in enumerate(row):
                if item.prime is not None:
                    self.engine.runtimes[src_idx].reset(item.prime)

        while not done:
            if total is not None and self.cursor >= total:
                break
            if self.cancel_event is not None and self.cancel_event.is_set():
                break
            rows = []  # one entry per frame: per-source arrays
            with timers.stage("decode_wait"):
                want = batch if total is None else min(
                    batch, total - self.cursor)
                if self.checkpoint_every:
                    # align chunks to checkpoint boundaries so
                    # --checkpoint-every fires at exact multiples with
                    # exact cursors, like the per-frame path
                    want = min(want, self.checkpoint_every
                               - self.cursor % self.checkpoint_every)
                if pending is not None:
                    apply_primes(pending)
                    rows.append([item.array for item in pending])
                    pending = None
                while len(rows) < want:
                    row = []
                    for thread in self.flow_threads:
                        try:
                            row.append(thread.get())
                        except StopIteration:
                            # any source ending ends the run (per-frame
                            # path parity: the row is dropped whole)
                            done = True
                            break
                    if done:
                        break
                    if any(item.prime is not None for item in row):
                        if rows:
                            # a rewind landed mid-chunk (repeat loop): flush
                            # what we have so the estimator chain resets at a
                            # chunk boundary, matching the per-frame path
                            pending = row
                            break
                        apply_primes(row)
                    rows.append([item.array for item in row])
                chunk_map, avail = self._stack_pixmap_chunks(len(rows))
                if avail < len(rows):
                    rows = rows[:avail]
                    done = True
                    pending = None
            if not rows:
                break
            if len(rows) < batch:
                # short chunk (tail of the video, or a checkpoint-aligned
                # remainder): run it through the shape-stable per-frame
                # program instead of compiling a scan for this one-off K
                # (each distinct chunk shape is a separate multi-minute
                # remote compile). RNG, timestamps and frame numbers
                # follow the same arithmetic, so output is unchanged.
                self._run_short_chunk(rows, chunk_map, timers)
            else:
                pix_chunks = tuple(
                    tuple(None if self._pix_constant[i] else chunk_map[i]
                          for i in binding)
                    for binding in self._layer_bindings)
                base = self.ckpt_meta.get("cursor", 0) + self.cursor
                source_chunks = [
                    np.stack([row[src_idx] for row in rows])
                    for src_idx in range(n_sources)]
                with timers.stage("device_step"):
                    # frame numbers are run-relative like the per-frame
                    # path (_gather_pixmaps); t is absolute likewise
                    frames, flows = self.engine.process_chunk(
                        source_chunks, const_pixmaps, pix_chunks,
                        base, self.cursor)
                with timers.stage("drain"):
                    if self.flow_output is not None:
                        host_flows = np.asarray(flows)
                        if self.round_flow:
                            host_flows = np.round(host_flows).astype(int)
                        for flow in host_flows:
                            self.flow_output.write_array(flow)
                    host_frames = np.asarray(frames)
                    for frame in host_frames:
                        for thread in self.output_threads:
                            thread.feed(frame)
                        for window in self.window_outputs:
                            window.feed(frame)
            previous_cursor = self.cursor
            self.cursor += len(rows)
            if bar is not None:
                bar.update(len(rows))
            if (self.checkpoint_every and
                    self.cursor // self.checkpoint_every
                    > previous_cursor // self.checkpoint_every):
                with timers.stage("checkpoint"):
                    self.export_checkpoint()
            self._emit_status(started)
        if self.checkpoint_end and self.engine is not None:
            self.export_checkpoint()

    def _mainloop(self):
        started = time.time()
        total = self.expected_length
        bar = tqdm(total=total, unit="frame") if self.progress else None
        batch = self._batch_size
        if batch > 1:
            try:
                with device_trace(self.trace_dir):
                    self._mainloop_batched(started, total, bar, batch)
            finally:
                if bar is not None:
                    bar.close()
                self._emit_profile()
            return
        pending = None  # (device frame, device flow) — one-deep pipeline
        timers = self.timers
        try:
            with device_trace(self.trace_dir):
                while True:
                    if total is not None and self.cursor >= total:
                        break
                    if (self.cancel_event is not None
                            and self.cancel_event.is_set()):
                        logger.info("Cancelled")
                        break
                    try:
                        with timers.stage("decode_wait"):
                            items = [thread.get()
                                     for thread in self.flow_threads]
                            pixmaps, frame_numbers = self._gather_pixmaps()
                    except StopIteration:
                        break
                    t = (self.ckpt_meta.get("cursor", 0) + self.cursor) \
                        / self.fs_framerate
                    with timers.stage("device_step"):
                        frame, flow = self.engine.process_frame(
                            items, pixmaps, t, frame_numbers)
                    # drain the PREVIOUS frame while this one computes
                    # (async dispatch keeps the device busy)
                    if pending is not None:
                        with timers.stage("drain"):
                            self._drain(*pending)
                    pending = (frame, flow)
                    self.cursor += 1
                    if bar is not None:
                        bar.update(1)
                    if (self.checkpoint_every
                            and self.cursor % self.checkpoint_every == 0):
                        with timers.stage("checkpoint"):
                            self.export_checkpoint()
                    self._emit_status(started)
                if pending is not None:
                    with timers.stage("drain"):
                        self._drain(*pending)
                if self.checkpoint_end and self.engine is not None:
                    self.export_checkpoint()
        finally:
            if bar is not None:
                bar.close()
            self._emit_profile()

    def _emit_profile(self):
        """--profile output, identical for the per-frame and batched paths:
        print the table and write <output>.profile.json."""
        if not self.profile:
            return
        print(self.timers.format_table())
        try:
            self.timers.dump(self.config.get_secondary_output_path(
                ".profile.json"))
        except OSError:
            logger.exception("profile dump failed")

    def _drain(self, frame, flow):
        if self.flow_output is not None:
            host_flow = np.asarray(flow)
            if self.round_flow:
                host_flow = np.round(host_flow).astype(int)
            self.flow_output.write_array(host_flow)
        if self.output_threads or self.window_outputs:
            host_frame = np.asarray(frame)
            for thread in self.output_threads:
                thread.feed(host_frame)
            for window in self.window_outputs:
                window.feed(host_frame)

    def _close(self):
        for thread in self.flow_threads:
            thread.stop()
        for thread in self.pixmap_threads:
            if thread is not None:
                thread.stop()
        for thread in self.output_threads:
            thread.finish()
        for thread in self.output_threads:
            thread.join(timeout=30)
        for window in self.window_outputs:
            try:
                window.close()
            except Exception:  # noqa: BLE001
                logger.exception("Window close failed")
        # join each decode thread BEFORE closing its source: a thread
        # still inside _read_item when the zip handles / mmap / prefetch
        # pool are torn down surfaces a spurious 'Source thread failed'
        # on an otherwise-successful run (decode threads poll the stop
        # event every 0.2 s, so the join is quick; a thread wedged in a
        # long read keeps its source open rather than racing the close)
        def _close_after(thread, source):
            if thread is not None:
                thread.join(timeout=10)
                if thread.is_alive():
                    logger.warning("%s thread still running at close; "
                                   "leaving its source open", thread.name)
                    return
            source.close()
        # zip_longest: an early _setup failure leaves sources without
        # threads — they must still close
        for thread, source in itertools.zip_longest(self.flow_threads,
                                                    self.flow_sources):
            if source is not None:
                _close_after(thread, source)
        for thread, source in itertools.zip_longest(self.pixmap_threads,
                                                    self.pixmap_sources):
            if source is not None:
                _close_after(thread, source)
        if self.flow_output is not None:
            self.flow_output.close()

    def run(self):
        error: Exception | None = None
        started = time.time()
        try:
            self._setup()
            self._mainloop()
        except (Exception, KeyboardInterrupt) as err:  # noqa: BLE001
            error = err
            logger.exception("Pipeline failed")
            if self.safe and self.engine is not None:
                try:
                    path = self.export_checkpoint()
                    logger.info("Safe-mode checkpoint written to %s", path)
                except Exception:  # noqa: BLE001
                    logger.exception("Safe-mode checkpoint failed")
                config_path = "last-config.json"
                with open(config_path, "w") as file:
                    json.dump(self.config.todict(), file)
            self._emit_status(started, error=str(err))
        finally:
            self._close()
        if error is not None and not isinstance(error, KeyboardInterrupt):
            raise error
        self._emit_status(started)
