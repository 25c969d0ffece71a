"""Flow & pixmap source routing, metadata and iteration."""
import os

import cv2
import numpy as np
import pytest

from transflow_tpu.flow import Direction, LockMode
from transflow_tpu.flow.sources.archive import ArchiveFlowSource
from transflow_tpu.flow.sources.base import FlowItem, FlowSource
from transflow_tpu.flow.sources.cv import CvFlowConfig, CvFlowSource
from transflow_tpu.output.archive import NumpyArchiveOutput
from transflow_tpu.pixmap.base import PixmapSource
from transflow_tpu.pixmap import still as st
from transflow_tpu.pixmap.video import VideoPixmapSource


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    """Synthetic 20-frame 64x48 video with a moving square."""
    path = str(tmp_path_factory.mktemp("assets") / "video.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                             (64, 48))
    assert writer.isOpened()
    for t in range(20):
        frame = np.full((48, 64, 3), 30, dtype=np.uint8)
        x = 4 + 2 * t
        frame[10:30, x:x + 12] = (200, 150, 90)
        writer.write(frame)
    writer.release()
    return path


@pytest.fixture(scope="module")
def flow_archive(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("assets") / "video.flow.zip")
    meta = {"direction": Direction.BACKWARD.value, "width": 64, "height": 48,
            "framerate": 10.0}
    out = NumpyArchiveOutput(path, meta, replace=True)
    rng = np.random.default_rng(0)
    for _ in range(10):
        out.write_array(rng.normal(size=(48, 64, 2)).astype(np.float32))
    out.close()
    return path


class TestFlowSourceRouting:

    def test_cv(self, test_video):
        src = FlowSource.from_args(test_video)
        assert isinstance(src, CvFlowSource)

    def test_archive(self, flow_archive):
        src = FlowSource.from_args(flow_archive)
        assert isinstance(src, ArchiveFlowSource)

    def test_mv_requires_av(self, test_video):
        src = FlowSource.from_args(test_video, use_mvs=True)
        from transflow_tpu.flow.sources.mv import MotionVectorFlowSource
        assert isinstance(src, MotionVectorFlowSource)


class TestCvFlowSource:

    def test_metadata_and_items(self, test_video):
        with FlowSource.from_args(test_video) as src:
            assert (src.width, src.height) == (64, 48)
            assert src.framerate == 10.0
            assert src.base_length == 19
            assert src.length == 19
            item = next(src)
            assert item.kind == FlowItem.FRAME
            assert item.prime is not None and item.prime.shape == (48, 64)
            assert item.array.shape == (48, 64)
            item2 = next(src)
            assert item2.prime is None

    def test_seek_duration(self, test_video):
        with FlowSource.from_args(test_video, seek_time=0.5,
                                  duration_time=1.0) as src:
            assert src.start_frame == 5
            assert src.end_frame == 15
            assert src.length == 10

    def test_repeat(self, test_video):
        with FlowSource.from_args(test_video, repeat=2,
                                  duration_time=0.5) as src:
            assert src.length == 10
            items = list(src)
            assert len(items) == 10
            # a rewind happened mid-way: item 5 carries a new priming frame
            assert items[5].prime is not None

    def test_lock_stay_extends_length(self, test_video):
        with FlowSource.from_args(test_video, lock_expr="(0.2, 0.3)",
                                  lock_mode="stay") as src:
            assert src.length == 19 + 3
            items = list(src)
            assert len(items) == 22
            replays = [i for i in items if i.kind == FlowItem.REPLAY]
            assert len(replays) == 3

    def test_lock_skip(self, test_video):
        with FlowSource.from_args(test_video, lock_expr="0.1 <= t < 0.4",
                                  lock_mode="skip") as src:
            items = list(src)
            replays = [i for i in items if i.kind == FlowItem.REPLAY]
            assert len(replays) == 3  # t = 0.1, 0.2, 0.3
            # skip mode advances the stream underneath the lock
            assert all(r.discarded is not None for r in replays)
            # length unchanged by skip locks (source runs out earlier instead)
            assert len(items) == 19

    def test_config_file_roundtrip(self, tmp_path, test_video):
        cfg = CvFlowConfig(method="horn-schunck", hs_alpha=2.0)
        path = str(tmp_path / "cv.json")
        cfg.to_file(path)
        src = FlowSource.from_args(test_video, cv_config=path)
        assert src.config.method == "horn-schunck"
        assert src.config.hs_alpha == 2.0


class TestArchiveFlowSource:

    def test_replay(self, flow_archive):
        with FlowSource.from_args(flow_archive) as src:
            assert (src.width, src.height) == (64, 48)
            assert src.direction == Direction.BACKWARD
            items = list(src)
            assert len(items) == 10
            assert all(i.kind == FlowItem.FLOW for i in items)
            assert items[0].array.shape == (48, 64, 2)

    def test_prefetch_pool_bit_identical(self, tmp_path, monkeypatch):
        """The threaded prefetcher (archive.py docstring) must replay the
        same bytes as the sequential reader across seek/repeat rewinds.
        int16 members so the archive is DEFLATED (the pool's path —
        float members go STORED and take the mmap path instead)."""
        path = str(tmp_path / "i.flow.zip")
        out = NumpyArchiveOutput(path, {"direction": 0, "width": 64,
                                        "height": 48, "framerate": 10.0},
                                 replace=True)
        rng = np.random.default_rng(3)
        for _ in range(10):
            out.write_array(rng.integers(-4, 4, (48, 64, 2),
                                         dtype=np.int16))
        out.close()
        import zipfile
        assert all(i.compress_type == zipfile.ZIP_DEFLATED
                   for i in zipfile.ZipFile(path).infolist()
                   if i.filename.endswith(".npy"))

        def read_all(threads):
            monkeypatch.setenv("TRANSFLOW_ARCHIVE_THREADS", threads)
            with FlowSource.from_args(path, seek_time=0.3,
                                      repeat=2) as src:
                return [i.array.copy() for i in src]
        seq, pooled = read_all("1"), read_all("4")
        assert len(seq) == len(pooled) == 14  # (10 - 3) * 2
        for a, b in zip(seq, pooled):
            assert np.array_equal(a, b)

    def test_clean_shutdown_with_pool_mid_stream(self, tmp_path,
                                                 monkeypatch):
        """Closing a pooled archive source while frames remain (a
        --duration cut) must not surface a spurious decode error:
        pipeline._close joins the decode thread before tearing down the
        zip handles / prefetch pool (regression: 'seek of closed file'
        / CancelledError at shutdown)."""
        import cv2
        from transflow_tpu.config import Config, PixmapSourceConfig
        from transflow_tpu.pipeline import Pipeline
        monkeypatch.setenv("TRANSFLOW_ARCHIVE_THREADS", "4")
        path = str(tmp_path / "d.flow.zip")
        out = NumpyArchiveOutput(path, {"direction": 0, "width": 64,
                                        "height": 48, "framerate": 10.0},
                                 replace=True)
        rng = np.random.default_rng(5)
        for _ in range(20):
            out.write_array(rng.integers(-4, 4, (48, 64, 2),
                                         dtype=np.int16))
        out.close()
        dst = str(tmp_path / "o.avi")
        cfg = Config(path, output_path=dst, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig("noise")],
                     duration_time=0.5, seed=1)  # 5 of 20 frames
        pipeline = Pipeline(cfg, progress=False, execute=False,
                            replace=True, export_config=False)
        pipeline.run()
        for thread in pipeline.flow_threads:
            assert thread.error is None
            assert not thread.is_alive()
        cap = cv2.VideoCapture(dst)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5

    def test_mmap_stored_path_bit_identical(self, flow_archive,
                                            monkeypatch):
        """Float members are STORED and served as zero-copy mmap views;
        must match the zf.read fallback byte-for-byte."""
        import zipfile
        assert any(i.compress_type == zipfile.ZIP_STORED
                   for i in zipfile.ZipFile(flow_archive).infolist()
                   if i.filename.endswith(".npy"))

        def read_all(mmap_flag):
            monkeypatch.setenv("TRANSFLOW_ARCHIVE_MMAP", mmap_flag)
            with FlowSource.from_args(flow_archive, seek_time=0.3,
                                      repeat=2) as src:
                return [np.array(i.array) for i in src]
        plain, mapped = read_all("0"), read_all("1")
        assert len(plain) == len(mapped) == 14
        for a, b in zip(plain, mapped):
            assert np.array_equal(a, b)
        assert mapped[0].dtype == np.float32


class TestPixmapRouting:

    def test_stills(self):
        cases = {
            "color": st.ColorPixmapSource,
            "color:red": st.ColorPixmapSource,
            "#ff0000": st.ColorPixmapSource,
            "noise": st.NoisePixmapSource,
            "bwnoise": st.BwNoisePixmapSource,
            "cnoise": st.ColoredNoisePixmapSource,
            "gradient": st.GradientPixmapSource,
        }
        for keyword, cls in cases.items():
            src = PixmapSource.from_args(keyword, (16, 12), seed=0)
            assert isinstance(src, cls), keyword

    def test_color_decode(self):
        with PixmapSource.from_args("color:red", (8, 6), seed=0) as src:
            frame = next(src)
            assert frame.shape == (6, 8, 3)
            assert np.all(frame[..., 0] == 255) and np.all(frame[..., 1] == 0)

    def test_noise_seeded(self):
        with PixmapSource.from_args("noise", (8, 6), seed=1) as a, \
             PixmapSource.from_args("noise", (8, 6), seed=1) as b:
            assert np.array_equal(next(a), next(b))

    def test_gradient(self):
        with PixmapSource.from_args("gradient", (32, 24), seed=3) as src:
            frame = next(src)
            assert frame.shape == (24, 32, 3)
            assert frame.std() > 0  # actually a gradient, not constant

    def test_image(self, tmp_path):
        import PIL.Image
        path = str(tmp_path / "img.png")
        PIL.Image.fromarray(
            np.full((6, 8, 3), 42, dtype=np.uint8)).save(path)
        src = PixmapSource.from_args(path, (8, 6))
        assert isinstance(src, st.ImagePixmapSource)
        with src:
            assert np.all(next(src) == 42)

    def test_first(self, test_video):
        with PixmapSource.from_args("first", (64, 48),
                                    flow_path=test_video) as src:
            frame = next(src)
            assert frame.shape == (48, 64, 3)

    def test_video(self, test_video):
        src = PixmapSource.from_args(test_video, (64, 48))
        assert isinstance(src, VideoPixmapSource)
        with src:
            assert src.length == 20
            frame = next(src)
            assert frame.shape == (48, 64, 3)

    def test_alteration(self, tmp_path):
        import PIL.Image
        overlay = np.zeros((6, 8, 4), dtype=np.uint8)
        overlay[0, 0] = (9, 9, 9, 255)   # opaque pixel overrides
        overlay[1, 1] = (7, 7, 7, 0)     # transparent pixel ignored
        alt_path = str(tmp_path / "alt.png")
        PIL.Image.fromarray(overlay).save(alt_path)
        with PixmapSource.from_args("color:black", (8, 6), seed=0,
                                    alteration_path=alt_path) as src:
            frame = next(src)
            assert tuple(frame[0, 0]) == (9, 9, 9)
            assert tuple(frame[1, 1]) == (0, 0, 0)


def test_dsl_mask_through_source_postprocess(flow_archive):
    """Regression: DSL mask rules must be sized from the opened source
    (build_postprocess once loaded masks with shape (0, 0), crashing the
    pipeline; the reference still has that bug — source.py:127-129)."""
    import jax.numpy as jnp
    with FlowSource.from_args(flow_archive,
                              mask_path="border-left:50%") as source:
        postprocess = source.build_postprocess()
        assert postprocess.mask.shape == (48, 64)
        item = next(source)
        flow = jnp.asarray(item.array)
        out = np.asarray(postprocess(flow, 0.0, jnp.asarray(postprocess.mask)))
        # right half masked to zero; left half = the unmasked postprocess
        # (which still clips flows to the frame bounds)
        assert np.count_nonzero(out[:, 32:]) == 0
        from transflow_tpu.flow.transforms import make_postprocess
        plain = np.asarray(make_postprocess(None, None, None,
                                            source.direction)(flow, 0.0))
        np.testing.assert_array_equal(out[:, :32], plain[:, :32])
        assert np.count_nonzero(out[:, :32]) > 0
