"""Output routing and writers."""
import os
import socket
import time
import urllib.request

import numpy as np
import pytest

from transflow_tpu.output.video_output import VideoOutput
from transflow_tpu.output.encoded import EncodedVideoOutput
from transflow_tpu.output.frames import FramesOutput
from transflow_tpu.output.mjpeg import MjpegOutput
from transflow_tpu.output.archive import NumpyArchiveOutput, ZipOutput


def _frame(h=32, w=48, value=128):
    return np.full((h, w, 3), value, dtype=np.uint8)


class TestRouting:

    def test_encoded(self, tmp_path):
        out = VideoOutput.from_args(str(tmp_path / "out.mp4"), 48, 32, 10.0)
        assert isinstance(out, EncodedVideoOutput)

    def test_frames(self, tmp_path):
        out = VideoOutput.from_args(str(tmp_path / "f-%03d.png"), 48, 32, 10.0)
        assert isinstance(out, FramesOutput)

    def test_mjpeg(self):
        out = VideoOutput.from_args("mjpeg:18099", 48, 32, 10.0)
        assert isinstance(out, MjpegOutput)
        assert out.port == 18099

    def test_window(self):
        from transflow_tpu.output.window import WindowOutput
        out = VideoOutput.from_args(None, 48, 32, 10.0)
        assert isinstance(out, WindowOutput)


class TestEncoded:

    def test_writes_file(self, tmp_path):
        path = str(tmp_path / "out.mp4")
        with VideoOutput.from_args(path, 48, 32, 10.0) as out:
            for _ in range(5):
                out.feed(_frame())
        assert os.path.isfile(out.output_path)
        assert os.path.getsize(out.output_path) > 0
        import cv2
        cap = cv2.VideoCapture(out.output_path)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
        cap.release()

    def test_unique_path(self, tmp_path):
        path = str(tmp_path / "out.mp4")
        open(path, "w").write("x")
        out = EncodedVideoOutput(path, 48, 32, 10.0)
        assert out.output_path.endswith("out.000.mp4")

    def test_h264_vcodec_really_encodes_h264(self, tmp_path):
        """The reference's default codec is h264 (transflow/output/
        ffmpeg.py:40-47); on this image only the native libav writer can
        honor it — the written stream must actually BE H.264, not a
        silently substituted cv2 codec."""
        pytest.importorskip("transflow_tpu.av_native")
        from transflow_tpu.av_native import is_available
        if not is_available():
            pytest.skip("native libav shim unavailable")
        path = str(tmp_path / "real.mp4")
        with EncodedVideoOutput(path, 48, 32, 10.0, vcodec="h264") as out:
            assert out.libav is not None, "libav writer tier not selected"
            for _ in range(5):
                out.feed(_frame())
        import cv2
        cap = cv2.VideoCapture(path)
        fourcc = int(cap.get(cv2.CAP_PROP_FOURCC)).to_bytes(4, "little")
        frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        assert fourcc in (b"h264", b"avc1", b"H264")
        assert frames == 5


class TestFrames:

    def test_counter(self, tmp_path):
        template = str(tmp_path / "f-%03d.png")
        with VideoOutput.from_args(template, 48, 32, 10.0,
                                   initial_counter=7) as out:
            out.feed(_frame())
            out.feed(_frame())
        assert os.path.isfile(str(tmp_path / "f-007.png"))
        assert os.path.isfile(str(tmp_path / "f-008.png"))


class TestMjpeg:

    def test_stream(self):
        import threading
        with socket.socket() as probe:
            probe.bind(("127.0.0.1", 0))
            port = probe.getsockname()[1]
        out = MjpegOutput(48, 32, 10.0, port=port, host="127.0.0.1")
        with out:
            stop = threading.Event()

            def feeder():
                value = 0
                while not stop.is_set():
                    out.feed(_frame(value=value % 250))
                    value += 13
                    time.sleep(0.05)

            thread = threading.Thread(target=feeder, daemon=True)
            thread.start()
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/transflow",
                        timeout=10) as resp:
                    assert "multipart/x-mixed-replace" in resp.headers[
                        "Content-Type"]
                    data = resp.read(2000)
                    assert b"image/jpeg" in data
            finally:
                stop.set()
                thread.join(timeout=2)


class TestArchives:

    def test_numpy_archive(self, tmp_path):
        import zipfile, json
        path = str(tmp_path / "x.flow.zip")
        out = NumpyArchiveOutput(path, {"width": 4, "height": 3,
                                        "framerate": 10, "direction": 1})
        out.write_array(np.zeros((3, 4, 2), dtype=np.float32))
        out.write_array(np.ones((3, 4, 2), dtype=np.float32))
        out.close()
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
            assert "meta.json" in names
            assert "000000000.npy" in names and "000000001.npy" in names
            with z.open("meta.json") as f:
                assert json.load(f)["width"] == 4

    def test_adaptive_member_compression(self, tmp_path):
        """Dense float flows go STORED (mantissas don't compress; zero-
        copy mmap reads), compressible floats (static-footage MV exports
        are exact zeros) and integer flows stay DEFLATED."""
        import zipfile
        path = str(tmp_path / "c.flow.zip")
        out = NumpyArchiveOutput(path, {"width": 64, "height": 48,
                                        "framerate": 10, "direction": 0})
        rng = np.random.default_rng(0)
        out.write_array(rng.normal(size=(48, 64, 2)).astype(np.float32))
        out.write_array(np.zeros((48, 64, 2), dtype=np.float32))
        out.write_array(rng.integers(-4, 4, (48, 64, 2), dtype=np.int16))
        out.close()
        with zipfile.ZipFile(path) as z:
            kinds = {i.filename: i.compress_type for i in z.infolist()}
        assert kinds["000000000.npy"] == zipfile.ZIP_STORED
        assert kinds["000000001.npy"] == zipfile.ZIP_DEFLATED
        assert kinds["000000002.npy"] == zipfile.ZIP_DEFLATED

    def test_zip_arrays(self, tmp_path):
        import zipfile, io
        path = str(tmp_path / "state.ckpt.zip")
        out = ZipOutput(path, replace=True)
        out.write_meta({"cursor": 5})
        out.write_arrays("state.npz", {"a": np.arange(3)})
        out.close()
        with zipfile.ZipFile(path) as z:
            with z.open("state.npz") as f:
                loaded = np.load(io.BytesIO(f.read()))
                assert np.array_equal(loaded["a"], np.arange(3))
