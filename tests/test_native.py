"""Native C++ host-IO runtime (native/transflow_io.cpp via ctypes):
build/load, threaded file decode through the ring, write round trip."""
import os

import cv2
import numpy as np
import pytest

from transflow_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.is_available():
        pytest.skip("native library not built and no toolchain available")


@pytest.fixture(scope="module")
def test_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("native") / "video.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 12.0,
                             (64, 48))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    for t in range(10):
        writer.write(np.roll(base, 3 * t, axis=1))
    writer.release()
    return path


def test_reader_decodes_all_frames(lib_available, test_video):
    with native.NativeReader(test_video) as reader:
        frames = list(reader)
    assert len(frames) == 10
    for frame in frames:
        assert frame.shape == (48, 64, 3)
        assert frame.dtype == np.uint8
    # content sanity: consecutive frames differ (the roll moved pixels)
    assert not np.array_equal(frames[0], frames[1])


def test_reader_metadata(lib_available, test_video):
    with native.NativeReader(test_video) as reader:
        assert reader.width == 64
        assert reader.height == 48
        assert abs(reader.fps - 12.0) < 0.5
        next(iter(reader))


def test_writer_round_trip(lib_available, tmp_path):
    out = str(tmp_path / "out.avi")
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
              for _ in range(6)]
    with native.NativeWriter(out, 48, 32, 10.0) as writer:
        for frame in frames:
            writer.feed(frame)
    cap = cv2.VideoCapture(out)
    count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.release()
    assert count == 6


def test_missing_file_raises(lib_available):
    with pytest.raises(Exception):
        with native.NativeReader("/nope/missing.avi") as reader:
            next(iter(reader))


@pytest.fixture(scope="module")
def standalone_bin():
    import subprocess
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native")
    binary = os.path.join(root, "transflow_standalone")
    if not os.path.isfile(binary):
        build = subprocess.run(["make", "transflow_standalone"], cwd=root,
                               capture_output=True, text=True)
        if build.returncode != 0:
            pytest.skip(f"standalone build failed: {build.stderr[-400:]}")
    return binary


def test_standalone_headless_render(standalone_bin, test_video, tmp_path):
    """The no-Python native demo: file in, advected file out."""
    import subprocess
    out = str(tmp_path / "native_out.avi")
    result = subprocess.run(
        [standalone_bin, test_video, "--output", out, "--frames", "6",
         "--block", "2", "--decay", "0.05"],
        capture_output=True, text=True, timeout=120)
    assert result.returncode == 0, result.stderr
    assert "6 frames" in result.stdout
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    ok, frame = cap.read()
    cap.release()
    assert ok and frame.shape == (48, 64, 3)


def test_standalone_bad_input(standalone_bin):
    import subprocess
    result = subprocess.run([standalone_bin, "/nope/missing.avi",
                             "--headless"], capture_output=True, text=True,
                            timeout=30)
    assert result.returncode != 0
