"""Interactive flow inspector helpers (extra/viewflow_player.py)."""
import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "extra"))

from viewflow_player import (FlowClip, arrow_segments, hud_lines,
                             magnitude_image, reconstruct)


def test_magnitude_image_colors():
    flow = np.zeros((4, 6, 2), np.float32)
    img = magnitude_image(flow)
    assert img.shape == (4, 6, 3) and img.dtype == np.uint8
    np.testing.assert_array_equal(img[0, 0], [0, 0, 106])  # still = cold
    flow[:] = 100.0
    hot = magnitude_image(flow)
    np.testing.assert_array_equal(hot[0, 0], [183, 49, 33])  # fast = hot


def test_arrow_segments_grid_and_threshold():
    flow = np.zeros((48, 96, 2), np.float32)
    flow[:24, :48] = (6.0, -3.0)      # only the top-left quadrant moves
    segments = arrow_segments(flow, step=24, min_norm=0.5)
    assert segments, "moving block must produce arrows"
    for (x0, y0), (x1, y1) in segments:
        assert x0 < 48 and y0 < 24, "arrows only where motion is"
        assert (x1 - x0, y1 - y0) == (6, -3)


def test_reconstruct_matches_reference_put_semantics():
    """Flat numpy.put with wrap mode, last-write-wins in flat order —
    the reference viewer's apply_flow (extra/viewflow/player.py:119-130).
    Every pixel also self-writes (offset 0), so a moved value survives only
    when its source flat index exceeds the target's (backward moves)."""
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (8, 10, 3), dtype=np.uint8)
    flow = np.zeros((8, 10, 2), np.float32)
    flow[3, 5] = (-2.0, -1.0)   # pixel (3,5) scatters back to (2,3)
    out = reconstruct(frame, flow)
    np.testing.assert_array_equal(out[2, 3], frame[3, 5])
    # a forward move is overwritten by the target's later self-write
    flow2 = np.zeros((8, 10, 2), np.float32)
    flow2[2, 3] = (2.0, 1.0)
    out2 = reconstruct(frame, flow2)
    np.testing.assert_array_equal(out2[3, 5], frame[3, 5])
    # untouched pixels keep their value; input is not mutated
    np.testing.assert_array_equal(out[0, 0], frame[0, 0])
    np.testing.assert_array_equal(frame[2, 3], out2[2, 3])


def test_hud_lines_content():
    flow = np.zeros((6, 8, 2), np.float32)
    flow[1, 2] = (1.5, -0.5)
    lines = hud_lines(4, 10, 25.0, flow, "source", cursor=(2, 1))
    assert "frame 4 / 10" in lines[0]
    assert "t=0.160s" in lines[0]
    assert "(2,1) -> (+1.50, -0.50)" in lines[2]
    # cursor out of bounds: no third line
    assert len(hud_lines(0, None, 25.0, flow, "source", cursor=(99, 99))) == 2


@pytest.fixture(scope="module")
def clip_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vf") / "clip.avi")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                             (64, 48))
    rng = np.random.default_rng(1)
    base = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    for t in range(5):
        writer.write(np.roll(base, 2 * t, axis=1))
    writer.release()
    return path


def test_flowclip_video(clip_video):
    clip = FlowClip(clip_video)
    assert len(clip) == 4           # 5 frames -> 4 flows
    assert clip.frame(0).shape == (48, 64, 3)
    flow = clip.flow(1)
    assert flow.shape == (48, 64, 2)
    # the content rolls +2 px/frame; median x-flow must reflect that
    assert abs(np.median(flow[..., 0])) > 0.5


def test_flowclip_archive(tmp_path):
    from transflow_tpu.flow import Direction
    from transflow_tpu.output.archive import NumpyArchiveOutput
    path = str(tmp_path / "clip.flow.zip")
    meta = {"direction": Direction.BACKWARD.value, "width": 16, "height": 12,
            "framerate": 10.0}
    out = NumpyArchiveOutput(path, meta, replace=True)
    rng = np.random.default_rng(2)
    flows = [rng.normal(size=(12, 16, 2)).astype(np.float32)
             for _ in range(3)]
    for flow in flows:
        out.write_array(flow)
    out.close()
    clip = FlowClip(path)
    assert len(clip) == 3
    np.testing.assert_array_equal(clip.flow(1), flows[1])
    assert clip.frame(0).shape == (12, 16, 3)
