"""Multi-stream batch renderer (extra/batch_render.py) on the CPU mesh."""
import os
import sys

import cv2
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "extra"))

from batch_render import batch_render, decode_all, load_pixmap


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("batch")
    rng = np.random.default_rng(0)
    videos = []
    for v in range(2):
        path = str(root / f"flow{v}.avi")
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"),
                                 10.0, (64, 32))
        base = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
        for t in range(9):
            writer.write(np.roll(base, (1 + v) * t, axis=1))
        writer.release()
        videos.append(path)
    pixmaps = []
    for v, color in enumerate([(255, 30, 30), (30, 30, 255)]):
        path = str(root / f"pix{v}.png")
        image = np.zeros((32, 64, 3), np.uint8)
        image[:, :] = color
        image[8:24, 16:48] = 255 - np.asarray(color, np.uint8)
        cv2.imwrite(path, cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
        pixmaps.append(path)
    return videos, pixmaps


def test_batch_render_two_streams(assets, tmp_path):
    videos, pixmaps = assets
    pairs = [(videos[0], pixmaps[0]), (videos[1], pixmaps[1])]
    outputs = batch_render(pairs, str(tmp_path / "out"), chunk=4,
                           method="horn-schunck", reset=("random", 0.05),
                           halo=6, seed=3,
                           estimator_kwargs=dict(max_iters=2, delta=None))
    assert len(outputs) == 2
    rendered = []
    for path in outputs:
        frames, fps = decode_all(path)
        assert frames.shape == (8, 32, 64)   # 9 frames -> 8 flows
        rendered.append(frames)
    # streams got DIFFERENT pixmaps: outputs must differ
    assert not np.array_equal(rendered[0], rendered[1])

    # each stream's output must match its own pixmap's palette: compare
    # mean gray against each pixmap's mean luminance
    def mean_gray(path):
        pix = load_pixmap(path, 32, 64)
        return cv2.cvtColor(pix, cv2.COLOR_RGB2GRAY).mean()

    for stream, out in enumerate(rendered):
        own = abs(out.mean() - mean_gray(pixmaps[stream]))
        other = abs(out.mean() - mean_gray(pixmaps[1 - stream]))
        assert own <= other + 16, (stream, own, other)


def test_stream_count_must_fit_mesh(assets, tmp_path):
    videos, pixmaps = assets
    with pytest.raises(ValueError, match="multiple"):
        batch_render([(videos[0], pixmaps[0])] * 3, str(tmp_path / "bad"))
