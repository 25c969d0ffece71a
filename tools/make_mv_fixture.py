"""Generate the committed motion-vector fixture (tests/fixtures/mv/).

Encodes a deterministic 10-frame 96x128 H.264 clip with the native libx264
writer under the MV source's contract (bf=0, refs=1 — reference
transflow/flow/sources/av.py:69 asserts source == -1), whose content is a
pure global translation of a seeded blurred-noise texture: frame t shows
the window shifted by (dx, dy) = (+3, +2) per step, so the decoded flow's
dominant value is exactly (-3, -2) px (reference rasterization negates,
av.py:61-77).

Then decodes the clip's motion-vector side data through the native shim
and dumps every record to expected_side_data.json — the committed ground
truth tests compare a fresh decode against, plus the meta block (size,
fps, ground-truth flow).

Re-run only to regenerate the fixture after an intentional change:

    python tools/make_mv_fixture.py
"""
import json
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transflow_tpu.av_native import H264Writer, MvReader  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "mv")
HEIGHT, WIDTH = 96, 128
FRAMES = 10
DX, DY = 3, 2  # window shift per frame => content flow (-DX, -DY)
FIELDS = ["source", "w", "h", "src_x", "src_y", "dst_x", "dst_y",
          "motion_x", "motion_y", "motion_scale"]


def make_clip(path: str):
    rng = np.random.default_rng(5)
    base = cv2.GaussianBlur(
        rng.integers(0, 256, (HEIGHT + 64, WIDTH + 64, 3), np.uint8),
        (0, 0), 2)
    with H264Writer(path, WIDTH, HEIGHT, 25.0, max_b_frames=0, refs=1,
                    crf=16, preset="medium") as writer:
        for t in range(FRAMES):
            writer.feed(base[16 + DY * t:16 + DY * t + HEIGHT,
                             16 + DX * t:16 + DX * t + WIDTH])


def dump_side_data(path: str) -> dict:
    frames = []
    with MvReader(path) as reader:
        meta = {"width": reader.width, "height": reader.height,
                "fps": reader.fps, "frame_count": reader.frame_count,
                "true_flow": [-DX, -DY]}
        while (mvs := reader.next()) is not None:
            frames.append([{f: int(mv[f]) for f in FIELDS} for mv in mvs])
    return {"meta": meta, "frames": frames}


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    clip = os.path.join(OUT_DIR, "clip.mp4")
    make_clip(clip)
    dump = dump_side_data(clip)
    with open(os.path.join(OUT_DIR, "expected_side_data.json"), "w") as file:
        json.dump(dump, file, indent=1)
    total = sum(len(f) for f in dump["frames"])
    print(f"wrote {clip} ({os.path.getsize(clip)} B) + side data dump "
          f"({len(dump['frames'])} frames, {total} vectors)")


if __name__ == "__main__":
    main()
