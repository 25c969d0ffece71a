"""Realtime low-latency flow transfer: camera/video -> TPU -> window.

Parity reference: extra/cpp/transflow.cpp (the standalone C++ webcam shell:
capture threads + Farneback + remap + hotkeys). Here the native IO runtime
(native/transflow_io.cpp) does GIL-free capture/convert/display and the whole
per-frame compute is one fused TPU program (FlowTransferModel).

Hotkeys (window mode, parity with transflow.cpp:400-446):
  ESC/q  quit
  r      burst random reset (one frame of full reset)
  t      toggle continuous random reset
  l      toggle linear reset
  s      save a PNG snapshot

Usage:
  python extra/realtime.py 0                   # webcam 0 -> window
  python extra/realtime.py in.mp4 -o out.avi   # file -> file (headless)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("source", help="webcam index or video path")
    parser.add_argument("-o", "--output", default=None,
                        help="write to a video file instead of a window")
    parser.add_argument("--size", default=None, help="WIDTHxHEIGHT")
    parser.add_argument("--method", default="farneback",
                        choices=["farneback", "horn-schunck", "lukas-kanade"])
    parser.add_argument("--reset", type=float, default=0.01,
                        help="random reset probability per frame")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-frames", type=int, default=None)
    args = parser.parse_args()

    import transflow_tpu
    transflow_tpu.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from transflow_tpu.config import LayerConfig
    from transflow_tpu.flow import Direction
    from transflow_tpu.model import FlowTransferModel
    from transflow_tpu import native

    source = int(args.source) if args.source.isdigit() else args.source
    width = height = 0
    if args.size:
        width, height = (int(x) for x in args.size.lower().split("x"))
    reader = native.NativeReader(source, width, height, gray=False)
    h, w = reader.height, reader.width
    print(f"source: {w}x{h} @ {reader.fps:.1f} fps")

    model = FlowTransferModel(
        h, w, [LayerConfig(0, reset_mode="random",
                           reset_random_factor=args.reset)],
        {0: [(3, np.ones((h, w), bool))]},
        method=args.method, direction=Direction.BACKWARD,
        framerate=reader.fps)

    first = reader.read()
    if first is None:
        print("empty source")
        return
    gray_first = np.asarray(
        0.299 * first[..., 0] + 0.587 * first[..., 1]
        + 0.114 * first[..., 2], dtype=np.uint8)
    state = model.init_state(gray_first)
    pixmap = ((jax.device_put(first),),)
    frame_numbers = model.default_frame_numbers()
    key = jax.random.key(args.seed)

    writer = None
    if args.output:
        writer = native.NativeWriter(args.output, w, h, reader.fps or 30.0)

    from transflow_tpu.ops.image import rgb_to_gray
    gray_fn = jax.jit(rgb_to_gray)

    frames = 0
    started = time.time()
    continuous_reset = True
    try:
        for rgb in reader:
            gray = gray_fn(jax.device_put(rgb))
            key, sub = jax.random.split(key)
            state, out = model.jit_step(
                state, gray, pixmap, jnp.float32(frames / (reader.fps or 30)),
                sub, frame_numbers)
            frames += 1
            host = np.asarray(out)
            if writer is not None:
                writer.feed(host)
                if args.max_frames and frames >= args.max_frames:
                    break
            else:
                pressed = native.display("transflow-tpu", host, wait_ms=1)
                if pressed in (27, ord("q")):
                    break
                if pressed == ord("r"):
                    state["comp"] = model._comp_init()
                if pressed == ord("s"):
                    import PIL.Image
                    PIL.Image.fromarray(host).save(
                        f"snapshot-{frames:05d}.png")
                if args.max_frames and frames >= args.max_frames:
                    break
    except KeyboardInterrupt:
        pass
    finally:
        elapsed = time.time() - started
        print(f"{frames} frames in {elapsed:.1f}s "
              f"({frames / max(elapsed, 1e-6):.1f} fps end-to-end)")
        reader.close()
        if writer is not None:
            writer.close()


if __name__ == "__main__":
    main()
