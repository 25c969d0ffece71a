"""Flow archive / video inspector: render any flow source as color maps.

Parity reference: extra/viewflow.py + extra/viewflow/ (the reference's
standalone flow visualizer). This wraps the framework's --view-flow /
--view-flow-magnitude pipeline, adds a per-frame statistics mode, and an
interactive frame-by-frame player (--play, see viewflow_player.py: views
source/destination/reconstructed, arrow + magnitude overlays, zoom, mouse
flow probe).

Usage:
  python extra/viewflow.py video.flow.zip -o flow.avi
  python extra/viewflow.py video.mp4 --magnitude -o mag.avi
  python extra/viewflow.py video.flow.zip --stats
  python extra/viewflow.py video.mp4 --play
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("source", help="flow source (.flow.zip or video)")
    parser.add_argument("-o", "--output", default=None)
    parser.add_argument("--magnitude", action="store_true",
                        help="render the magnitude instead of the direction")
    parser.add_argument("--scale", type=float, default=0.1)
    parser.add_argument("--colors", type=str, default=None)
    parser.add_argument("--binary", action="store_true")
    parser.add_argument("--stats", action="store_true",
                        help="print per-frame flow statistics instead of "
                        "rendering")
    parser.add_argument("--play", action="store_true",
                        help="interactive frame-by-frame inspector")
    parser.add_argument("--arrow-step", type=int, default=24,
                        help="arrow overlay grid pitch (--play)")
    args = parser.parse_args()

    if args.play:
        from viewflow_player import run_player
        run_player(args.source, arrow_step=args.arrow_step)
        return

    if args.stats:
        import numpy as np
        from transflow_tpu.flow.sources.base import FlowSource, FlowItem
        with FlowSource.from_args(args.source) as source:
            print(f"{source.width}x{source.height} @ {source.framerate} fps, "
                  f"{source.length} frames")
            for index, item in enumerate(source):
                if item.kind != FlowItem.FLOW:
                    print("(estimator source: use the render mode for "
                          "computed flows)")
                    break
                flow = item.array
                mag = np.linalg.norm(flow, axis=-1)
                print(f"frame {index:5d}: mean |f| {mag.mean():7.3f}  "
                      f"max |f| {mag.max():7.3f}  "
                      f"moving {np.mean(mag > 0.5):6.1%}")
        return

    from transflow_tpu.cli import main as cli_main
    argv = [args.source,
            "--view-flow-magnitude" if args.magnitude else "--view-flow",
            "--render-scale", str(args.scale), "--no-exec"]
    if args.colors:
        argv += ["--render-colors", args.colors]
    if args.binary:
        argv.append("--render-binary")
    if args.output:
        argv += ["-o", args.output, "--overwrite"]
    cli_main(argv)


if __name__ == "__main__":
    main()
