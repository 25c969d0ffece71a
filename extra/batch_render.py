"""Batch renderer: N independent videos through ONE sharded device program.

The reference renders one stream per process; this tool showcases the
framework's ``stream`` mesh axis (parallel/mesh.py) end-to-end: every input
video advects its own pixmap, all streams run inside a single
``sharded_scan`` dispatch per chunk (stream-parallel across devices,
H-sharded within each stream), and each stream writes its own output file.

Usage:
  python extra/batch_render.py out_dir flow1.mp4:pix1.jpg flow2.mp4:pix2.jpg \
      [--chunk 8] [--method horn-schunck] [--reset random:0.05] [--halo 8]

All inputs must share the same frame size; the run length is the shortest
stream. Streams must number >= the mesh's stream axis (pad by repeating the
last pair if needed). Works on any device count (incl. the 8-device CPU
mesh used by the tests).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def decode_all(path: str):
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY))
    cap.release()
    return np.stack(frames), fps


def load_pixmap(path: str, h: int, w: int):
    import cv2
    image = cv2.imread(path, cv2.IMREAD_COLOR)
    if image is None:
        raise FileNotFoundError(path)
    image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
    if image.shape[:2] != (h, w):
        image = cv2.resize(image, (w, h))
    return image


def batch_render(pairs, out_dir, chunk=8, method="horn-schunck",
                 reset=("random", 0.05), halo=None, seed=0,
                 estimator_kwargs=None, vcodec="MJPG"):
    """Render [(flow_path, pixmap_path), ...] -> out_dir/stream%02d.avi.

    Returns the list of output paths."""
    import cv2
    import jax
    import jax.numpy as jnp
    from transflow_tpu.config import LayerConfig
    from transflow_tpu.flow import Direction
    from transflow_tpu.model import FlowTransferModel
    from transflow_tpu.parallel import (make_mesh, shard_model_inputs,
                                        sharded_scan)

    decoded = [decode_all(flow_path) for flow_path, _ in pairs]
    h, w = decoded[0][0].shape[1:]
    for frames, _ in decoded:
        if frames.shape[1:] != (h, w):
            raise ValueError("all flow inputs must share the same size")
    n_frames = min(frames.shape[0] for frames, _ in decoded)
    fps = decoded[0][1]
    pixmaps_np = [load_pixmap(pix_path, h, w) for _, pix_path in pairs]

    mesh = make_mesh()
    n_streams = mesh.shape["stream"]
    if len(pairs) % n_streams:
        raise ValueError(
            f"stream count {len(pairs)} must be a multiple of the mesh's "
            f"stream axis {n_streams} (pad by repeating inputs)")

    mode, factor = reset
    layer_cfgs = [LayerConfig(0, reset_mode=mode, reset_random_factor=factor,
                              reset_linear_factor=factor,
                              reset_constant_step=factor)]
    flow_filters = f"clip={halo}" if halo else None
    from transflow_tpu.engine import mesh_safe_kwargs
    kwargs = estimator_kwargs if estimator_kwargs is not None else (
        dict(max_iters=8, delta=None) if method == "horn-schunck" else {})
    # mesh-safe CNN kernels: route the correlation through its manual-SPMD
    # entry point and keep the unpartitionable bounded warp off
    kwargs = mesh_safe_kwargs(kwargs, method, mesh)
    model = FlowTransferModel(
        h, w, layer_cfgs, {0: [(3, np.ones((h, w), bool))]},
        method=method, estimator_kwargs=kwargs,
        direction=Direction.BACKWARD, flow_filters=flow_filters, halo=halo)

    os.makedirs(out_dir, exist_ok=True)
    writers = []
    outputs = []
    for idx in range(len(pairs)):
        path = os.path.join(out_dir, f"stream{idx:02d}.avi")
        writers.append(cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*vcodec), fps, (w, h)))
        outputs.append(path)

    from jax.sharding import NamedSharding, PartitionSpec as P
    run = sharded_scan(model, mesh, per_stream_pixmaps=True)
    # process mesh-width groups of streams; one device dispatch per chunk
    for group0 in range(0, len(pairs), n_streams):
        group = list(range(group0, group0 + n_streams))
        state = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[model.init_state(decoded[s][0][0]) for s in group])
        # each stream's OWN pixmap, stacked on a leading stream dim and
        # sharded over the 'stream' axis
        pixmaps = tuple(
            tuple(jax.device_put(
                jnp.asarray(np.stack([pixmaps_np[s] for s in group])),
                NamedSharding(mesh, P("stream", None, None, None)))
                for _ in layer.channel_counts)
            for layer in model.layer_params)
        keys = jax.random.split(jax.random.key(seed + group0), n_streams)
        # placeholder set placed once (shard_model_inputs needs a pixmap
        # tree; the real per-stream pixmaps above are passed to run())
        default_pixmaps = model.default_pixmaps()
        t0 = 0.0
        for start in range(1, n_frames, chunk):
            stop = min(start + chunk, n_frames)
            grays = np.stack([decoded[s][0][start:stop] for s in group])
            chunk_keys = jax.vmap(
                lambda k: jax.random.fold_in(k, start))(keys)
            st, gr, _, ks = shard_model_inputs(
                mesh, state, jnp.asarray(grays), default_pixmaps,
                chunk_keys)
            with mesh:
                state, rgbs = run(st, gr, pixmaps, jnp.float32(t0), ks)
            host = np.asarray(rgbs)
            for k, s in enumerate(group):
                for frame in host[k]:
                    writers[s].write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
            t0 += (stop - start) / fps
    for writer in writers:
        writer.release()
    return outputs


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("pairs", nargs="+",
                        help="flow_video:pixmap_image pairs")
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--method", default="horn-schunck")
    parser.add_argument("--reset", default="random:0.05")
    parser.add_argument("--halo", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    pairs = [tuple(p.split(":", 1)) for p in args.pairs]
    mode, _, factor = args.reset.partition(":")
    outputs = batch_render(pairs, args.out_dir, chunk=args.chunk,
                           method=args.method,
                           reset=(mode, float(factor or 0.05)),
                           halo=args.halo, seed=args.seed)
    for path in outputs:
        print(path)


if __name__ == "__main__":
    main()
