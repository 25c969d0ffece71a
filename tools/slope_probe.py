"""Slope-methodology throughput probe: an honest device-fps figure that a
QUANTIZED tunnel regime cannot fake.

The poll-cycle regime (BASELINE.md) adds a large, roughly CONSTANT
completion latency to every host-visible readback while the device
itself computes at full speed between polls. A single timed sample is
then dominated by the quantum and bench.py rightly refuses to print it.
But the quantum is an intercept, not a slope: timing samples of N
chained chunk dispatches (one value readback each) for several N and
regressing elapsed-vs-N cancels every constant term — handshake,
enqueue batching, poll alignment — leaving the true marginal cost of
one 16-frame chunk. fps = 16 / slope.

Interpretation:
- slope ~= the healthy per-chunk time (sub-ms): the device is fine and
  the regime's damage is readback-only; the slope fps IS the device
  throughput (cross-check: it must land in the 28k-101k fps healthy
  band, BASELINE.md).
- slope ~= the quantum (seconds): dispatches themselves serialize on the
  poll cycle; nothing can be measured in this regime, and the tool says
  so instead of printing a number.

The fit quality (R^2) and the intercept are reported so the record
self-describes: a wandering quantum shows up as a bad fit, not as a
silently wrong fps.

Usage: python tools/slope_probe.py [max_chunks]   (default 256)
Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import transflow_tpu  # noqa: E402

transflow_tpu.enable_compile_cache(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from transflow_tpu.config import LayerConfig
    from transflow_tpu.flow import Direction
    from transflow_tpu.model import FlowTransferModel

    max_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    model = FlowTransferModel(
        bench.HEIGHT, bench.WIDTH,
        [LayerConfig(0, reset_mode="random", reset_random_factor=0.01)],
        {0: [(3, np.ones((bench.HEIGHT, bench.WIDTH), bool))]},
        method="farneback", estimator_kwargs={},
        direction=Direction.BACKWARD)
    frames = bench.make_frames(bench.CHUNK + 1)
    state = model.init_state(frames[0])
    gray_sets = [jax.device_put(jnp.asarray(bench.make_frames(bench.CHUNK,
                                                              seed=s)))
                 for s in range(bench.GRAY_SETS)]
    pixmaps = model.default_pixmaps()
    keys = jax.random.split(jax.random.key(0), max_chunks)

    # compile + one warm chain
    state, rgbs = model.jit_scan(state, gray_sets[0], pixmaps,
                                 jnp.float32(0.0), keys[0])
    int(np.asarray(rgbs[-1, 0, 0, 0]))
    holder = {"state": state, "t": 1000}

    def sample(n):
        """n chained chunk dispatches, distinct inputs/keys/chunk numbers,
        ONE value readback at the end (the completion barrier)."""
        start = time.perf_counter()
        current = holder["state"]
        for i in range(n):
            current, rgbs = model.jit_scan(
                current, gray_sets[i % bench.GRAY_SETS], pixmaps,
                jnp.float32(holder["t"] + i), keys[i])
        holder["t"] += n
        int(np.asarray(rgbs[-1, 0, 0, 0]))
        holder["state"] = current
        return time.perf_counter() - start

    ns, ts = [], []
    grid = [n for n in (8, 16, 32, 64, 128, 256) if n <= max_chunks]
    for repeat in range(3):
        for n in grid:
            ns.append(n)
            ts.append(sample(n))
    ns_arr = np.asarray(ns, np.float64)
    ts_arr = np.asarray(ts, np.float64)
    slope, intercept = np.polyfit(ns_arr, ts_arr, 1)
    pred = slope * ns_arr + intercept
    ss_res = float(np.sum((ts_arr - pred) ** 2))
    ss_tot = float(np.sum((ts_arr - ts_arr.mean()) ** 2))
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    fps = bench.CHUNK / slope if slope > 0 else 0.0
    verdict = "unmeasurable"
    if slope > 0 and r2 > 0.95:
        # the quantized regime's quantum is seconds; a healthy chunk is
        # sub-ms — three orders of magnitude apart, so the bar is easy
        verdict = "device-throughput" if slope < 0.05 else "poll-serialized"
    print(json.dumps({
        "metric": "1080p_slope_fps_flow_warp_composite",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "slope_s_per_chunk": round(float(slope), 6),
        "intercept_s": round(float(intercept), 3),
        "r2": round(r2, 4),
        "verdict": verdict,
        "samples": [[int(n), round(t, 3)] for n, t in zip(ns, ts)],
        "note": "slope methodology cancels constant completion-quantum "
                "latency; valid only when verdict=device-throughput",
    }), flush=True)


if __name__ == "__main__":
    main()
