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

Interpretation (see ``bench.slope_fit`` for the verdict rules):
- ``device-throughput``: the regime's damage is readback-only; the slope
  fps IS the device throughput (cross-check: it must land in the
  28k-101k fps healthy band, BASELINE.md).
- ``poll-serialized``: dispatches themselves serialize on the poll
  cycle; nothing can be measured in this regime, and the tool says so
  instead of printing a number.

The fit quality (R^2) and the intercept are reported so the record
self-describes: a wandering quantum shows up as a bad fit, not as a
silently wrong fps.

The implementation lives in ``bench.bench_slope`` (also the automatic
fallback when bench.py's standard gate refuses); this tool is the
standalone entry with a larger default grid for diagnostic runs.

Usage: python tools/slope_probe.py [max_chunks] [budget_s]
  (defaults 256 / 3600). Prints one JSON line.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import transflow_tpu  # noqa: E402

transflow_tpu.enable_compile_cache(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import bench  # noqa: E402


def main():
    max_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    budget_s = float(sys.argv[2]) if len(sys.argv) > 2 else 3600.0
    grid = tuple(n for n in (8, 16, 32, 64, 128, 256) if n <= max_chunks)
    out = bench.bench_slope(budget_s=budget_s, grid=grid, passes=3)
    out["note"] = ("slope methodology cancels constant completion-quantum "
                   "latency; valid only when verdict=device-throughput")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
