"""Slope-methodology throughput probe: an honest device-fps figure that a
QUANTIZED tunnel regime cannot fake.

The poll-cycle regime (BASELINE.md) adds a large, roughly CONSTANT
per-dispatch latency to every host-visible completion — and has been
observed serializing dispatches themselves, so chaining MORE dispatches
cannot cancel it. Varying the PROGRAM LENGTH can: each sample is ONE
dispatch of an n-frame lax.scan program (estimator -> postprocess ->
compositor -> render per frame, all rendered pixels feeding a returned
checksum), so elapsed(n) = quantum + n * per_frame and the quantum is
an intercept the elapsed-vs-frames regression removes. fps = 1/slope.

Interpretation (see ``bench.slope_fit`` for the verdict rules):
- ``device-throughput``: the regime's damage is readback-only; the slope
  fps IS the device throughput (cross-check: it must land in the
  physical ~2-10k fps band — docs/PERF.md round-4 accounting; the old
  28k-101k "healthy band" was a barrier artifact).
- ``poll-serialized``: dispatches themselves serialize on the poll
  cycle; nothing can be measured in this regime, and the tool says so
  instead of printing a number.

The fit quality (R^2) and the intercept are reported so the record
self-describes: a wandering quantum shows up as a bad fit, not as a
silently wrong fps.

The implementation lives in ``bench.bench_slope`` (also the automatic
fallback when bench.py's standard gate refuses); this tool is the
standalone entry with a larger default grid for diagnostic runs.

Usage: python tools/slope_probe.py [budget_s]
  (default 3600). Prints one JSON line.
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
    budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 3600.0
    out = bench.bench_slope(budget_s=budget_s)  # adaptive program ladder
    out["note"] = ("slope methodology cancels constant per-dispatch "
                   "quantum latency (program-length regression); valid "
                   "only when verdict=device-throughput")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
