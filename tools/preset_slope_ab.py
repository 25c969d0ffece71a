"""In-regime A/B of the fb_downscale fast presets via the slope methodology.

Runs bench.bench_slope (one n-frame lax.scan dispatch per sample,
elapsed-vs-frames regression — the per-dispatch tunnel quantum cancels)
for the default Farneback config and each fast preset in
assets/configs/, and prints the slope ratios. In the poll-serialized
regime absolute fps is meaningless but programs execute genuinely
(BASELINE.md round-3 resolution-scaling evidence), so the RATIO of
slope_ms_per_frame is the honest measure of the per-frame work
reduction the presets buy; on a healthy tunnel the same ratios apply to
the absolute figures.

Usage: python tools/preset_slope_ab.py [budget_s_per_config]
  (default 480). Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import transflow_tpu  # noqa: E402

transflow_tpu.enable_compile_cache(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))

import bench  # noqa: E402
from transflow_tpu.flow.sources.cv import CvFlowConfig  # noqa: E402

CONFIGS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "configs")


def preset_kwargs(name: str) -> dict:
    with open(os.path.join(CONFIGS_DIR, name), encoding="utf8") as file:
        return CvFlowConfig(**json.load(file)).estimator_kwargs()


def main():
    budget_s = float(sys.argv[1]) if len(sys.argv) > 1 else 480.0
    cases = [("default", {}),
             # gather-free two-pass warp at full resolution (round 5,
             # ops/select_warp.py): same config as default except the
             # estimator's dominant gather is replaced by shift-selects
             ("select_warp", {"select_warp": 16}),
             ("fast", preset_kwargs("fast.json")),
             ("fast_select", {**preset_kwargs("fast.json"),
                              "select_warp": 16}),
             ("fastest", preset_kwargs("fastest.json"))]
    out = {"metric": "preset_slope_ab_1080p", "ts": time.time(),
           "cases": {}}
    base_ms = None
    for name, kwargs in cases:
        res = bench.bench_slope(budget_s=budget_s,
                                estimator_kwargs=kwargs)
        out["cases"][name] = res
        ms = res.get("slope_ms_per_frame")
        if name == "default":
            base_ms = ms
        elif base_ms and ms:
            out["cases"][name]["speedup_vs_default"] = round(base_ms / ms, 2)
        print(json.dumps({name: res}), flush=True)
    print(json.dumps(out), flush=True)
    # fixed-path copy: bench.py attaches this as fast_preset_ab evidence
    # on every record (refusals included), so the preset speedup survives
    # into BENCH_r{N}.json whatever the regime does at driver time
    latest = os.path.join(os.path.dirname(CONFIGS_DIR), "..",
                          "bench_attempts", "preset_slope_ab_latest.json")
    with open(os.path.abspath(latest), "w", encoding="utf8") as file:
        json.dump(out, file)


if __name__ == "__main__":
    main()
