"""Per-stage frame timing + device tracing.

The reference has no profiling beyond a tqdm rate display (SURVEY §5 names
this an explicit gap to fill). This module provides:

* StageTimers — lightweight per-stage wall-time accounting (decode wait,
  device dispatch, host drain, checkpoint) with totals/means/last, reported
  as a dict and printable table;
* device_trace — a context manager around jax.profiler.trace writing an
  xplane/trace-viewer capture for xprof/tensorboard.

Pipeline wires these behind --profile / --trace-dir.
"""
import contextlib
import json
import time
from collections import OrderedDict


class StageTimers:

    def __init__(self):
        self.totals: OrderedDict[str, float] = OrderedDict()
        self.counts: OrderedDict[str, int] = OrderedDict()
        self.last: dict[str, float] = {}
        self.started = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + elapsed
            self.counts[name] = self.counts.get(name, 0) + 1
            self.last[name] = elapsed

    def report(self) -> dict:
        wall = time.perf_counter() - self.started
        stages = {}
        for name, total in self.totals.items():
            count = self.counts[name]
            stages[name] = {
                "total_s": round(total, 4),
                "count": count,
                "mean_ms": round(1000 * total / max(count, 1), 3),
                "share": round(total / wall, 3) if wall > 0 else 0.0,
            }
        frames = max(self.counts.values()) if self.counts else 0
        return {
            "wall_s": round(wall, 3),
            "frames": frames,
            "fps": round(frames / wall, 2) if wall > 0 else 0.0,
            "stages": stages,
        }

    def format_table(self) -> str:
        report = self.report()
        lines = [f"wall {report['wall_s']}s — {report['frames']} frames — "
                 f"{report['fps']} fps",
                 f"{'stage':<18}{'mean ms':>10}{'total s':>10}{'share':>8}"]
        for name, row in report["stages"].items():
            lines.append(f"{name:<18}{row['mean_ms']:>10}{row['total_s']:>10}"
                         f"{row['share']:>8.0%}")
        return "\n".join(lines)

    def dump(self, path: str):
        with open(path, "w") as file:
            json.dump(self.report(), file, indent=2)


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler capture (xplane + trace-viewer json) when a dir is set."""
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield
