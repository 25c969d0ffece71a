"""Profiling subsystem: stage timers, report math, device trace capture."""
import glob
import os
import time

import numpy as np
import pytest

from transflow_tpu.profiling import StageTimers, device_trace


def test_stage_accounting():
    timers = StageTimers()
    for _ in range(3):
        with timers.stage("work"):
            time.sleep(0.01)
    with timers.stage("other"):
        time.sleep(0.005)
    report = timers.report()
    assert report["stages"]["work"]["count"] == 3
    assert report["stages"]["work"]["total_s"] >= 0.03
    assert report["stages"]["work"]["mean_ms"] >= 10
    assert report["stages"]["other"]["count"] == 1
    assert report["frames"] == 3          # max stage count
    assert 0 < report["stages"]["work"]["share"] <= 1


def test_stage_counts_exceptions():
    timers = StageTimers()
    with pytest.raises(ValueError):
        with timers.stage("boom"):
            raise ValueError()
    assert timers.counts["boom"] == 1     # timed even when the body raises


def test_format_table_and_dump(tmp_path):
    timers = StageTimers()
    with timers.stage("alpha"):
        pass
    table = timers.format_table()
    assert "alpha" in table and "fps" in table
    path = str(tmp_path / "p.json")
    timers.dump(path)
    import json
    assert json.load(open(path))["stages"]["alpha"]["count"] == 1


def test_device_trace_writes_capture(tmp_path):
    import jax
    import jax.numpy as jnp
    trace_dir = str(tmp_path / "traces")
    with device_trace(trace_dir):
        x = jnp.ones((64, 64))
        jax.block_until_ready(jnp.dot(x, x))
    files = glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files), files


def test_device_trace_none_is_noop(tmp_path):
    with device_trace(None):
        pass  # must not require jax or create anything
