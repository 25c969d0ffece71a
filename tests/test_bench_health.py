"""bench.py regime-health verdict: the observed sick signatures must be
flagged and healthy readings must pass. bench.py imports jax/transflow at
module level (compile-cache setup only) — safe under the CPU conftest."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import health_verdict  # noqa: E402


def test_round2_quantized_signature_flagged():
    """The exact BENCH near-miss: 1.73 fps / 579.0 ms with stage timings
    riding the same cycle (estimator 460 ms, compositor 122 ms), probe
    RTT 1.2 s, chunk gate 9.3 s — previously passed every gate."""
    reasons = health_verdict(tunnel_rtt=1.223, chunk_rtt=9.298, fps=1.73,
                             ms_per_frame=578.97, est_ms=459.96,
                             comp_ms=121.88)
    assert reasons, "quantized sick regime must be flagged"
    # round-5 correction: 1.73 fps alone no longer trips the floor (the
    # measured gather wall makes genuine ~3 fps readings possible), but
    # this signature is still refused on the probe RTT and the chunk
    # gate — it carries no compute-healthy evidence
    assert any("RTT" in r for r in reasons)
    # the 9.3 s chunk itself must be flagged: the verdict bar matches the
    # measurement gate's 2 s, not the looser 10 s it once squeaked under
    assert any("chunk" in r for r in reasons)


def test_sub_floor_reading_flagged():
    """Below GENUINE_FLOOR_FPS even the measured worst-case gather wall
    cannot explain the reading — infrastructure, not device."""
    reasons = health_verdict(tunnel_rtt=0.04, chunk_rtt=0.3, fps=0.45,
                             ms_per_frame=2218.7, est_ms=459.8,
                             comp_ms=121.2)
    assert any("physical floor" in r for r in reasons)


def test_gather_bound_reading_passes_floor():
    """A genuine gather-bound reading (round-5 probes: ~3 fps at the
    default config) behind a PASSING chunk gate must not be refused on
    the old 100-fps floor."""
    reasons = health_verdict(tunnel_rtt=0.04, chunk_rtt=0.3, fps=3.0,
                             ms_per_frame=333.3, est_ms=250.0,
                             comp_ms=80.0)
    assert reasons == []


def test_sick_chunk_with_healthy_window_sample_flagged():
    """A healthy window mid-sick-stretch can make the fps sample look
    fine while the chunk gate never cleared: the chunk reason alone must
    mark the record unhealthy."""
    reasons = health_verdict(tunnel_rtt=0.05, chunk_rtt=5.4, fps=30000.0,
                             ms_per_frame=0.033, est_ms=0.02,
                             comp_ms=0.02)
    assert any("chunk" in r for r in reasons)


def test_dead_tunnel_flagged():
    reasons = health_verdict(tunnel_rtt=120.0, chunk_rtt=300.0, fps=0.45,
                             ms_per_frame=2218.7, est_ms=459.8,
                             comp_ms=121.2)
    assert len(reasons) >= 3


def test_healthy_regime_passes():
    """A physically-consistent healthy reading (inside the round-4
    floor/ceiling band), sub-50ms probe, fused beats the stage sum."""
    reasons = health_verdict(tunnel_rtt=0.04, chunk_rtt=0.3, fps=6000.0,
                             ms_per_frame=0.167, est_ms=0.1,
                             comp_ms=0.1)
    assert reasons == []


def test_over_ceiling_reading_flagged():
    """Round-4 regression: the pre-round-4 'healthy' range (28k-101k fps)
    implies more HBM traffic than the v5e has — the mapping-pair round
    trip + frame IO alone exceed 819 GB/s at those rates. Such a reading
    means the completion barrier was defeated and must be refused, not
    recorded (VERDICT r3 Weak #3)."""
    for fps in (40000.0, 69040.0, 101000.0):
        reasons = health_verdict(tunnel_rtt=0.04, chunk_rtt=0.3, fps=fps,
                                 ms_per_frame=1000.0 / fps, est_ms=0.02,
                                 comp_ms=0.02)
        assert any("non-physical" in r for r in reasons), fps
    # just under the ceiling: accepted
    reasons = health_verdict(tunnel_rtt=0.04, chunk_rtt=0.3, fps=30000.0,
                             ms_per_frame=0.033, est_ms=0.02, comp_ms=0.02)
    assert reasons == []


def test_fused_slower_than_stages_flagged():
    """Plausible fps but fused >> stage sum: quantized completions."""
    reasons = health_verdict(tunnel_rtt=0.04, chunk_rtt=0.5, fps=200.0,
                             ms_per_frame=5.0, est_ms=0.5, comp_ms=0.5)
    assert any("stage sum" in r for r in reasons)


def test_last_healthy_sidecar_round_trip(tmp_path):
    """Refusal records attach the last healthy capture with its age."""
    import json
    import time
    from bench import load_last_healthy
    path = str(tmp_path / "last_healthy.json")
    assert load_last_healthy(path) is None
    with open(path, "w") as file:
        json.dump({"value": 69040.0, "healthy": True,
                   "timestamp": time.time() - 7200.0}, file)
    record = load_last_healthy(path)
    assert record["value"] == 69040.0
    assert 1.9 <= record["age_hours"] <= 2.1
    with open(path, "w") as file:
        file.write("{corrupt")
    assert load_last_healthy(path) is None


@pytest.mark.slow  # spawns real subprocesses under multi-second deadlines
def test_total_deadline_emits_record_before_external_kill(tmp_path):
    """The absolute cap must print a parseable refusal record even while
    per-phase rearms keep the no-progress timer from firing (the quantized
    regime 'progresses' through every phase — an outer kill must never
    find empty stdout)."""
    import json
    import subprocess
    code = (
        "import os, time\n"
        "os.environ['TRANSFLOW_BENCH_TOTAL_DEADLINE'] = '0.3'\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from bench import _Watchdog\n"
        "w = _Watchdog()\n"
        "for i in range(100):\n"
        "    w.rearm(f'phase{i}')\n"  # constant progress: per-phase never fires
        "    time.sleep(0.05)\n"
        "print('UNREACHABLE')\n" % os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120).stdout.strip().splitlines()
    assert out, "no record emitted"
    record = json.loads(out[-1])
    assert record["healthy"] is False
    assert "total bench budget" in record["error"]
    assert out[-1] != "UNREACHABLE"


@pytest.mark.slow  # spawns real subprocesses under multi-second deadlines
def test_sentinel_fires_when_gil_starved(tmp_path):
    """The Timer-thread watchdog needs the GIL; a hung tunnel RPC holding
    it inside a C call starves the timers forever (observed: a degraded
    --e2e attempt ran 75 min past both deadlines and died to its outer
    `timeout` with EMPTY stdout). The sentinel PROCESS must print the
    record and kill the bench anyway. Catastrophic regex backtracking
    stands in for the hung RPC — _sre holds the GIL for the whole match,
    so no Python thread (including the timers) can run."""
    import json
    import subprocess
    code = (
        "import os\n"
        "os.environ['TRANSFLOW_BENCH_DEADLINE'] = '1'\n"
        "os.environ['TRANSFLOW_BENCH_SENTINEL_GRACE'] = '1'\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from bench import _Watchdog\n"
        "w = _Watchdog()\n"
        "w.rearm('hung-rpc')\n"
        "import re\n"
        "re.match(r'(a+)+$', 'a' * 48 + 'b')\n"  # holds the GIL ~forever
        "print('UNREACHABLE')\n" % os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=120)
    out = proc.stdout.strip().splitlines()
    assert out, "sentinel emitted no record"
    record = json.loads(out[-1])
    assert record["healthy"] is False
    assert "watchdog never ran" in record["error"]
    assert "hung-rpc" in record["error"]
    assert out[-1] != "UNREACHABLE"
    assert proc.returncode != 0  # SIGKILLed by the sentinel


def test_liteflownet_stage_smoke(monkeypatch):
    """The healthy-record LFN stage must produce finite numbers (tiny
    shapes on CPU; the real run uses 1088p on device)."""
    import numpy as np
    monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_RANDOM", "1")
    from bench import _bench_liteflownet
    out = _bench_liteflownet(n_chain=2, height=64, width=96)
    assert set(out) == {"liteflownet_1088p_ms_per_frame",
                        "liteflownet_1088p_fps"}
    assert out["liteflownet_1088p_ms_per_frame"] > 0
    assert np.isfinite(out["liteflownet_1088p_fps"])


@pytest.mark.slow  # spawns real subprocesses under multi-second deadlines
def test_pending_record_survives_deadline(tmp_path):
    """Once a measurement is stashed as pending, a later deadline must
    print THAT record (plus extras_truncated) — never a refusal that
    discards completed work."""
    import json
    import subprocess
    code = (
        "import os, time\n"
        "os.environ['TRANSFLOW_BENCH_TOTAL_DEADLINE'] = '0.3'\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from bench import _Watchdog\n"
        "w = _Watchdog()\n"
        "w.pending_record = {'healthy': True, 'value': 123.0}\n"
        "w.rearm('stage-liteflownet')\n"
        "time.sleep(5)\n"
        "print('UNREACHABLE')\n" % os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120).stdout.strip().splitlines()
    assert out and out[-1] != "UNREACHABLE"
    record = json.loads(out[-1])
    assert record["healthy"] is True
    assert record["value"] == 123.0
    assert "stage-liteflownet" in record["extras_truncated"]


def _healthy_tpu_result():
    return {"healthy": True, "fps": 6000.0, "ms_per_frame": 0.167,
            "best_fps": 6200.0, "noise_iqr_pct": 2.0, "tunnel_rtt_s": 0.01,
            "chunk_gate_s": 0.5, "stage_ms": {"estimate": 0.1},
            "hbm_io_gbps": 49.8, "hbm_min_traffic_gbps": 248.9,
            "physical_ceiling_fps": 19748.0, "carry_state_mb": 60.1,
            "unhealthy_reasons": []}


def _sick_tpu_result():
    return {**_healthy_tpu_result(), "healthy": False, "fps": 1.73,
            "unhealthy_reasons": ["quantized cycle"]}


def test_main_success_runs_extras_after_flagship(monkeypatch, tmp_path,
                                                 capsys):
    """Flagship record first, then the optional stages (LFN figure, e2e)
    merge into it; one JSON line with everything; the sidecar persists
    the final record."""
    import json
    import bench as bench_mod
    order = []
    monkeypatch.setattr(bench_mod, "_repo_dir", lambda: str(tmp_path))
    monkeypatch.setattr(bench_mod, "bench_cpu_reference", lambda: 1.0)
    monkeypatch.setattr(
        bench_mod, "bench_tpu",
        lambda watchdog=None: order.append("tpu") or _healthy_tpu_result())
    monkeypatch.setattr(
        bench_mod, "_bench_liteflownet",
        lambda: order.append("lfn") or {"liteflownet_1088p_fps": 7.0})
    monkeypatch.setattr(
        bench_mod, "bench_e2e_cli",
        lambda: order.append("e2e") or {"e2e_fps_still": 5.0})
    monkeypatch.setattr(
        bench_mod, "bench_slope",
        lambda watchdog=None, budget_s=0, **kw: order.append("cross") or {
            "verdict": "device-throughput", "value": 5500.0,
            "intercept_s": 0.03, "r2": 0.999, "n_points": 9, "samples": []})
    monkeypatch.setattr(sys, "argv", ["bench.py", "--e2e"])
    monkeypatch.delenv("TRANSFLOW_BENCH_LITEFLOWNET", raising=False)
    monkeypatch.delenv("TRANSFLOW_BENCH_CROSSCHECK", raising=False)
    bench_mod.main()
    # the second "cross" is the fastest-preset slope stage (same stubbed
    # bench_slope, called with estimator_kwargs)
    assert order == ["tpu", "cross", "lfn", "cross", "e2e"]
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["healthy"] is True
    # slope agrees within 2x: the standard figure stands, evidence attached
    assert record["value"] == 6000.0
    assert record["vs_baseline"] == 6000.0
    assert record["slope_crosscheck"]["value"] == 5500.0
    assert record["liteflownet_1088p_fps"] == 7.0
    assert record["e2e_fps_still"] == 5.0
    sidecar = json.load(open(tmp_path / ".bench_last_healthy.json"))
    assert sidecar["e2e_fps_still"] == 5.0 and "timestamp" in sidecar


def test_main_refusal_skips_extras(monkeypatch, tmp_path, capsys):
    """An unhealthy verdict refuses with value 0, never runs the optional
    stages (they would measure the sick tunnel), says why e2e was
    skipped, and carries the slope probe's evidence (here:
    poll-serialized — dispatches themselves ride the cycle, so the
    refusal stands)."""
    import json
    import bench as bench_mod
    monkeypatch.setattr(bench_mod, "_repo_dir", lambda: str(tmp_path))
    monkeypatch.setattr(bench_mod, "bench_cpu_reference", lambda: 1.0)
    monkeypatch.setattr(bench_mod, "bench_tpu",
                        lambda watchdog=None: _sick_tpu_result())
    monkeypatch.setattr(
        bench_mod, "bench_slope",
        lambda watchdog=None, budget_s=0, **kw: {
            "verdict": "poll-serialized", "value": 5.3,
            "slope_s_per_chunk": 3.0, "intercept_s": 0.5, "r2": 0.999,
            "n_points": 8, "samples": []})

    def boom():
        raise AssertionError("optional stage ran in a sick regime")
    monkeypatch.setattr(bench_mod, "_bench_liteflownet", boom)
    monkeypatch.setattr(bench_mod, "bench_e2e_cli", boom)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--e2e"])
    monkeypatch.setenv("TRANSFLOW_BENCH_RETRY", "0")
    bench_mod.main()
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["healthy"] is False
    assert record["value"] == 0
    assert "quantized cycle" in record["error"]
    assert record["slope_probe"]["verdict"] == "poll-serialized"
    assert "e2e_skipped" in record
    assert record["last_healthy_record"] is None
    assert not (tmp_path / ".bench_last_healthy.json").exists()


def test_main_slope_rescues_readback_only_regime(monkeypatch, tmp_path,
                                                 capsys):
    """When the standard gate refuses but the slope regression proves the
    damage is readback-only, main() emits a HEALTHY record with the slope
    figure, a self-describing method field, and the standard refusal
    reasons — and still skips the extras (their chained timings would
    ride the sick readbacks)."""
    import json
    import bench as bench_mod
    monkeypatch.setattr(bench_mod, "_repo_dir", lambda: str(tmp_path))
    monkeypatch.setattr(bench_mod, "bench_cpu_reference", lambda: 1.0)
    monkeypatch.setattr(bench_mod, "bench_tpu",
                        lambda watchdog=None: _sick_tpu_result())
    monkeypatch.setattr(
        bench_mod, "bench_slope",
        lambda watchdog=None, budget_s=0, **kw: {
            "verdict": "device-throughput", "value": 29500.0,
            "slope_s_per_chunk": 0.000542, "intercept_s": 3.1,
            "r2": 0.998, "n_points": 12, "samples": [[4, 3.1], [8, 3.1]]})

    def boom():
        raise AssertionError("optional stage ran in a sick regime")
    monkeypatch.setattr(bench_mod, "_bench_liteflownet", boom)
    monkeypatch.setattr(bench_mod, "bench_e2e_cli", boom)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--e2e"])
    monkeypatch.setenv("TRANSFLOW_BENCH_RETRY", "0")
    bench_mod.main()
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["healthy"] is True
    assert record["value"] == 29500.0
    assert record["vs_baseline"] == 29500.0
    assert "slope-regression" in record["method"]
    assert "quantized cycle" in record["standard_method_refused"]
    assert record["readback_quantum_s"] == 3.1
    assert "extras_skipped" in record
    # a slope capture is a genuine healthy record: the sidecar persists it
    sidecar = json.load(open(tmp_path / ".bench_last_healthy.json"))
    assert sidecar["value"] == 29500.0


def test_main_slope_disabled_by_env(monkeypatch, tmp_path, capsys):
    """TRANSFLOW_BENCH_SLOPE=0 skips the fallback entirely (fast-fail
    capture-loop attempts must be able to opt out)."""
    import json
    import bench as bench_mod
    monkeypatch.setattr(bench_mod, "_repo_dir", lambda: str(tmp_path))
    monkeypatch.setattr(bench_mod, "bench_cpu_reference", lambda: 1.0)
    monkeypatch.setattr(bench_mod, "bench_tpu",
                        lambda watchdog=None: _sick_tpu_result())

    def boom(*a, **k):
        raise AssertionError("slope ran despite TRANSFLOW_BENCH_SLOPE=0")
    monkeypatch.setattr(bench_mod, "bench_slope", boom)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("TRANSFLOW_BENCH_RETRY", "0")
    monkeypatch.setenv("TRANSFLOW_BENCH_SLOPE", "0")
    bench_mod.main()
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["healthy"] is False and "slope_probe" not in record


def test_slope_fit_verdicts():
    """The pure regression core classifies the three regimes from their
    timing signatures (synthetic, no device). ``ns`` are frames per
    single-dispatch program; the per-dispatch quantum is the intercept."""
    import bench as bench_mod
    ns = [2048, 8192, 32768, 131072] * 3
    # constant per-dispatch quantum + ~8k fps device: rescued
    fit = bench_mod.slope_fit(ns, [3.0 + n / 8000.0 for n in ns])
    assert fit["verdict"] == "device-throughput"
    assert abs(fit["value"] - 8000.0) < 1.0
    assert abs(fit["intercept_s"] - 3.0) < 0.01
    # marginal per-frame cost itself is huge: nothing to rescue
    fit = bench_mod.slope_fit(ns, [0.5 + n * 0.01 for n in ns])
    assert fit["verdict"] == "poll-serialized"
    # wandering quantum / cycle stair-steps: bad fit -> no number
    rng = __import__("numpy").random.default_rng(0)
    noisy = [3.0 + n / 8000.0 + float(rng.uniform(0, 80)) for n in ns]
    assert bench_mod.slope_fit(ns, noisy)["verdict"] == "unmeasurable"
    # non-physical slope (implied fps over the round-4 physical ceiling:
    # the mapping-pair round trip + frame IO alone would exceed the v5e's
    # HBM bandwidth): the whole ladder landed inside one poll cycle — and
    # the pre-round-4 28k-101k artifact range is likewise rejected
    fit = bench_mod.slope_fit(ns, [3.0 + n * 1e-9 for n in ns])
    assert fit["verdict"] == "unmeasurable"
    fit = bench_mod.slope_fit(ns, [3.0 + n / 69000.0 for n in ns])
    assert fit["verdict"] == "unmeasurable"
    # too few points
    assert bench_mod.slope_fit([4, 4], [1.0, 1.0])["verdict"] == \
        "unmeasurable"


def test_slope_fit_gather_bound_verdict():
    """Round-5: a tight low slope taken in a COMPUTE-HEALTHY window (a
    probe_mxu_sol score >= MXU_HEALTH_TFLOPS from the same window) is
    genuine gather-bound device throughput — the round-5 probes
    reconstruct the 342 ms/frame default-config slope from measured
    per-op gather costs (bench GATHER_WALL_EVIDENCE). Without the probe
    the conservative poll-serialized presumption stands."""
    import bench as bench_mod
    ns = [16, 32, 64] * 3
    ts = [0.03 + n * 0.342 for n in ns]  # the measured r5 signature
    assert bench_mod.slope_fit(ns, ts)["verdict"] == "poll-serialized"
    fit = bench_mod.slope_fit(ns, ts, mxu_sol_tflops=153.0)
    assert fit["verdict"] == "device-throughput"
    assert abs(fit["value"] - 2.9) < 0.11
    assert "gather-bound" in fit["gather_bound"]
    assert fit["mxu_sol_tflops"] == 153.0
    # sub-floor slope stays refused even with the probe
    assert bench_mod.slope_fit(
        ns, [0.03 + n * 3.0 for n in ns],
        mxu_sol_tflops=153.0)["verdict"] == "poll-serialized"
    # a weak probe score rescues nothing
    assert bench_mod.slope_fit(
        ns, ts, mxu_sol_tflops=1.4)["verdict"] == "poll-serialized"
    # fast windows need no probe: unchanged path
    fast = bench_mod.slope_fit(ns, [0.03 + n / 8000.0 for n in ns],
                               mxu_sol_tflops=153.0)
    assert fast["verdict"] == "device-throughput"
    assert "gather_bound" not in fast


def test_main_gather_bound_window_slope_is_healthy(monkeypatch, tmp_path,
                                                   capsys):
    """A compute-healthy gate refusal (mxu_sol_tflops on the bench_tpu
    result) must SKIP the transient-sickness retry, route to the slope
    fallback with the probe score, and print a HEALTHY record at the
    gather-bound figure — the round-5 capture path."""
    import json
    import bench as bench_mod
    calls = {"tpu": 0, "slope": []}

    def fake_tpu(watchdog=None):
        calls["tpu"] += 1
        return {**_sick_tpu_result(), "fps": 0.0, "mxu_sol_tflops": 153.2,
                "unhealthy_reasons": [
                    "one 16-frame chunk took 5.5s to read back — standard "
                    "chained sampling skipped (window is compute-healthy "
                    "at 153 TFLOPs...)"]}

    def fake_slope(watchdog=None, budget_s=0, **kw):
        calls["slope"].append(kw.get("mxu_sol_tflops"))
        return {"verdict": "device-throughput", "value": 2.9,
                "gather_bound": "marginal cost 342 ms/frame is genuine "
                                "gather-bound device time",
                "mxu_sol_tflops": 153.2,
                "slope_ms_per_frame": 341.9, "intercept_s": 0.03,
                "r2": 1.0, "n_points": 9, "samples": [[16, 5.5]]}

    monkeypatch.setattr(bench_mod, "_repo_dir", lambda: str(tmp_path))
    monkeypatch.setattr(bench_mod, "bench_cpu_reference", lambda: 0.738)
    monkeypatch.setattr(bench_mod, "bench_tpu", fake_tpu)
    monkeypatch.setattr(bench_mod, "bench_slope", fake_slope)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("TRANSFLOW_BENCH_RETRY", "1")
    bench_mod.main()
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls["tpu"] == 1, "retry must be skipped: slowness is genuine"
    assert calls["slope"] == [153.2]
    assert record["healthy"] is True
    assert record["value"] == 2.9
    assert record["mxu_sol_tflops"] == 153.2
    assert "gather-bound" in record["gather_bound"]
    assert "gather_wall" in record["gather_wall_evidence"]
    # sidecar written so future refusals attach this capture
    side = bench_mod.load_last_healthy(
        os.path.join(str(tmp_path), ".bench_last_healthy.json"))
    assert side["value"] == 2.9


@pytest.mark.slow  # drives bench main() end-to-end (~80 s on this box)
def test_main_extras_failure_degrades_not_refuses(monkeypatch, tmp_path,
                                                  capsys):
    """A crash in an optional stage lands as an *_error field on the
    intact flagship record, never as a refusal."""
    import json
    import bench as bench_mod
    monkeypatch.setattr(bench_mod, "_repo_dir", lambda: str(tmp_path))
    monkeypatch.setattr(bench_mod, "bench_cpu_reference", lambda: 1.0)
    monkeypatch.setattr(bench_mod, "bench_tpu",
                        lambda watchdog=None: _healthy_tpu_result())

    def boom():
        raise RuntimeError("fresh sick window")
    monkeypatch.setattr(bench_mod, "_bench_liteflownet", boom)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.delenv("TRANSFLOW_BENCH_LITEFLOWNET", raising=False)
    monkeypatch.setenv("TRANSFLOW_BENCH_CROSSCHECK", "0")
    bench_mod.main()
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["healthy"] is True and record["value"] == 6000.0
    assert "fresh sick window" in record["liteflownet_error"]


def test_main_crosscheck_overrides_defeated_barrier(monkeypatch, tmp_path,
                                                    capsys):
    """Round-4: a 'healthy' chained-readback figure that disagrees >2x
    with the checksum-barriered slope figure is an artifact — the record
    stays healthy but carries the slope value, with the standard figure
    preserved as evidence."""
    import json
    import bench as bench_mod
    monkeypatch.setattr(bench_mod, "_repo_dir", lambda: str(tmp_path))
    monkeypatch.setattr(bench_mod, "bench_cpu_reference", lambda: 1.0)
    tpu = _healthy_tpu_result()
    tpu["fps"] = 19000.0  # under the ceiling, so the verdict passes...
    monkeypatch.setattr(bench_mod, "bench_tpu", lambda watchdog=None: tpu)
    monkeypatch.setattr(
        bench_mod, "bench_slope",
        lambda watchdog=None, budget_s=0, **kw: {
            "verdict": "device-throughput", "value": 4200.0,
            "intercept_s": 0.03, "r2": 0.999, "n_points": 9,
            "samples": []})  # ...but the strong barrier says 4.5x less
    monkeypatch.setattr(bench_mod, "_bench_liteflownet", lambda: {})
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.delenv("TRANSFLOW_BENCH_CROSSCHECK", raising=False)
    bench_mod.main()
    record = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert record["healthy"] is True
    assert record["value"] == 4200.0
    assert record["chained_readback_fps_artifact"] == 19000.0
    assert "slope-regression (primary)" in record["method"]
    sidecar = json.load(open(tmp_path / ".bench_last_healthy.json"))
    assert sidecar["value"] == 4200.0


def test_bench_slope_smoke(monkeypatch):
    """bench_slope runs end-to-end on tiny CPU shapes: fixed ladder, one
    program per length, a fit dict with the metric fields."""
    import bench as bench_mod
    monkeypatch.setattr(bench_mod, "HEIGHT", 24)
    monkeypatch.setattr(bench_mod, "WIDTH", 32)
    out = bench_mod.bench_slope(budget_s=120.0, lengths=(4, 8, 16),
                                passes=2)
    assert out["metric"] == "1080p_slope_fps_flow_warp_composite"
    assert out["verdict"] in ("device-throughput", "poll-serialized",
                              "unmeasurable")
    assert out["n_points"] >= 4
    assert all(n in (4, 8, 16) for n, _ in out["samples"])


def test_watchdog_remaining_budget():
    import bench as bench_mod
    w = bench_mod._Watchdog()
    try:
        assert 0 < w.remaining_s() <= w.total_deadline
    finally:
        w.cancel()


def test_phase_budgets_compose_under_total():
    """Every phase budget must clamp so the record-printing reserve
    survives it — the property whose absence killed BENCH_r04 (fixed
    constants summed past the driver's window)."""
    import bench as bench_mod

    class _FakeDog:
        def __init__(self, remaining):
            self._r = remaining

        def remaining_s(self):
            return self._r

    # plenty of time: the constant wins
    assert bench_mod._phase_budget(_FakeDog(1400.0), 240.0, 420.0) == 240.0
    # tight: the clamp leaves exactly the reserve
    assert bench_mod._phase_budget(_FakeDog(500.0), 240.0, 420.0) == 80.0
    # exhausted: non-positive => caller skips or floors the phase
    assert bench_mod._phase_budget(_FakeDog(100.0), 240.0, 420.0) < 0
    # no watchdog (direct bench_tpu() calls): constant passthrough
    assert bench_mod._phase_budget(None, 240.0, 420.0) == 240.0


@pytest.mark.slow  # spawns real subprocesses under multi-second deadlines
def test_full_bench_script_prints_record_under_external_kill(tmp_path):
    """VERDICT r4 #1(d): launch the REAL bench.py with a stubbed hung
    backend — a GIL-held hang before any phase completes, the exact
    round-4 failure shape (rc=124, empty stdout) — under an external
    `timeout`, and assert a parseable JSON record lands on stdout before
    the kill."""
    import json
    import subprocess
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "TRANSFLOW_BENCH_SELFTEST_HANG": "1",
        "TRANSFLOW_BENCH_TOTAL_DEADLINE": "25",
        "TRANSFLOW_BENCH_DEADLINE": "8",
        "TRANSFLOW_BENCH_SENTINEL_GRACE": "2",
    })
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        ["timeout", "90", sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120,
        env=env)
    assert proc.returncode != 124, "external timeout beat the record"
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert lines, f"empty stdout (stderr tail: {proc.stderr[-500:]})"
    record = json.loads(lines[-1])
    assert record["metric"] == "1080p_e2e_fps_flow_warp_composite"
    assert record["healthy"] is False
    assert "watchdog never ran" in record["error"]
