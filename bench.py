"""Benchmark: end-to-end 1080p frames/sec (flow estimation + warp + composite)
on one TPU chip, vs the reference's CPU pipeline (OpenCV Farneback + numpy
compositor) on this host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
BASELINE.md target: >= 500 fps at 1080p, >= 50x the CPU reference.

Methodology: one timed sample = CHUNKS_PER_SAMPLE chained 16-frame lax.scan
dispatches with DISTINCT gray chunks, timestamps and RNG keys (no dispatch
can be memoized), completed by a VALUE READBACK of the final output — the
state chain serializes every dispatch on-device, and a host-visible value
cannot exist before the device finished computing it (block_until_ready
alone has been observed returning at enqueue time in tunneled
environments). The single host<->device round trip (hundreds of us through
this environment's tunnel, the dominant noise source) amortizes over ~5 ms
of device work per sample. Early samples after compile
run below steady state (cold caches, allocator, tunnel), so we WARM UP
until two consecutive samples agree within 10% (capped), then take the
median of REPEATS samples. The figure is physically auditable BOTH ways
(round-4 correction, docs/PERF.md): per-frame HBM traffic is at least
MIN_BYTES_PER_FRAME (the mapping-pair round trip + frame IO — the 60 MB
carry does NOT stay VMEM-resident; the compile reports 1.53 GB of temps
per chunk), so a healthy reading must land between the measured-wall
physical floor (GENUINE_FLOOR_FPS — the round-5 gather-wall probes put
genuine gather-bound readings as low as ~3 fps at defaults) and
CEILING_FPS (~32.9k); anything outside is refused as an infrastructure
artifact, and low-but-tight slope readings are accepted only alongside
a compute-healthy probe_mxu_sol score from the same window. A healthy standard reading is additionally
cross-checked against the slope methodology (program-length regression
with an on-device checksum accumulator — immune to readback
short-circuits); on disagreement the slope figure wins. Alongside fps the
JSON carries ms/frame and a per-stage breakdown (estimator / compositor
timed as standalone per-frame programs).
"""
import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the 1080p program is large and this
# environment compiles through a remote service — cache across runs.
# Must go through jax.config (sitecustomize imports jax at interpreter
# startup, so env vars set here are too late).
import transflow_tpu


def _repo_dir() -> str:
    """Directory bench artifacts (sidecars, cache) live in — module-level
    so tests can monkeypatch it and keep fake records out of the real
    repo sidecar."""
    return os.path.dirname(os.path.abspath(__file__))


transflow_tpu.enable_compile_cache(os.path.join(_repo_dir(), ".jax_cache"))

HEIGHT, WIDTH = 1080, 1920

# --- physical ceiling (round-4 correction, docs/PERF.md) -------------------
# The device is one TPU v5e ("TPU v5 lite", probed) : ~819 GB/s HBM. The
# XLA compile of the 16-frame chunk reports 1.53 GB of temp buffers
# (tools/hbm_traffic_audit.py), so nothing about this program is
# VMEM-resident across scan iterations — the carry round-trips HBM every
# frame. MIN_BYTES_PER_FRAME is a deliberate UNDER-estimate of that
# traffic (so CEILING_FPS over-estimates the ceiling and never refuses a
# genuine reading): the (H,W) mapping pair alone is read and
# rewritten every frame by the movement permutation, one gray frame is
# read, one rgb frame is written. Alpha, warm-start flow, the rest of the
# 60 MB carry, and the estimator temps only ADD traffic. Any fps reading
# implying more than HBM_GBPS through this floor is non-physical — the
# completion barrier was defeated, not the hardware transcended — and is
# refused the same way quantized-regime readings are.
HBM_GBPS = 819.0  # TPU v5e
# mapping pair is int16 since the round-4 state compaction
# (compositor/core.py POS_DTYPE): 2 arrays x 2 bytes, read+written
MIN_BYTES_PER_FRAME = 2 * (2 * 2 * HEIGHT * WIDTH) + 4 * HEIGHT * WIDTH
CEILING_FPS = HBM_GBPS * 1e9 / MIN_BYTES_PER_FRAME  # ~32.9k fps

CHUNK = 16             # frames per device dispatch (lax.scan)

# --- measured gather wall (round-5 healthy-window probes, 2026-08-20) ------
# tools/gather_wall_probe.py at 1080p in a window where chained bf16
# matmuls simultaneously sustained ~153 TFLOPs (probe_mxu_sol): XLA's TPU
# gather lowering moves ~0.6-1.8 GB/s EFFECTIVE through random per-pixel
# gathers (movement_packed 12.9 ms / 14.5 MB, fb_warp_bf16 45.5 ms /
# 82.9 MB — bench_attempts/round5/gather_wall_1080p_healthy_1044.json).
# Those per-op costs reconstruct the flagship's measured 342 ms/frame
# slope exactly, so a LOW flagship reading in a compute-healthy window is
# the genuine device speed of a gather-bound program — not tunnel damage.
# The discriminator between "infrastructure-quantized" and "genuinely
# gather-bound" is probe_mxu_sol: a chained-matmul dispatch with known
# FLOPs and a data-dependent scalar readback. A quantized window cannot
# fake >= MXU_HEALTH_TFLOPS (faking 20 TFLOPs through a 550 GFLOP probe
# needs a < 28 ms completion — which IS a healthy window).
MXU_HEALTH_TFLOPS = 20.0
# a compute-healthy window still refuses sub-1-fps flagship readings:
# even at the measured 0.6 GB/s worst-case wall, the ~0.5 GB/frame
# default gather traffic completes in well under a second
GENUINE_FLOOR_FPS = 1.0
GATHER_WALL_EVIDENCE = (
    "bench_attempts/round5/gather_wall_1080p_healthy_1044.json — XLA TPU "
    "gather wall measured 0.6-1.8 GB/s effective in a 153-TFLOPs-verified "
    "window; per-op costs reconstruct the 342 ms/frame flagship slope")


def probe_mxu_sol(n_chain: int = 32, dim: int = 2048) -> float:
    """Sustained bf16 matmul TFLOPs: ONE dispatch of ``n_chain`` chained
    ``dim x dim`` matmuls (each step's scalar perturbs the next operand, so
    nothing can be CSE'd or memoized), completed by a VALUE readback of the
    data-dependent carry. Known FLOPs / measured wall = TFLOPs.

    This is the compute-health discriminator (see MXU_HEALTH_TFLOPS): the
    program is too small to be quantized into a passing score, and a
    passing score proves the device executes at speed AND completions
    reach the host promptly — so any slow flagship reading taken in the
    same window is genuine device time, not infrastructure."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((dim, dim)), jnp.bfloat16)

    def step(s, _):
        m = (a + s.astype(jnp.bfloat16)) @ a
        return jnp.float32(m[0, 0]) * jnp.float32(1e-6), None

    @jax.jit
    def run(s0):
        s, _ = jax.lax.scan(step, s0, None, length=n_chain)
        return s

    best = float("inf")
    for i in range(3):
        start = time.perf_counter()
        float(np.asarray(run(jnp.float32(i) * jnp.float32(1e-3))))
        if i:  # first run pays compile
            best = min(best, time.perf_counter() - start)
    return 2.0 * dim ** 3 * n_chain / best / 1e12

#: attached to every refusal record (incl. watchdog/sentinel emergency
#: exits): a refusal is the driver's only artifact in a sick round — it
#: must point at the evidence that does exist
IN_REGIME_EVIDENCE = (
    "bench_attempts/round4/NOTES.md — the sick regime executes genuinely "
    "(ratios carry): byte-packed movement gather 7.9x over split; bf16 "
    "warp taps 1.5x over f32; slope quantum tracked the binary 579 -> "
    "526 -> 342 ms/frame (r2=1.0) across the round-4 reformulations; LFN "
    "per-module profile at 544x960 "
    "(lfn_profile_544x960_inregime_1607.json)")
FAST_PRESET_AB_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_attempts",
    "preset_slope_ab_latest.json")


def load_preset_ab(path=None):
    """Summary of the latest tools/preset_slope_ab.py run (or None).

    Attached to every record: the fb_downscale presets' in-regime slope
    ratios are regime-independent evidence of their per-frame work
    reduction (ratios carry in the sick regime — BASELINE.md), so they
    belong in BENCH_r{N}.json whatever the regime does at driver time."""
    try:
        with open(path or FAST_PRESET_AB_PATH, encoding="utf8") as file:
            data = json.load(file)
        cases = data.get("cases", {})
        out = {"ts": data.get("ts"),
               "note": ("fb_downscale preset slope A/B (1080p, r2 and "
                        "samples in bench_attempts/): ratios measure "
                        "real per-frame work; see docs/PERF.md presets "
                        "table")}
        for name, res in cases.items():
            out[f"{name}_slope_ms_per_frame"] = res.get(
                "slope_ms_per_frame")
            if "speedup_vs_default" in res:
                out[f"{name}_speedup_vs_default"] = res[
                    "speedup_vs_default"]
        return out
    except (OSError, ValueError, KeyError):
        return None


CHUNKS_PER_SAMPLE = 32  # chained dispatches per timed sample (~5 ms device)
GRAY_SETS = 4          # distinct input chunks rotated across dispatches
REPEATS = 15           # median-of-N steady-state samples
WARMUP_TOL = 0.10      # two consecutive warmup samples within 10% => steady
WARMUP_MAX = 20        # cap warmup rounds
CPU_FRAMES = 3         # enough to anchor the baseline; CPU is ~seconds/frame


def make_frames(n, seed=0):
    """Synthetic moving-texture frames (realistic flow workload)."""
    rng = np.random.default_rng(seed)
    import scipy.ndimage
    base = scipy.ndimage.gaussian_filter(
        rng.integers(0, 256, (HEIGHT + 64, WIDTH + 64)).astype(np.float32), 2)
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    frames = []
    for t in range(n):
        dx, dy = int(3 * np.sin(0.3 * t) + 3), int(2 * np.cos(0.4 * t) + 2)
        frames.append(base[32 + dy:32 + dy + HEIGHT,
                           32 + dx:32 + dx + WIDTH])
    return np.stack(frames)


def _steady_state(region, repeats=REPEATS, stats=False, budget_s=150.0):
    """Warm up `region` (a 0-arg callable returning elapsed seconds) until
    two consecutive timings agree within WARMUP_TOL, then sample `repeats`
    times. Returns the median; with stats=True returns (median, best,
    iqr_pct) so the output self-describes its measurement noise — the
    host<->device tunnel in this environment wanders by design.

    ``budget_s`` soft-caps the wall time: in degraded tunnel regimes a
    single sample can take seconds; the driver still gets a (noisier)
    number instead of a hang."""
    deadline = time.monotonic() + budget_s
    prev = region()
    for _ in range(WARMUP_MAX):
        if time.monotonic() > deadline:
            break
        cur = region()
        if abs(cur - prev) / min(cur, prev) <= WARMUP_TOL:
            break
        prev = cur
    collected = []
    while len(collected) < repeats:
        # one sample is enough when the tunnel is so degraded that a single
        # sample blows the budget — an honest slow number beats a hang
        if collected and time.monotonic() > deadline:
            break
        collected.append(region())
    samples = np.sort(collected)
    median = float(np.median(samples))
    if not stats:
        return median
    iqr = float(np.percentile(samples, 75) - np.percentile(samples, 25))
    return median, float(samples[0]), 100.0 * iqr / median


def _phase_budget(watchdog, default_s: float, reserve_s: float) -> float:
    """Budget for the next phase: the phase constant, clamped so at least
    ``reserve_s`` of the total deadline remains when it ends. This is what
    makes the phase chain PROVABLY sum under the total budget (round-4
    postmortem: fixed constants — 1200 s wait + 600 s gate + retry +
    slope — composed to more than the driver allowed, and the one record
    the driver keeps per round was rc=124 with empty stdout). A budget
    that clamps to <= 10 s means the phase should be skipped."""
    if watchdog is None:
        return default_s
    return min(default_s, watchdog.remaining_s() - reserve_s)


def _wait_for_healthy_tunnel(max_wait_s: float | None = None,
                             watchdog=None) -> float:
    """The device tunnel oscillates between ~0.2 ms and ~2 min per round
    trip (observed). Pay the per-process handshake, then poll a tiny
    readback until the RTT normalizes (or the grace period runs out), so a
    one-shot driver run doesn't immortalize a sick-regime number. Returns
    the last observed RTT in seconds.

    Healthy windows have been observed minutes apart inside hours-long
    sick stretches, so the default grace period is generous (10 min,
    TRANSFLOW_BENCH_TUNNEL_WAIT to override), but always clamped so the
    phases after it still fit under the total deadline. Each COMPLETED
    probe re-arms the watchdog (a slow-but-returning probe is progress);
    a probe that hangs outright stops the re-arms and the no-progress
    timer fires — exactly what it must catch."""
    if max_wait_s is None:
        max_wait_s = float(os.environ.get(
            "TRANSFLOW_BENCH_TUNNEL_WAIT", "600"))
    # reserve: compile+gate+regions+record need ~700 s after the wait
    max_wait_s = max(30.0, min(
        max_wait_s, _phase_budget(watchdog, max_wait_s, 700.0)))
    import jax.numpy as jnp
    deadline = time.monotonic() + max_wait_s
    # first RPC carries the connection-establishment penalty; not an RTT
    float(jnp.sum(jnp.ones((8, 8))))
    rtt = float("inf")
    while True:
        start = time.perf_counter()
        # varying operand: some runtimes memoize identical dispatches
        float(jnp.sum(jnp.ones((128, 128))
                      * np.float32(time.perf_counter() % 997.0)))
        rtt = time.perf_counter() - start
        if watchdog is not None:
            watchdog.rearm("tunnel-wait")
        # healthy tunnel: ~0.04 s; the quantized sick regime idles small
        # probes at ~1.2 s and previously slipped under a 2 s bar
        if rtt < 0.25 or time.monotonic() > deadline:
            return rtt
        time.sleep(min(30.0, max(5.0, rtt)))


def health_verdict(tunnel_rtt, chunk_rtt, fps, ms_per_frame, est_ms,
                   comp_ms) -> list:
    """Regime health: the list of reasons this measurement is the
    infrastructure rather than the framework (empty = healthy record).

    A number taken in a sick tunnel regime must SAY so instead of
    printing a plausible-looking fps (BASELINE.md documents the quantized
    signature). Calibration history: the round-2 quantized regime
    (1.73 fps / 579.0 ms, zero IQR) slipped under a first-cut gate set —
    probe RTT 1.2 s under a 2 s bar, a 9.3 s chunk under a 10 s bar, and
    stage timings riding the same cycle so consistency ratios stayed
    plausible — hence the physical floor below (unit-tested with that
    exact signature)."""
    reasons = []
    if tunnel_rtt >= 0.25:
        # healthy small-probe readbacks measure 0.03-0.04 s through this
        # tunnel (sub-ms on direct-attached chips)
        reasons.append(
            f"small-probe readback RTT {tunnel_rtt:.2f}s (healthy tunnel: "
            "~0.04s) after the full grace period")
    if chunk_rtt >= 2.0:
        # same bar as the measurement gate (bench_tpu's chunk retry loop):
        # a healthy 16-frame chunk reads back well under a second, and the
        # round-2 quantized regime once squeaked a 9.3 s chunk under a
        # looser 10 s bar — the verdict must not be laxer than the gate
        reasons.append(
            f"one {CHUNK}-frame chunk took {chunk_rtt:.1f}s to read back "
            "(healthy: <1s; the ~5-min poll-cycle regime quantizes these) "
            "after the gate's grace period")
    # PHYSICAL FLOOR (round-5 correction): the chunk gate this verdict
    # sits behind already proved a 16-frame chunk completes in < 2 s
    # (>= 8 fps marginal), and the measured gather wall
    # (GATHER_WALL_EVIDENCE) makes genuine readings down to ~3 fps
    # physically possible at the default config — the old 100-fps floor
    # assumed gathers near HBM bandwidth and would refuse genuine
    # gather-bound readings. Below GENUINE_FLOOR_FPS even the measured
    # worst-case wall cannot explain the reading.
    if fps < GENUINE_FLOOR_FPS:
        reasons.append(
            f"{fps:.2f} fps is below the measured-wall physical floor "
            f"({GENUINE_FLOOR_FPS:.0f} fps: even at the probed 0.6 GB/s "
            "gather wall the per-frame traffic completes faster) — "
            "completions are infrastructure-quantized")
    # PHYSICAL CEILING (round-4): the mapping-pair round trip + frame IO
    # alone move MIN_BYTES_PER_FRAME through HBM; a reading implying more
    # than the chip's bandwidth through that under-estimate is
    # non-physical — the completion barrier was defeated, and recording
    # it as healthy would immortalize an artifact (the round 1-2
    # "28k-101k" range failed exactly this check once derived).
    if fps > CEILING_FPS:
        reasons.append(
            f"{fps:.0f} fps implies "
            f"{MIN_BYTES_PER_FRAME * fps / 1e9:.0f} GB/s of HBM traffic "
            f"through an under-estimated floor — over the v5e's "
            f"{HBM_GBPS:.0f} GB/s ceiling (max physical "
            f"{CEILING_FPS:.0f} fps); the completion barrier was "
            "defeated, reading is non-physical")
    # consistency: the fused scan amortizes dispatch and keeps state in
    # VMEM, so fused ms/frame must not exceed the SUM of the stages
    # measured standalone by more than noise
    if ms_per_frame > 2.0 * (est_ms + comp_ms) and ms_per_frame > 1.0:
        reasons.append(
            f"fused {ms_per_frame:.1f} ms/frame exceeds 2x the stage sum "
            f"({est_ms:.1f} + {comp_ms:.1f} ms) — timings are "
            "infrastructure-bound, not compute-bound")
    return reasons


def bench_tpu(watchdog=None) -> dict:
    import jax
    import jax.numpy as jnp
    from transflow_tpu.config import LayerConfig
    from transflow_tpu.flow import Direction
    from transflow_tpu.model import FlowTransferModel

    def progress(phase):
        if watchdog is not None:
            watchdog.rearm(phase)

    tunnel_rtt = (_wait_for_healthy_tunnel(watchdog=watchdog)
                  if jax.default_backend() != "cpu" else 0.0)
    progress("compile")

    model = FlowTransferModel(
        HEIGHT, WIDTH,
        [LayerConfig(0, reset_mode="random", reset_random_factor=0.01)],
        {0: [(3, np.ones((HEIGHT, WIDTH), bool))]},
        method="farneback",
        estimator_kwargs={},  # cv2 defaults: pyr .5, 3 levels, win 15, 3 it
        direction=Direction.BACKWARD)
    frames = make_frames(CHUNK + 1)
    state = model.init_state(frames[0])
    gray_sets = [jax.device_put(jnp.asarray(make_frames(CHUNK, seed=s)))
                 for s in range(GRAY_SETS)]
    pixmaps = model.default_pixmaps()
    keys = jax.random.split(jax.random.key(0), CHUNKS_PER_SAMPLE)

    # HBM traffic per frame (round-4 corrected accounting, docs/PERF.md):
    # the compile reports 1.53 GB of temps per chunk, so NOTHING stays
    # VMEM-resident across scan iterations — the 60 MB carry round-trips
    # HBM every frame. The reported figure uses MIN_BYTES_PER_FRAME (the
    # indisputable under-estimate the ceiling check is built on); real
    # traffic, with the full carry and estimator temps, is several times
    # higher (tools/hbm_traffic_audit.py).
    state_bytes = sum(x.nbytes for x in jax.tree.leaves(state))
    io_bytes_per_frame = HEIGHT * WIDTH + 3 * HEIGHT * WIDTH

    # compile
    state2, rgbs = model.jit_scan(state, gray_sets[0], pixmaps,
                                  jnp.float32(0.0), keys[0])
    jax.block_until_ready(rgbs)
    holder = {"state": state2}

    # realistic-workload gate: the small-probe RTT can look fine while a
    # full chunk's completion still arrives on a ~5-minute poll cycle
    # (observed failure mode). Retry single chunks until one completes
    # quickly or the grace period ends; measurement proceeds either way,
    # but the final chunk RTT feeds the record's healthy verdict.
    progress("chunk-gate")
    # overridable: a supervising capture loop that has ALREADY probed the
    # regime can shorten the gate so refused attempts return to polling
    # fast instead of burning the full grace period per attempt. Clamped
    # so the regions/slope after it still fit under the total deadline.
    gate_deadline = time.monotonic() + max(30.0, _phase_budget(
        watchdog,
        float(os.environ.get("TRANSFLOW_BENCH_CHUNK_GATE", "240")),
        420.0))
    chunk_no = [1000]
    while True:
        start = time.perf_counter()
        st, rg = model.jit_scan(holder["state"], gray_sets[1], pixmaps,
                                jnp.float32(chunk_no[0]), keys[1])
        chunk_no[0] += 1
        # full-tensor checksum barrier: a single-element readback has
        # been defeated by this environment before (round-4 audit); the
        # sum cannot exist until every output byte was computed
        int(np.asarray(jnp.sum(rg.astype(jnp.uint32))))
        holder["state"] = st
        chunk_rtt = time.perf_counter() - start
        # a healthy 16-frame chunk reads back in well under a second; the
        # quantized regime once completed one in 9.3 s and slipped under a
        # 10 s bar — demand < 2 s before measuring
        if chunk_rtt < 2.0 or time.monotonic() > gate_deadline:
            break
        time.sleep(30.0)
    if chunk_rtt >= 2.0:
        # The gate failed: either the regime is sick (quantized/killing
        # completions) or the program is genuinely this slow (the
        # measured gather wall — GATHER_WALL_EVIDENCE — puts the default
        # config at ~342 ms/frame = 5.5 s/chunk in a HEALTHY window).
        # probe_mxu_sol disambiguates: a compute-healthy score means the
        # slope fallback will measure the device, and main() must treat
        # its figure as genuine however low it lands. Running the
        # standard fused samples here would burn the entire total budget
        # the slope fallback needs — return the refusal now; main()
        # routes to bench_slope, whose rungs are short EXEC_CAP-bounded
        # programs built for this regime.
        progress("mxu-sol-probe")
        try:
            mxu_tflops = probe_mxu_sol()
        except Exception:
            mxu_tflops = 0.0
        gate_reason = (
            f"one {CHUNK}-frame chunk took {chunk_rtt:.1f}s to read back "
            "— standard chained sampling skipped ("
            + (f"window is compute-healthy at {mxu_tflops:.0f} TFLOPs: "
               "the chunk cost is genuine gather-bound device time; the "
               "slope methodology takes the measurement"
               if mxu_tflops >= MXU_HEALTH_TFLOPS else
               f"MXU probe {mxu_tflops:.1f} TFLOPs < "
               f"{MXU_HEALTH_TFLOPS:.0f}: completions are "
               "infrastructure-quantized, regime kills long programs")
            + ")")
        return {
            "fps": 0.0, "best_fps": 0.0,
            "tunnel_rtt_s": round(tunnel_rtt, 3),
            "chunk_gate_s": round(chunk_rtt, 3),
            "noise_iqr_pct": 0.0,
            "ms_per_frame": 0.0,
            "stage_ms": {"estimator": 0.0, "compositor_render": 0.0,
                         "fused_total": 0.0,
                         "skipped": "chunk gate refused — slope "
                                    "methodology takes the measurement"},
            "hbm_io_gbps": 0.0,
            "carry_state_mb": round(state_bytes / 1e6, 1),
            "healthy": False,
            "mxu_sol_tflops": round(mxu_tflops, 1),
            "unhealthy_reasons": [gate_reason],
        }
    progress("fused-sample")

    sample_no = [0]

    def sample():
        """CHUNKS_PER_SAMPLE chained dispatches, distinct inputs + keys,
        one VALUE READBACK of the final output at the end. The readback —
        not block_until_ready — is the completion barrier: the state chain
        serializes every dispatch, and a host-visible value cannot exist
        before the device finished computing it (in tunneled environments
        block_until_ready has been observed returning at enqueue time).
        ``t0`` AND the key vary per dispatch GLOBALLY (folded from the
        lifetime dispatch counter, never reused across samples): with
        cycling gray sets and a contracting state update, per-sample key
        reuse could let the dispatch sequence converge to an exact replay
        cycle a memoizing runtime would serve from cache."""
        base = sample_no[0] * CHUNKS_PER_SAMPLE
        sample_no[0] += 1
        start = time.perf_counter()
        current = holder["state"]
        for i in range(CHUNKS_PER_SAMPLE):
            current, rgbs = model.jit_scan(
                current, gray_sets[i % GRAY_SETS], pixmaps,
                jnp.float32(base + i), jax.random.fold_in(keys[0], base + i))
        # checksum of the final chunk's full output (the state chain
        # serializes the 31 before it); see the chunk-gate comment
        int(np.asarray(jnp.sum(rgbs.astype(jnp.uint32))))
        holder["state"] = current
        return time.perf_counter() - start

    frames_per_sample = CHUNK * CHUNKS_PER_SAMPLE

    def region_budget():
        # three timed regions share what remains above the record-printing
        # reserve (240 s); in a healthy window the 150 s cap never binds
        return min(150.0, max(
            45.0, _phase_budget(watchdog, 150.0, 240.0)))

    elapsed, best_elapsed, iqr_pct = _steady_state(
        sample, stats=True, budget_s=region_budget())
    fps = frames_per_sample / elapsed
    best_fps = frames_per_sample / best_elapsed
    ms_per_frame = 1000.0 * elapsed / frames_per_sample
    progress("stage-estimator")

    # --- stage breakdown (per frame, steady-state, separate jits) -------
    gray0 = jnp.asarray(frames[0])
    gray1 = jnp.asarray(frames[1])
    prev_flow = jnp.zeros((HEIGHT, WIDTH, 2), jnp.float32)
    from transflow_tpu.flow.estimators import get_estimator
    est = jax.jit(lambda a, b, pf: get_estimator("farneback")(a, b, pf))
    flow0 = est(gray1, gray0, prev_flow)
    jax.block_until_ready(flow0)

    # the warm-start flow threads ACROSS samples (a holder, like the main
    # sample's state) and the frame pair rotates per dispatch: no region is
    # ever a byte-identical replay of the previous one, which the tunnel
    # would memoize (the artifact the main sample() was redesigned around)
    est_holder = {"pf": prev_flow}
    est_grays = [(jnp.asarray(make_frames(2, seed=10 + s)[0]),
                  jnp.asarray(make_frames(2, seed=10 + s)[1]))
                 for s in range(GRAY_SETS)]

    est_holder["n"] = 0

    def est_region():
        # per-sample epsilon: even if the warm-start converges to a cycle,
        # no two samples ever replay identical dispatches
        est_holder["n"] += 1
        start = time.perf_counter()
        pf = est_holder["pf"] + jnp.float32(est_holder["n"] * 1e-6)
        for i in range(CHUNKS_PER_SAMPLE):
            a, b = est_grays[i % GRAY_SETS]
            pf = est(a, b, pf)           # fed back: distinct + dependent
        float(np.asarray(pf[0, 0, 0]))
        est_holder["pf"] = pf
        return time.perf_counter() - start

    est_ms = 1000.0 * _steady_state(
        est_region, repeats=3,
        budget_s=region_budget()) / CHUNKS_PER_SAMPLE
    progress("stage-compositor")

    frame_numbers = model.default_frame_numbers()

    # pixmaps / layer params / frame numbers travel as ARGUMENTS: baking
    # them as closure constants puts megabytes of literals in the program
    # (the round-1 pathological slow path — see model.py docstrings)
    @jax.jit
    def comp_step(comp, flow, k, pixmaps, frame_numbers, params_list):
        comp = model._comp_step.update(comp, flow, pixmaps, k,
                                       frame_numbers, params_list)
        return model._comp_step.render(comp, params_list)

    def comp_call(comp, k):
        return comp_step(comp, flow0, k, pixmaps, frame_numbers,
                         model.layer_params)

    # fresh state: the original was donated into jit_scan's first dispatch
    comp_fresh = model.init_state(frames[0])["comp"]
    comp0, rgb0 = comp_call(comp_fresh, keys[0])
    jax.block_until_ready(rgb0)

    comp_holder = {"comp": comp0, "n": 0}

    def comp_region():
        # state threads across samples and the key varies per dispatch:
        # no sample is a replayable copy of the previous (memoization)
        base = comp_holder["n"] * CHUNKS_PER_SAMPLE
        comp_holder["n"] += 1
        start = time.perf_counter()
        comp, rgb = comp_holder["comp"], None
        for i in range(CHUNKS_PER_SAMPLE):
            comp, rgb = comp_call(comp, jax.random.fold_in(
                keys[0], base + i))
        int(np.asarray(jnp.sum(rgb.astype(jnp.uint32))))
        comp_holder["comp"] = comp
        return time.perf_counter() - start

    comp_ms = 1000.0 * _steady_state(
        comp_region, repeats=3,
        budget_s=region_budget()) / CHUNKS_PER_SAMPLE

    unhealthy_reasons = health_verdict(tunnel_rtt, chunk_rtt, fps,
                                       ms_per_frame, est_ms, comp_ms)

    return {
        "fps": fps,
        "best_fps": best_fps,
        "tunnel_rtt_s": round(tunnel_rtt, 3),
        "chunk_gate_s": round(chunk_rtt, 3),
        "noise_iqr_pct": round(iqr_pct, 1),
        "ms_per_frame": ms_per_frame,
        "stage_ms": {"estimator": round(est_ms, 4),
                     "compositor_render": round(comp_ms, 4),
                     "fused_total": round(ms_per_frame, 4)},
        "hbm_io_gbps": round(io_bytes_per_frame * fps / 1e9, 1),
        "hbm_min_traffic_gbps": round(MIN_BYTES_PER_FRAME * fps / 1e9, 1),
        "physical_ceiling_fps": round(CEILING_FPS, 0),
        "carry_state_mb": round(state_bytes / 1e6, 1),
        "healthy": not unhealthy_reasons,
        "unhealthy_reasons": unhealthy_reasons,
    }


def slope_fit(ns, ts, mxu_sol_tflops=None) -> dict:
    """Regress elapsed-vs-frames over single-dispatch program samples and
    classify the regime. Pure (testable) core of the slope methodology.

    The poll-cycle tunnel regime (BASELINE.md) adds a large, roughly
    CONSTANT per-dispatch latency to every host-visible completion —
    and has been observed serializing the dispatches themselves, so
    chaining MORE dispatches cannot cancel it. Varying the PROGRAM
    LENGTH can: each sample is ONE dispatch of an n-frame ``lax.scan``
    program, so elapsed(n) = quantum + n * per_frame, and the quantum is
    an INTERCEPT the regression removes. fps = 1 / slope.

    ``ns`` are frame counts per program, ``ts`` elapsed seconds per
    dispatch+readback.

    Verdicts:
    - ``device-throughput``: tight fit, slope in the plausible device
      band — the slope fps IS the device throughput (the per-dispatch
      quantum, however large, cancelled).
    - ``poll-serialized``: the marginal per-frame cost itself is huge —
      either the device is genuinely slow or the regime quantizes
      proportionally to work; either way no healthy number exists.
    - ``unmeasurable``: bad fit (wandering quantum, cycle stair-steps)
      or non-physical slope; no number should be printed.
    """
    ns_arr = np.asarray(ns, np.float64)
    ts_arr = np.asarray(ts, np.float64)
    if len(ns_arr) < 4 or len(set(ns)) < 3:
        return {"verdict": "unmeasurable", "reason": "too few points",
                "n_points": int(len(ns_arr)),
                "samples": [[int(n), round(t, 3)]
                            for n, t in zip(ns, ts)]}
    slope, intercept = np.polyfit(ns_arr, ts_arr, 1)
    pred = slope * ns_arr + intercept
    ss_res = float(np.sum((ts_arr - pred) ** 2))
    ss_tot = float(np.sum((ts_arr - ts_arr.mean()) ** 2))
    r2 = 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0
    fps = 1.0 / slope if slope > 0 else 0.0
    verdict = "unmeasurable"
    gather_bound = None
    if slope > 0 and r2 > 0.98:
        # Physical ceiling: the mapping-pair HBM round trip + frame IO
        # cap genuine throughput at CEILING_FPS (~32.9k on the v5e with
        # the int16-compacted mapping — the ONE authoritative number,
        # derived from MIN_BYTES_PER_FRAME above; the pre-compaction
        # int32 figure was ~19.7k, BASELINE.md keeps the history); a
        # slope implying beyond that is an artifact (e.g. the whole
        # ladder landed inside one poll cycle).
        #
        # Physical FLOOR (round-5 correction): a low marginal cost is
        # only an artifact when the window itself is quantized. When a
        # probe_mxu_sol score taken in the SAME window clears
        # MXU_HEALTH_TFLOPS, completions reach the host promptly and the
        # device demonstrably executes at speed — so a tight low slope
        # is the genuine throughput of a gather-bound program (the
        # measured wall, GATHER_WALL_EVIDENCE, reconstructs the default
        # config's 342 ms/frame from per-op costs). Without that
        # evidence the old conservative rule stands: a regime that
        # cannot sustain 320 fps marginal cost is presumed to be
        # quantizing proportionally to work.
        compute_healthy = (mxu_sol_tflops is not None
                           and mxu_sol_tflops >= MXU_HEALTH_TFLOPS)
        if fps < 320.0:
            if compute_healthy and fps >= GENUINE_FLOOR_FPS:
                verdict = "device-throughput"
                gather_bound = (
                    f"marginal cost {1000.0 * slope:.0f} ms/frame is "
                    "genuine gather-bound device time: MXU probe "
                    f"sustained {mxu_sol_tflops:.0f} TFLOPs in the same "
                    "window (see GATHER_WALL_EVIDENCE)")
            else:
                verdict = "poll-serialized"
        elif fps <= CEILING_FPS:
            verdict = "device-throughput"
    out = {
        "verdict": verdict,
        "value": round(fps, 1),
        "slope_ms_per_frame": round(1000.0 * float(slope), 6),
        "intercept_s": round(float(intercept), 3),
        "r2": round(r2, 4),
        "n_points": int(len(ns_arr)),
        "samples": [[int(n), round(t, 3)] for n, t in zip(ns, ts)],
    }
    if gather_bound is not None:
        out["gather_bound"] = gather_bound
        out["mxu_sol_tflops"] = round(float(mxu_sol_tflops), 1)
    return out


def bench_slope(watchdog=None, budget_s: float = 600.0,
                lengths=None, passes: int = 3,
                estimator_kwargs: dict | None = None,
                mxu_sol_tflops: float | None = None) -> dict:
    """Slope-methodology fallback measurement (see ``slope_fit``).

    Each sample is ONE dispatch of an n-frame program: ``lax.scan`` over
    the full step (estimator -> postprocess -> compositor -> render),
    rotating GRAY_SETS distinct input frames, per-step timestamps and
    folded keys, with every rendered pixel of every frame feeding a
    returned checksum (XLA cannot dead-code the render) and the carried
    frame-sized accumulator keeping the per-frame HBM write the standard
    methodology's materialized outputs perform. t0/key vary per dispatch
    so no dispatch is ever a memoizable replay. The per-dispatch tunnel
    quantum — even when dispatches serialize — is constant across n and
    cancels in the elapsed-vs-frames regression.

    The ladder is adaptive by default: n grows from 2048 until the
    marginal device time clearly dominates quantum noise (elapsed at
    least 3 s over the first rung) or the budget/size cap binds; then
    remaining passes re-sample the ladder for the fit."""
    import jax
    import jax.numpy as jnp
    from transflow_tpu.config import LayerConfig
    from transflow_tpu.flow import Direction
    from transflow_tpu.model import FlowTransferModel

    model = FlowTransferModel(
        HEIGHT, WIDTH,
        [LayerConfig(0, reset_mode="random", reset_random_factor=0.01)],
        {0: [(3, np.ones((HEIGHT, WIDTH), bool))]},
        method="farneback", estimator_kwargs=dict(estimator_kwargs or {}),
        direction=Direction.BACKWARD)
    frames = make_frames(GRAY_SETS + 1)
    state0 = model.init_state(frames[0])
    grays = jax.device_put(jnp.asarray(make_frames(GRAY_SETS, seed=3)))
    pixmaps = model.default_pixmaps()
    root_key = jax.random.key(7)
    framerate = jnp.float32(model.framerate)

    programs = {}

    def make_program(n):
        @jax.jit
        def prog(state, grays, pixmaps, t0, key, params_list, pp_mask,
                 est_params):
            acc0 = jnp.zeros((model.out_height, model.out_width, 3),
                             jnp.uint8)

            def body(carry, i):
                st, acc = carry
                gray = grays[jnp.mod(i, GRAY_SETS)]
                frame_numbers = tuple(tuple(i for _ in p.channel_counts)
                                      for p in model.layer_params)
                new_state, rgb = model._step(
                    st, gray, pixmaps, t0 + i.astype(jnp.float32) / framerate,
                    jax.random.fold_in(key, i), frame_numbers, params_list,
                    pp_mask, est_params)
                # uint8 wraparound add: every pixel of every rendered frame
                # feeds the returned checksum, and the carried frame-sized
                # accumulator is written back each iteration (the HBM
                # traffic the standard method's materialized outputs pay)
                return (new_state, acc + rgb), None

            (st, acc), _ = jax.lax.scan(body, (state, acc0),
                                        jnp.arange(n, dtype=jnp.int32))
            return jnp.sum(acc.astype(jnp.uint32))
        return prog

    counter = [0]

    def run_once(n):
        counter[0] += 1
        t0 = jnp.float32(1000.0 * counter[0])
        key = jax.random.fold_in(root_key, counter[0])
        start = time.perf_counter()
        total = programs[n](state0, grays, pixmaps, t0, key,
                            model.layer_params, model.pp_mask,
                            model.est_params)
        int(np.asarray(total))
        return time.perf_counter() - start

    def sample(n):
        if n not in programs:
            programs[n] = make_program(n)
            run_once(n)  # compile + first execution: discard
        return run_once(n)

    # OBSERVED HAZARD: the tunnel kills the worker process outright when a
    # single program execution runs long (a 1080p scan whose execution
    # crossed ~50 s crashed the worker reproducibly; short programs were
    # fine). The ladder therefore predicts the next rung's elapsed from
    # the measured marginal cost and refuses to schedule anything beyond
    # EXEC_CAP; a crash mid-ladder degrades to fitting what was collected.
    EXEC_CAP = 40.0

    deadline = time.monotonic() + budget_s
    if watchdog is not None:
        watchdog.rearm("slope-compile")
    ns, ts = [], []
    crash = None

    def over_budget():
        return (time.monotonic() > deadline
                or (watchdog is not None
                    and watchdog.remaining_s() < 180.0))

    try:
        if lengths is None:
            # adaptive ladder: grow until the marginal device time
            # dominates the observed quantum noise (~±0.3 s -> 6 s span)
            n = 16
            while True:
                if watchdog is not None:
                    watchdog.rearm(f"slope-ladder-n{n}")
                t = sample(n)
                ns.append(n)
                ts.append(t)
                if t - ts[0] > 6.0 or n >= 262144 or over_budget():
                    break
                # resolvable marginal -> careful x2 growth; unresolvably
                # fast -> x4 to reach useful spans in few compiles
                grow = 2 if t - ts[0] > 0.5 else 4
                nxt = n * grow
                if ns[-1] > ns[0]:
                    m = (ts[-1] - ts[0]) / (ns[-1] - ns[0])
                    if ts[0] + m * (nxt - ns[0]) > EXEC_CAP:
                        break
                n = nxt
            # the fit needs >=3 distinct rungs; a steep regime can stop
            # the ladder after two — backfill geometric midpoints
            uniq = sorted(set(ns))
            while len(uniq) < 3 and not over_budget():
                for a, b in zip(uniq, uniq[1:]):
                    mid = int(round((a * b) ** 0.5))
                    if mid > a and mid not in uniq:
                        if watchdog is not None:
                            watchdog.rearm(f"slope-mid-n{mid}")
                        ns.append(mid)
                        ts.append(sample(mid))
                        break
                else:
                    break
                uniq = sorted(set(ns))
            lengths = tuple(uniq)
            passes = max(1, passes - 1)
        for _ in range(passes):
            for n in lengths:
                if ns and over_budget():
                    break
                if watchdog is not None:
                    watchdog.rearm(f"slope-sample-n{n}")
                ns.append(n)
                ts.append(sample(n))
            if over_budget():
                break
    except Exception as exc:  # worker crash / tunnel death mid-ladder
        if ns and len(ts) < len(ns):
            ns.pop()
        crash = repr(exc)[:200]
    out = slope_fit(ns, ts, mxu_sol_tflops=mxu_sol_tflops)
    out["metric"] = "1080p_slope_fps_flow_warp_composite"
    out["unit"] = "frames/sec"
    if crash is not None:
        out["aborted_by"] = crash
    return out


def _bench_liteflownet(n_chain: int = 8, height: int = 1088,
                       width: int = 1920) -> dict:
    """LiteFlowNet 1088p ms/frame via an n-deep data-dependent chain
    (each step's output perturbs the next step's inputs; one value
    readback). Random weights — identical compute graph to the published
    checkpoint, and the bench must not depend on a weights download."""
    import jax
    import jax.numpy as jnp
    from transflow_tpu.flow.estimators import liteflownet as lfn
    H, W = height, width
    rng = np.random.default_rng(2)
    variables = lfn.get_weights(allow_random=True)
    model = lfn.LiteFlowNet()
    i1 = jnp.asarray(rng.random((H, W, 3), np.float32))
    i2 = jnp.asarray(rng.random((H, W, 3), np.float32))

    def chained(s0, a, b, v):
        def step(s, _):
            out = model.apply(v, a + s * 1e-6, b + s * 1e-6)
            return jnp.mean(out).astype(jnp.float32) * 1e-6, None
        s, _ = jax.lax.scan(step, s0, None, length=n_chain)
        return s

    jitted = jax.jit(chained)
    times = []
    for i in range(3):
        start = time.perf_counter()
        float(jitted(jnp.float32(1e-3 * (i + 1)), i1, i2, variables))
        if i > 0:  # first sample carries the compile
            times.append(time.perf_counter() - start)
    ms = 1000.0 * float(np.median(times)) / n_chain
    return {"liteflownet_1088p_ms_per_frame": round(ms, 1),
            "liteflownet_1088p_fps": round(1000.0 / ms, 2)}


def bench_cpu_reference() -> float:
    """The reference's per-frame CPU work: cv2 Farneback + the numpy
    moveref update (round/flatten flow, masked permutation via flat
    assignment, reset, gather) + alpha composite, at 1080p."""
    import cv2
    frames = make_frames(CPU_FRAMES + 1, seed=1)
    pixmap = np.random.default_rng(0).integers(
        0, 256, (HEIGHT, WIDTH, 3), dtype=np.uint8)
    n = HEIGHT * WIDTH
    data = np.stack(np.indices((HEIGHT, WIDTH)), axis=-1).reshape(n, 2)
    alpha = np.ones(n, dtype=np.int32)
    rng = np.random.default_rng(0)
    start = time.perf_counter()
    for i in range(CPU_FRAMES):
        flow = cv2.calcOpticalFlowFarneback(
            frames[i + 1], frames[i], None, 0.5, 3, 15, 3, 5, 1.2, 0)
        flow_int = np.round(flow).astype(np.int32)
        flow_flat = (flow_int[..., 1] * WIDTH + flow_int[..., 0]).ravel()
        where_target = np.nonzero(flow_flat)[0]
        where_source = np.clip(where_target + flow_flat[where_target],
                               0, n - 1)
        data[where_target] = data[where_source]
        alpha[where_target] = 1
        reset = rng.random(n) < 0.01
        base_i, base_j = np.divmod(np.arange(n)[reset], WIDTH)
        data[reset, 0] = base_i
        data[reset, 1] = base_j
        rgb = pixmap[np.clip(data[:, 0], 0, HEIGHT - 1),
                     np.clip(data[:, 1], 0, WIDTH - 1)]
        image = np.where((alpha != 0)[:, None], rgb, 255).astype(np.uint8)
        _ = image.reshape(HEIGHT, WIDTH, 3)
    return CPU_FRAMES / (time.perf_counter() - start)


class _Watchdog:
    """The device tunnel can become unresponsive for long stretches (a hung
    upload/readback is uninterruptible from this thread). Emit a parseable
    error line and exit instead of hanging the driver forever.

    The no-progress deadline measures time WITHOUT PROGRESS; each
    completed phase (tunnel wait, compile, chunk gate, each timed region)
    re-arms it. The TOTAL deadline is absolute from process start and is
    the number every phase budget composes under (``_phase_budget``):
    round-4 postmortem — fixed phase constants summed past the driver's
    window and BENCH_r04.json was rc=124/parsed=null, forfeiting the one
    artifact the driver keeps per round. Defaults are now 1500 s total /
    600 s no-progress; the record-printing ladder is
    in-process total timer (total − 90) → sentinel process (total − 30)
    → any external kill (total or later), so a parseable record ALWAYS
    lands first."""

    def __init__(self):
        import threading
        self._threading = threading
        self.total_deadline = float(
            os.environ.get("TRANSFLOW_BENCH_TOTAL_DEADLINE", "1500"))
        self.deadline = min(
            float(os.environ.get("TRANSFLOW_BENCH_DEADLINE", "600")),
            self.total_deadline)
        self.phase = "startup"
        self._timer = None
        self._start = time.monotonic()
        # A completed measurement stashed here is printed VERBATIM (plus an
        # extras_truncated note) if a deadline fires later — optional
        # stages and retries must never erase a record that already exists.
        self._pending_record = None
        # fire BEFORE the sentinel (total − 90 vs total − 30) so the
        # richer in-process record wins whenever the GIL is available
        total_fire_s = self.total_deadline - min(
            90.0, 0.25 * self.total_deadline)
        self._total_timer = self._threading.Timer(
            total_fire_s, self._fire,
            kwargs={"reason": f"total bench budget "
                    f"({self.total_deadline:.0f}s) exhausted without a "
                    "completed measurement"})
        self._total_timer.daemon = True
        self._total_timer.start()
        self._spawn_sentinel()
        self.rearm("startup")

    # --- process sentinel -------------------------------------------------
    # The Timer threads above need the GIL to run. A hung tunnel RPC that
    # holds the GIL inside a C extension starves them indefinitely —
    # observed: a degraded --e2e attempt ran 75 min past both deadlines and
    # was killed by its outer `timeout` with EMPTY stdout. The sentinel is
    # a separate PROCESS sharing this one's stdout: it watches a heartbeat
    # file the main process touches on every rearm. It prints and
    # SIGKILLs when the heartbeat is stale past the no-progress deadline
    # plus a 45 s grace (in-process timers win whenever they can run), or
    # ABSOLUTELY at total_deadline − 30 s — BEFORE any external kill at
    # total_deadline, because round 4 proved the "+ grace" variant loses
    # that race (rc=124, empty stdout).
    _SENTINEL_SRC = r"""
import json, os, signal, sys, time
ppid = int(sys.argv[1]); hb = sys.argv[2]; pend = sys.argv[3]
dl = float(sys.argv[4]); tdl = float(sys.argv[5]); lhp = sys.argv[6]
start = time.time()
def alive(pid):
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False
while True:
    time.sleep(5)
    if not alive(ppid):
        sys.exit(0)
    try:
        mtime = os.path.getmtime(hb)
    except OSError:
        mtime = start
    now = time.time()
    stale = now - mtime
    if stale <= dl and now - start <= tdl:
        continue
    phase = ""
    try:
        phase = open(hb).read().strip()
    except Exception:
        pass
    if now - start > tdl:
        reason = ("total bench budget (%.0fs) exhausted; the in-process "
                  "watchdog never ran (GIL held by a hung tunnel call)"
                  % tdl)
    else:
        reason = ("no progress for %.0fs and the in-process watchdog "
                  "never ran (GIL held by a hung tunnel call)" % stale)
    record = None
    try:
        with open(pend) as file:
            record = json.load(file)
    except Exception:
        pass
    if record is not None:
        record["extras_truncated"] = (
            "%s during phase %s; the completed measurement above is "
            "intact, optional stages were cut" % (reason, phase))
    else:
        last = None
        try:
            with open(lhp) as file:
                last = json.load(file)
        except Exception:
            pass
        record = {
            "metric": "1080p_e2e_fps_flow_warp_composite",
            "value": 0, "unit": "frames/sec", "vs_baseline": 0,
            "healthy": False,
            "error": "%s (phase: %s); no measurement possible"
                     % (reason, phase),
            "last_healthy_record": last,
            "in_regime_evidence": "see bench_attempts/round4/NOTES.md "
                                  "(in-regime ratio evidence)",
        }
    print(json.dumps(record), flush=True)
    try:
        os.kill(ppid, signal.SIGKILL)
    except OSError:
        pass
    sys.exit(0)
"""

    def _spawn_sentinel(self):
        import subprocess
        import tempfile
        # Any failure here (mkdtemp, heartbeat creation, Popen) degrades to
        # timer-only watchdogs: the sentinel is a backstop for GIL-starved
        # timers — its absence must not keep the bench from measuring at
        # all. rearm()/pending_record already no-op on unwritable paths.
        self._sentinel = None
        self._hb_path = os.devnull
        self._pending_path = os.devnull
        grace = float(os.environ.get("TRANSFLOW_BENCH_SENTINEL_GRACE", "45"))
        try:
            root = tempfile.mkdtemp(prefix="transflow_bench_wd_")
            self._hb_path = os.path.join(root, "heartbeat")
            self._pending_path = os.path.join(root, "pending.json")
            with open(self._hb_path, "w") as file:
                file.write("startup")
            # absolute sentinel deadline: BEFORE the external kill window
            # opens at total_deadline (round-4 rc=124 postmortem), after
            # the in-process total timer (total − 90) had its chance
            sentinel_total = self.total_deadline - min(
                30.0, 0.1 * self.total_deadline)
            self._sentinel = subprocess.Popen(
                [sys.executable, "-c", self._SENTINEL_SRC, str(os.getpid()),
                 self._hb_path, self._pending_path,
                 str(self.deadline + grace),
                 str(sentinel_total),
                 os.path.join(_repo_dir(), ".bench_last_healthy.json")],
                stdout=None, stderr=subprocess.DEVNULL)
        except OSError:
            self._sentinel = None

    @property
    def pending_record(self):
        return self._pending_record

    @pending_record.setter
    def pending_record(self, record):
        self._pending_record = record
        if record is None or self._sentinel is None:
            return
        try:
            tmp = self._pending_path + ".tmp"
            with open(tmp, "w") as file:
                json.dump(record, file)
            os.replace(tmp, self._pending_path)
        except OSError:
            pass

    def remaining_s(self) -> float:
        """Seconds left before the absolute total deadline."""
        return self.total_deadline - (time.monotonic() - self._start)

    def _fire(self, reason: str | None = None):
        if reason is None:
            reason = (f"device unresponsive for {self.deadline:.0f}s with "
                      "no progress (tunnel down?)")
        if self.pending_record is not None:
            record = dict(self.pending_record)
            record["extras_truncated"] = (
                f"{reason} during phase {self.phase}; the completed "
                "measurement above is intact, optional stages were cut")
            print(json.dumps(record), flush=True)
            os._exit(0)
        sidecar = os.path.join(_repo_dir(), ".bench_last_healthy.json")
        print(json.dumps({
            "metric": "1080p_e2e_fps_flow_warp_composite",
            "value": 0,
            "unit": "frames/sec",
            "vs_baseline": 0,
            "healthy": False,
            "error": f"{reason} (phase: {self.phase}); no measurement "
                     "possible",
            "last_healthy_record": load_last_healthy(sidecar),
            "in_regime_evidence": IN_REGIME_EVIDENCE,
        }), flush=True)
        os._exit(0)

    def rearm(self, phase: str):
        """Mark progress: restart the no-progress countdown."""
        self.phase = phase
        if self._sentinel is not None:
            try:
                with open(self._hb_path, "w") as file:
                    file.write(phase)
            except OSError:
                pass
        if self._timer is not None:
            self._timer.cancel()
        self._timer = self._threading.Timer(self.deadline, self._fire)
        self._timer.daemon = True
        self._timer.start()

    def cancel(self):
        if self._timer is not None:
            self._timer.cancel()
        self._total_timer.cancel()
        if self._sentinel is not None:
            try:
                self._sentinel.kill()
            except OSError:
                pass


def bench_e2e_cli(frames: int = 96) -> dict:
    """Disk-to-disk CLI throughput: real video in -> the actual Pipeline
    (decode threads -> chunked device scan -> encode thread) -> video out,
    at 1080p. This is what `transflow flow.mp4 -p img.png -o out.mp4`
    delivers end-to-end, host codecs included — the honest anchor next to
    the device-only figure (which excludes decode/encode). MJPEG via
    cv2 (this image has no ffmpeg binary); both still-image and
    video-pixmap (the reference's mainline) configs are timed."""
    import tempfile

    import cv2

    from transflow_tpu.config import Config, PixmapSourceConfig
    from transflow_tpu.pipeline import Pipeline

    root = tempfile.mkdtemp(prefix="transflow_bench_e2e_")
    src = os.path.join(root, "src.avi")
    writer = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 30.0,
                             (WIDTH, HEIGHT))
    grays = make_frames(frames, seed=2)
    for frame in grays:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_GRAY2BGR))
    writer.release()
    pix = os.path.join(root, "pix.png")
    cv2.imwrite(pix, np.random.default_rng(0).integers(
        0, 256, (HEIGHT, WIDTH, 3), dtype=np.uint8))

    out = {}
    for name, pixmap_path in (("still_pixmap", pix),
                              ("video_pixmap", src)):
        dst = os.path.join(root, f"out_{name}.avi")
        cfg = Config(src, output_path=dst, vcodec="mjpeg",
                     pixmap_sources=[PixmapSourceConfig(pixmap_path)],
                     seed=0)
        pipeline = Pipeline(cfg, progress=False, execute=False, replace=True,
                            export_config=False)
        start = time.perf_counter()
        pipeline.run()
        elapsed = time.perf_counter() - start
        assert pipeline.cursor == frames - 1, pipeline.cursor
        out[f"e2e_fps_{name}"] = round(pipeline.cursor / elapsed, 2)
        out[f"e2e_batch_{name}"] = pipeline._batch_size

    # archive replay — the reference's headline "render a precomputed
    # .flow.zip" mode (transflow/flow/sources/archive.py), served by the
    # estimator-free chunked flow scan (engine.device_scan_flows). Smooth
    # float16 flows (the source casts to float32 on read) keep the
    # synthetic archive small; unzip+np.load per frame is the real decode
    # cost and is deliberately included.
    from transflow_tpu.output.archive import NumpyArchiveOutput
    arc = os.path.join(root, "replay.flow.zip")
    writer = NumpyArchiveOutput(arc, {
        "direction": 0, "width": WIDTH, "height": HEIGHT,
        "framerate": 30.0}, replace=True)
    yy = np.linspace(0, 2 * np.pi, HEIGHT, dtype=np.float32)[:, None]
    xx = np.linspace(0, 2 * np.pi, WIDTH, dtype=np.float32)[None, :]
    for k in range(frames):
        phase = 2 * np.pi * k / frames
        flow = np.stack([3 * np.sin(xx + phase) * np.cos(yy),
                         3 * np.cos(xx) * np.sin(yy + phase)],
                        axis=-1).astype(np.float16)
        writer.write_array(flow)
    writer.close()
    dst = os.path.join(root, "out_replay.avi")
    cfg = Config(arc, output_path=dst, vcodec="mjpeg",
                 pixmap_sources=[PixmapSourceConfig(pix)], seed=0)
    pipeline = Pipeline(cfg, progress=False, execute=False, replace=True,
                        export_config=False)
    start = time.perf_counter()
    pipeline.run()
    elapsed = time.perf_counter() - start
    assert pipeline.cursor == frames, pipeline.cursor
    out["e2e_fps_archive_replay"] = round(pipeline.cursor / elapsed, 2)
    out["e2e_batch_archive_replay"] = pipeline._batch_size
    import shutil
    shutil.rmtree(root, ignore_errors=True)
    return out


def load_last_healthy(path: str):
    """Most recent healthy capture (or None), stamped with its age.

    Refusal records attach this so a sick window at record time does not
    erase the evidence a healthy run produced (same binary, same
    methodology); the age makes the provenance explicit."""
    if not os.path.exists(path):
        return None
    try:
        with open(path) as file:
            record = json.load(file)
        record["age_hours"] = round(
            (time.time() - record.get("timestamp", 0)) / 3600.0, 1)
        return record
    except Exception:
        return None


def main():
    watchdog = _Watchdog()
    if os.environ.get("TRANSFLOW_BENCH_SELFTEST_HANG") == "1":
        # Regression hook (tests/test_bench_health.py): stand-in for a
        # tunnel RPC that hangs while HOLDING THE GIL before any phase
        # completes (the round-4 failure shape). _sre backtracks for
        # ~2**64 steps without releasing the GIL, so no timer thread can
        # run — the sentinel PROCESS must still print a parseable record
        # before an external kill lands.
        import re as _re
        _re.match(r"(a+)+$", "a" * 64 + "b")
    record_path = os.path.join(_repo_dir(), ".bench_cpu_baseline.json")
    cpu_fps = None
    if os.path.exists(record_path):
        try:
            with open(record_path) as file:
                cpu_fps = json.load(file)["cpu_fps"]
        except Exception:
            cpu_fps = None
    if cpu_fps is None:
        cpu_fps = bench_cpu_reference()
        try:
            with open(record_path, "w") as file:
                json.dump({"cpu_fps": cpu_fps, "height": HEIGHT,
                           "width": WIDTH, "timestamp": time.time()}, file)
        except OSError:
            pass
    healthy_path = os.path.join(_repo_dir(), ".bench_last_healthy.json")

    def refusal_record(tpu, slope=None):
        # REFUSAL record: a sick-regime number is the infrastructure, not
        # the framework — never print it as a bare plausible-looking value.
        # Attach the most recent HEALTHY capture (clearly labelled with its
        # age) so a sick window at record time does not erase the evidence
        # a healthy run produced: same binary, same methodology.
        out = {
            "metric": "1080p_e2e_fps_flow_warp_composite",
            "value": 0,
            "unit": "frames/sec",
            "vs_baseline": 0,
            "healthy": False,
            "error": "tunnel regime unhealthy — measurement refused: "
                     + "; ".join(tpu["unhealthy_reasons"]),
            "raw_unhealthy_fps": round(tpu["fps"], 2),
            "tunnel_rtt_s": tpu["tunnel_rtt_s"],
            "chunk_gate_s": tpu["chunk_gate_s"],
            "stage_ms": tpu["stage_ms"],
            "cpu_reference_fps": round(cpu_fps, 3),
            **({"mxu_sol_tflops": tpu["mxu_sol_tflops"]}
               if "mxu_sol_tflops" in tpu else {}),
            "healthy_reference": (
                "physically-consistent band on one v5e: "
                f"{GENUINE_FLOOR_FPS:.0f} fps (measured 0.6-1.8 GB/s "
                "gather wall, compute-healthy window required) to "
                f"~{CEILING_FPS:.0f} fps (HBM floor traffic); "
                "docs/PERF.md round-4/5 accounting — the pre-round-4 "
                "28k-101k records were barrier-defeat artifacts"),
            "last_healthy_record": load_last_healthy(healthy_path),
            "in_regime_evidence": IN_REGIME_EVIDENCE,
        }
        preset_ab = load_preset_ab()
        if preset_ab is not None:
            out["fast_preset_ab"] = preset_ab
        if slope is not None:
            # the slope probe's verdict distinguishes readback-only damage
            # from dispatch serialization — keep its evidence in the record
            out["slope_probe"] = slope
        if "--e2e" in sys.argv:
            out["e2e_skipped"] = ("flagship verdict unhealthy — e2e "
                                  "would measure the sick tunnel, not "
                                  "the CLI")
        return out

    def slope_record(tpu, slope):
        # The standard gate refused, but the slope regression proved the
        # damage is readback-only: the constant completion quantum cancels
        # out of elapsed-vs-N, leaving the true marginal chunk cost. The
        # record self-describes the methodology and why the standard one
        # refused; extras are skipped (their chained timings would still
        # ride the sick readbacks).
        fps = float(slope["value"])
        return {
            "metric": "1080p_e2e_fps_flow_warp_composite",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / cpu_fps, 2),
            "healthy": True,
            "method": ("slope-regression: elapsed-vs-N over chained "
                       "chunk dispatches cancels the tunnel's constant "
                       "completion quantum (bench.slope_fit)"),
            "ms_per_frame": round(1000.0 / fps, 4) if fps else 0.0,
            "readback_quantum_s": slope["intercept_s"],
            "slope_r2": slope["r2"],
            "slope_n_points": slope["n_points"],
            "slope_samples": slope["samples"],
            "standard_method_refused": "; ".join(tpu["unhealthy_reasons"]),
            **({"gather_bound": slope["gather_bound"],
                "mxu_sol_tflops": slope["mxu_sol_tflops"],
                "gather_wall_evidence": GATHER_WALL_EVIDENCE}
               if "gather_bound" in slope else {}),
            "tunnel_rtt_s": tpu["tunnel_rtt_s"],
            "chunk_gate_s": tpu["chunk_gate_s"],
            "hbm_io_gbps": round(4.0 * HEIGHT * WIDTH * fps / 1e9, 1),
            "hbm_min_traffic_gbps": round(
                MIN_BYTES_PER_FRAME * fps / 1e9, 1),
            "physical_ceiling_fps": round(CEILING_FPS, 0),
            "cpu_reference_fps": round(cpu_fps, 3),
            "extras_skipped": ("liteflownet/e2e stages skipped: their "
                               "single-chain timings would measure the "
                               "quantized readbacks, not the device"),
        }

    def write_sidecar(record, methodology="standard-chained-readback"):
        # Persisted for future refusal records' last_healthy_record. The
        # capture_methodology tag travels with the record so a consumer
        # comparing across runs can tell a slope-regression capture
        # (marginal cost, checksum accumulator) from a standard-method
        # capture (materialized readbacks) — the two are not directly
        # comparable figures.
        try:
            with open(healthy_path, "w") as file:
                json.dump({**record, "timestamp": time.time(),
                           "capture_methodology": methodology}, file)
        except OSError:
            pass

    watchdog.rearm("tunnel-wait")
    tpu = bench_tpu(watchdog)
    if not tpu["healthy"]:
        # stash the diagnostic refusal NOW: if the retry stalls and a
        # deadline fires, the first attempt's full diagnostics still print
        watchdog.pending_record = refusal_record(tpu)
        if (os.environ.get("TRANSFLOW_BENCH_RETRY", "1") != "0"
                and tpu.get("mxu_sol_tflops", 0.0) < MXU_HEALTH_TFLOPS
                and watchdog.remaining_s() > 900.0):
            # retry only fights TRANSIENT sickness; a compute-healthy
            # refusal means the chunk cost is genuine (gather-bound) and
            # deterministic — go straight to the slope measurement
            # one more attempt after a cool-down: sick regimes have been
            # observed clearing within minutes (and persisting for hours —
            # in which case the refusal record is the honest output). The
            # budget gate only admits a retry when the FIRST attempt
            # failed fast (>900 s must remain of the 1500 s total), so a
            # slow first attempt never launches a retry the total
            # deadline is guaranteed to kill mid-flight.
            watchdog.rearm("retry-cooldown")
            time.sleep(60.0)
            tpu = bench_tpu(watchdog)
    if not tpu["healthy"]:
        # last resort before refusing: the slope methodology can extract a
        # genuine device-throughput figure when the regime's damage is
        # readback-only (constant quantum). If dispatches themselves
        # serialize (poll-serialized) or the fit is bad, the refusal
        # stands — with the slope evidence attached either way.
        slope = None
        if (os.environ.get("TRANSFLOW_BENCH_SLOPE", "1") != "0"
                and watchdog.remaining_s() > 300.0):
            watchdog.rearm("slope-fallback")
            try:
                slope = bench_slope(
                    watchdog,
                    budget_s=min(600.0, watchdog.remaining_s() - 200.0),
                    mxu_sol_tflops=tpu.get("mxu_sol_tflops"))
            except Exception as exc:
                slope = {"verdict": "unmeasurable",
                         "error": repr(exc)[:200]}
            watchdog.pending_record = refusal_record(tpu, slope)
        if slope is not None and slope.get("verdict") == "device-throughput":
            record = slope_record(tpu, slope)
            write_sidecar(record, methodology="slope-regression")
            watchdog.cancel()
            print(json.dumps(record))
            return
        watchdog.cancel()
        print(json.dumps(refusal_record(tpu, slope)))
        return
    record = {
        "metric": "1080p_e2e_fps_flow_warp_composite",
        "value": round(tpu["fps"], 2),
        "unit": "frames/sec",
        "vs_baseline": round(tpu["fps"] / cpu_fps, 2),
        "healthy": True,
        "ms_per_frame": round(tpu["ms_per_frame"], 4),
        "best_fps": round(tpu["best_fps"], 2),
        "noise_iqr_pct": tpu["noise_iqr_pct"],
        "tunnel_rtt_s": tpu["tunnel_rtt_s"],
        "chunk_gate_s": tpu["chunk_gate_s"],
        "stage_ms": tpu["stage_ms"],
        "hbm_io_gbps": tpu["hbm_io_gbps"],
        "hbm_min_traffic_gbps": tpu["hbm_min_traffic_gbps"],
        "physical_ceiling_fps": tpu["physical_ceiling_fps"],
        "carry_state_mb": tpu["carry_state_mb"],
        "cpu_reference_fps": round(cpu_fps, 3),
    }
    # Methodology cross-check (round 4): the standard chained-readback
    # figure is only as strong as its completion barrier, and this
    # environment's tunnel has defeated weaker barriers before. The slope
    # methodology (ONE dispatch per sample, every output pixel feeding a
    # returned checksum) cannot be short-circuited; in a healthy window
    # its ladder costs seconds. If the two methods agree within 2x, the
    # standard figure stands with the cross-check attached; if they
    # disagree, the slope figure IS the measurement and the standard one
    # is recorded as the artifact it just proved to be.
    if (os.environ.get("TRANSFLOW_BENCH_CROSSCHECK", "1") != "0"
            and watchdog.remaining_s() > 420.0):
        watchdog.rearm("slope-crosscheck")
        try:
            cross = bench_slope(watchdog, budget_s=min(
                420.0, watchdog.remaining_s() - 300.0))
        except Exception as exc:
            cross = {"verdict": "unmeasurable", "error": repr(exc)[:200]}
        record["slope_crosscheck"] = cross
        if cross.get("verdict") == "device-throughput":
            slope_fps = float(cross["value"])
            std_fps = float(record["value"])
            ratio = max(slope_fps, std_fps) / max(1e-9, min(slope_fps,
                                                            std_fps))
            if ratio > 2.0:
                record["chained_readback_fps_artifact"] = std_fps
                record["value"] = round(slope_fps, 2)
                record["vs_baseline"] = round(slope_fps / cpu_fps, 2)
                record["ms_per_frame"] = round(1000.0 / slope_fps, 4)
                record["hbm_min_traffic_gbps"] = round(
                    MIN_BYTES_PER_FRAME * slope_fps / 1e9, 1)
                record["method"] = (
                    "slope-regression (primary): the chained-readback "
                    f"figure ({std_fps:.0f} fps) disagrees {ratio:.1f}x "
                    "with the checksum-barriered slope figure — its "
                    "completion barrier was defeated; the slope "
                    "measurement is the defensible number")
    # The flagship measurement is DONE: persist + stash it before any
    # optional stage runs, so a stall in the extras (fresh sick window,
    # long compile) degrades to extras_truncated — never to a refusal.
    # Stash a COPY at each stage boundary: the timer thread copies
    # pending_record when it fires, and copying a dict the main thread is
    # concurrently update()-ing can raise mid-iteration, which would lose
    # the record — the exact failure pending_record exists to prevent.
    write_sidecar(record)
    watchdog.pending_record = dict(record)
    if (os.environ.get("TRANSFLOW_BENCH_LITEFLOWNET", "1") != "0"
            and watchdog.remaining_s() > 240.0):
        # CNN figure via the chained methodology — only after the regime
        # just proved healthy (a quantized window would print garbage),
        # and only with budget left above the record-printing reserve
        watchdog.rearm("stage-liteflownet")
        try:
            record.update(_bench_liteflownet())
        except Exception as exc:
            record["liteflownet_error"] = repr(exc)[:200]
        watchdog.pending_record = dict(record)
    preset_ab = load_preset_ab()
    if preset_ab is not None:
        record["fast_preset_ab"] = preset_ab
    if (os.environ.get("TRANSFLOW_BENCH_FAST_PRESET", "1") != "0"
            and watchdog.remaining_s() > 300.0):
        # The >=500 fps preset (assets/configs/fastest.json), measured
        # live by the checksum-barriered slope ladder in the window the
        # flagship just proved healthy — the absolute figure for the
        # docs/PERF.md presets table
        watchdog.rearm("stage-fast-preset")
        try:
            from transflow_tpu.flow.sources.cv import CvFlowConfig
            with open(os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "assets", "configs",
                    "fastest.json"), encoding="utf8") as file:
                kw = CvFlowConfig(**json.load(file)).estimator_kwargs()
            record["fastest_preset_slope"] = bench_slope(
                watchdog, budget_s=min(300.0,
                                       watchdog.remaining_s() - 200.0),
                estimator_kwargs=kw)
        except Exception as exc:
            record["fastest_preset_error"] = repr(exc)[:200]
        watchdog.pending_record = dict(record)
    if "--e2e" in sys.argv and watchdog.remaining_s() > 240.0:
        # e2e AFTER the health proof: its verdict is the realistic heavy
        # gate a small probe cannot provide (BASELINE.md: probe-healthy /
        # heavy-quantized regimes coexist), and in a sick regime its
        # chunked dispatches would eat the whole budget riding the cycle
        watchdog.rearm("e2e-cli")
        try:
            record.update(bench_e2e_cli())
        except Exception as exc:
            record["e2e_error"] = repr(exc)[:200]
    write_sidecar(record)
    watchdog.cancel()
    print(json.dumps(record))


if __name__ == "__main__":
    main()
