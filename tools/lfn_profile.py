"""Per-module LiteFlowNet timing at 1088x1920, chained methodology.

Every region is timed as an N-deep data-dependent chain inside ONE jitted
program (a scalar derived from each iteration's output perturbs the next
iteration's inputs), with a single value readback at the end — the only
honest way to time sub-50 ms ops through the axon tunnel (see
BASELINE.md's dispatch-floor note). A trivial base chain is subtracted.

Usage: timeout 3600 python tools/lfn_profile.py [N_CHAIN] > /tmp/lfn_profile.json
"""
import json
import sys
import time

import os

import numpy as np

import jax

if os.environ.get("TRANSFLOW_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TRANSFLOW_PLATFORM"])
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from transflow_tpu.flow.estimators import liteflownet as lfn  # noqa: E402
from transflow_tpu.ops.correlation import correlation as corr_xla  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
H = int(os.environ.get("LFN_H", 1088))
W = int(os.environ.get("LFN_W", 1920))
rng = np.random.default_rng(0)
RESULTS = {}


def _perturb(tree, s):
    return jax.tree.map(
        lambda a: a + s.astype(a.dtype) * 1e-6
        if jnp.issubdtype(a.dtype, jnp.floating) else a, tree)


def chain_time(name, fn, example_inputs, n=N, budget_s=420.0):
    """Median seconds per op over a few chained samples."""
    def chained(s0, inputs):
        def step(s, _):
            out = fn(*_perturb(inputs, s))
            leaf = jax.tree.leaves(out)[0]
            return jnp.mean(leaf).astype(jnp.float32) * 1e-6, None
        s, _ = jax.lax.scan(step, s0, None, length=n)
        return s

    jitted = jax.jit(chained)
    times = []
    t_all = time.time()
    try:
        for i in range(4):
            s0 = jnp.float32(rng.random() * 1e-3)
            t0 = time.time()
            v = float(jitted(s0, example_inputs))
            dt = time.time() - t0
            if i > 0:  # skip compile
                times.append(dt)
            if time.time() - t_all > budget_s and times:
                break
    except Exception as exc:
        # the tunnel kills the worker on long-running executions
        # (BASELINE.md); keep the regions that did measure
        if not times:
            RESULTS[name] = {"error": repr(exc)[:160]}
            print(f"  {name}: CRASHED {repr(exc)[:80]}", file=sys.stderr,
                  flush=True)
            return None
    med = float(np.median(times))
    RESULTS[name] = {"s_per_op": med / n, "ms_per_op": round(med / n * 1e3, 2),
                     "samples": len(times), "chain_s": round(med, 3)}
    print(f"  {name}: {med / n * 1e3:.2f} ms/op ({len(times)} samples)",
          file=sys.stderr, flush=True)
    return med / n


def feat_shapes():
    # pyramid shapes for 1088x1920
    hw = [(H, W)]
    for _ in range(5):
        hw.append(((hw[-1][0] + 1) // 2, (hw[-1][1] + 1) // 2))
    ch = [32, 32, 64, 96, 128, 192]
    return hw, ch


def rand(shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(shape, dtype=np.float32)).astype(dtype)


_SKIP = set(filter(None, os.environ.get("LFN_SKIP", "").split(",")))


def _section(name, fn):
    """Run one profile section; a crash (worker kill, OOM, init error)
    records the error and lets the remaining sections try — observed in
    the poll-serialized regime: full_net kills the TPU worker, and an
    unwrapped module init then aborted the whole dump (2026-08-19).
    LFN_SKIP=sec1,sec2 skips named sections (e.g. LFN_SKIP=corr,full_net
    in-regime: both programs are long enough to kill the worker)."""
    if name in _SKIP:
        RESULTS[f"{name}_skipped"] = "LFN_SKIP"
        return
    try:
        fn()
    except Exception as exc:
        RESULTS[f"{name}_section_error"] = repr(exc)[:160]
        print(f"  section {name}: ABORTED {repr(exc)[:80]}",
              file=sys.stderr, flush=True)


def main():
    print(f"devices: {jax.devices()}  chain N={N}", file=sys.stderr, flush=True)
    hw, ch = feat_shapes()

    # base chain: measures the scan+dispatch floor to subtract
    base = chain_time("base_chain", lambda x: x * 1.000001 + 1e-9,
                      (jnp.float32(1.0),))
    try:
        _main_sections(hw, ch)
    finally:
        # ALWAYS dump what measured, even if a section hard-killed the
        # backend — partial per-module numbers are the valuable part
        RESULTS["base_ms"] = round((base or 0.0) * 1e3, 3)
        RESULTS["meta"] = {"H": H, "W": W, "N": N,
                           "backend": jax.default_backend(),
                           "ts": time.time()}
        print(json.dumps(RESULTS, indent=1))


def _main_sections(hw, ch):
    img1 = rand((H, W, 3), jnp.float32)
    img2 = rand((H, W, 3), jnp.float32)

    def _features():
        # features trunk (shared weights, two calls per frame-pair)
        feat_mod = lfn.Features()
        fvars = feat_mod.init(jax.random.PRNGKey(0), img1)
        chain_time("features_one_image",
                   lambda x: feat_mod.apply(fvars, x), (img1,))
        # the net runs ONE batch-2 trunk call (values identical; the A/B
        # here is 1x batched-pair vs 2x the single-image figure above)
        chain_time("features_pair_batched",
                   lambda x, y: feat_mod.apply(fvars, jnp.stack([x, y])),
                   (img1, img2))
    _section("features", _features)

    # per-level heads. level l uses feats index l-1 (feats[1]=544x960 at lvl2)
    for lvl in (2, 3, 4):
        _section(f"heads_l{lvl}", lambda lvl=lvl: _head_sections(lvl, hw, ch))

    _section("warp", lambda: _warp_sections(hw))
    # the correlation A/B is its own section: the 49-shift XLA program at
    # level 2 is long enough to kill the worker in a sick regime
    # (observed 2026-08-19, 544x960) — LFN_SKIP=corr preserves the rest
    _section("corr", lambda: _corr_sections(hw))
    _section("hot_ops", lambda: _hot_op_sections(hw))

    def _full_net():
        # full network LAST: the longest program — a worker kill here
        # must not cost the per-module numbers above
        variables = lfn.get_weights(allow_random=True)
        model = lfn.LiteFlowNet(warp_bound=0)
        chain_time("full_net",
                   lambda i1, i2: model.apply(variables, i1, i2),
                   (img1, img2), n=max(4, N // 3))
        # the lfn_scale=0.5 product knob: entry-point path incl. the
        # input downscale and the flow upscale back to full resolution
        try:
            chain_time("full_net_scale05",
                       lambda a, b: lfn.liteflownet(
                           a, b, allow_random=True, warp_bound=0,
                           scale=0.5),
                       (img1, img2), n=max(4, N // 3))
        except TypeError:
            pass  # older checkout without lfn_scale
    _section("full_net", _full_net)


def _head_sections(lvl, hw, ch):
    (h, w), c = hw[lvl - 1], ch[lvl - 1]
    f1 = rand((h, w, c))
    f2 = rand((h, w, c))
    flow_half = rand((h // 2, w // 2, 2), jnp.float32)
    flow = rand((h, w, 2), jnp.float32)
    im1 = rand((h, w, 3), jnp.float32)
    im2 = rand((h, w, 3), jnp.float32)

    mat = lfn.Matching(lvl, 0)
    mvars = mat.init(jax.random.PRNGKey(1), f1, f2, flow_half)
    chain_time(f"matching_l{lvl}",
               lambda a, b, fl, m=mat, v=mvars: m.apply(v, a, b, fl),
               (f1, f2, flow_half))

    sub = lfn.Subpixel(lvl, 0)
    svars = sub.init(jax.random.PRNGKey(2), f1, f2, flow)
    chain_time(f"subpixel_l{lvl}",
               lambda a, b, fl, m=sub, v=svars: m.apply(v, a, b, fl),
               (f1, f2, flow))

    reg = lfn.Regularization(lvl)
    rvars = reg.init(jax.random.PRNGKey(3), im1, im2, f1, flow)
    chain_time(f"regularization_l{lvl}",
               lambda a, b, ft, fl, m=reg, v=rvars: m.apply(v, a, b, ft, fl),
               (im1, im2, f1, flow))
    try:
        reg_conv = lfn.Regularization(lvl, fused_apply=False)
        chain_time(f"regularization_l{lvl}_convapply",
                   lambda a, b, ft, fl, m=reg_conv, v=rvars:
                   m.apply(v, a, b, ft, fl),
                   (im1, im2, f1, flow))
    except TypeError:
        pass  # older checkout without fused_apply


def _warp_sections(hw):
    # isolated warp at level 2 (544x960 at the default 1088x1920)
    h, w = hw[1]
    f64a = rand((h, w, 64))
    flow2 = rand((h, w, 2), jnp.float32)
    chain_time("backwarp_l2_64c", lambda a, fl: lfn.backwarp(a, fl * 10.0),
               (f64a, flow2))


def _corr_sections(hw):
    h, w = hw[1]
    f64a = rand((h, w, 64))
    f64b = rand((h, w, 64))
    # Pallas first: the kernel is tiled (short programs); the XLA 49-shift
    # form is the worker-killer in a sick regime, so it goes last here
    try:
        from transflow_tpu.ops.pallas_correlation import (
            pallas_correlation7x7 as corr_pl)
        chain_time("corr_pallas_l2_stride2",
                   lambda a, b: corr_pl(a, b, stride=2), (f64a, f64b))
        chain_time("corr_pallas_l2_stride1",
                   lambda a, b: corr_pl(a, b, stride=1), (f64a, f64b))
    except Exception as exc:  # signature may differ; record it
        RESULTS["corr_pallas_error"] = repr(exc)
    # kernel='xla' REQUIRED: corr_xla is the backend dispatcher, which on
    # TPU would silently route to the Pallas kernel and void the A/B
    chain_time("corr_xla_l2_stride2",
               lambda a, b: corr_xla(a, b, stride=2, kernel="xla"),
               (f64a, f64b))
    chain_time("corr_xla_l2_stride1",
               lambda a, b: corr_xla(a, b, stride=1, kernel="xla"),
               (f64a, f64b))


def _hot_op_sections(hw):
    # corr upsample at level 2: grouped deconv vs phase decomposition
    h2, w2 = hw[1]
    corr_half = rand((h2 // 2, w2 // 2, 49), jnp.float32)
    up_kernel = rand((4, 4, 49), jnp.float32)
    try:
        chain_time("upsample49_phases_l2",
                   lambda x, k: lfn._upsample2x_phases(x, k),
                   (corr_half, up_kernel))
    except AttributeError:
        pass
    chain_time("upsample49_groupdeconv_l2",
               lambda x, k: lfn._upsample2x_groupdeconv(x, k),
               (corr_half, up_kernel))

    # image pyramid resize cost (5 levels x 2 images)
    im_full = rand((H, W, 3), jnp.float32)
    from transflow_tpu.ops.image import torch_bilinear_resize

    def pyramid(img):
        acc = jnp.float32(0)
        cur = img
        for lvl in range(1, 6):
            cur = torch_bilinear_resize(cur, hw[lvl][0], hw[lvl][1])
            acc = acc + jnp.mean(cur)
        return acc
    chain_time("img_pyramid_resize_x1", pyramid, (im_full,))

    # resize A/B: gather-free 2x fast path vs the general take formulation
    # (same values; the take path rides the TPU gather wall)
    try:
        from transflow_tpu.ops.image import _torch_bilinear_resize_take

        def pyramid_take(img):
            acc = jnp.float32(0)
            cur = img
            for lvl in range(1, 6):
                cur = _torch_bilinear_resize_take(cur, hw[lvl][0],
                                                  hw[lvl][1])
                acc = acc + jnp.mean(cur)
            return acc
        chain_time("img_pyramid_resize_x1_takepath", pyramid_take,
                   (im_full,))
        flow_half = rand((hw[1][0], hw[1][1], 2), jnp.float32)
        chain_time("flow_up2x_fast",
                   lambda x: torch_bilinear_resize(x, H, W), (flow_half,))
        chain_time("flow_up2x_takepath",
                   lambda x: _torch_bilinear_resize_take(x, H, W),
                   (flow_half,))
    except ImportError:
        pass  # older checkout without the fast paths


if __name__ == "__main__":
    main()
