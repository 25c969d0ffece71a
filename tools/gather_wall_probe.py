"""Chained A/B of the round-4 gather reformulations at flagship shapes.

Measures, with the chained methodology (N data-dependent iterations in ONE
program, value readback, minus a trivial base chain — tools/README.md):

  movement_packed   one 7-B byte-packed compositor movement gather
  movement_split    the five separate narrow gathers it replaced
  pixmap_regather   the (H, W) -> pixmap uint8 RGBA mapping gather
  scatter_any       the leave-empty boolean occupancy scatter
  fb_warp_bf16      the Farneback 5-plane warp gather with bf16 taps
  fb_warp_f32       same with f32 taps (2x the gathered bytes)

Each row reports ms/op and the implied gathered-bytes throughput so the
~10-20 GB/s gather-wall model (docs/PERF.md) can be checked per shape.
Usage: timeout 1800 python tools/gather_wall_probe.py [N] [H W]
CPU smoke: TRANSFLOW_PLATFORM=cpu python tools/gather_wall_probe.py 2 64 96
"""
import json
import os
import sys
import time

import numpy as np
import jax

if os.environ.get("TRANSFLOW_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TRANSFLOW_PLATFORM"])
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from transflow_tpu.ops.bytepack import pack_planes, unpack_planes  # noqa: E402
from transflow_tpu.ops.scatter import scatter_any  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
W = int(sys.argv[3]) if len(sys.argv) > 3 else 1920
rng = np.random.default_rng(0)


def timed_chain(f, n=N):
    """Median wall time of f chained n-deep in one program, per op.

    ``f(s)`` must return a scalar f32 that depends on all its work; the
    scalar perturbs the next iteration so the tunnel cannot memoize."""
    def step(s, _):
        return f(s), None

    def run(s0):
        s, _ = jax.lax.scan(step, s0, None, length=n)
        return s

    jit = jax.jit(run)
    ts = []
    for i in range(4):
        t0 = time.time()
        float(jit(jnp.float32(rng.random() * 1e-3)))
        if i:
            ts.append(time.time() - t0)
    return float(np.median(ts)) / n


def main():
    h, w = H, W
    src_i = jnp.asarray(rng.integers(0, h, (h, w)), jnp.int32)
    src_j = jnp.asarray(rng.integers(0, w, (h, w)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (h, w)).astype(bool))
    alpha = jnp.asarray(rng.integers(0, 256, (h, w), np.uint8))
    pos_i = jnp.asarray(rng.integers(0, h, (h, w)).astype(np.int16))
    pos_j = jnp.asarray(rng.integers(0, w, (h, w)).astype(np.int16))
    source = jnp.asarray(rng.integers(0, 4, (h, w), np.uint8))
    pixmap = jnp.asarray(rng.integers(0, 256, (h, w, 4), np.uint8))
    planes = [mask, alpha, pos_i, pos_j, source]
    packed, spec = pack_planes(planes)
    flow = jnp.asarray(rng.uniform(-8, 8, (h, w, 2)).astype(np.float32))
    poly = jnp.asarray(rng.standard_normal((h, w, 5)).astype(np.float32))

    def perturb_idx(s):
        # data-dependent index perturbation defeats memoization without
        # changing the gather's cost profile
        d = (s * 1e6).astype(jnp.int32) % 2
        return jnp.clip(src_i + d, 0, h - 1), src_j

    def movement_packed(s):
        si, sj = perturb_idx(s)
        g = packed[si, sj]
        got = unpack_planes(g, spec)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in got) * 1e-12 + s * 0.5

    def movement_split(s):
        si, sj = perturb_idx(s)
        got = [p[si, sj] for p in planes]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in got) * 1e-12 + s * 0.5

    def pixmap_regather(s):
        si, sj = perturb_idx(s)
        return jnp.sum(pixmap[si, sj].astype(jnp.float32)) * 1e-12 + s * 0.5

    def scatter_op(s):
        si, sj = perturb_idx(s)
        out = scatter_any((h, w), (si * w + sj).ravel(), mask.ravel())
        return jnp.sum(out.astype(jnp.float32)) * 1e-12 + s * 0.5

    def movement_select_k4(s):
        # gather-free bounded movement read: (2K+1)^2 shifted selects of
        # the byte pack (pure VPU + HBM streams, no gather at all). Exact
        # for |displacement| <= K — the deployment clip=4 config. Candidate
        # replacement for the packed gather IF healthy gathers turn out
        # per-slice-expensive; this case exists to decide that.
        k = 4
        si, sj = perturb_idx(s)
        di = jnp.clip(si - jax.lax.broadcasted_iota(jnp.int32, (h, w), 0),
                      -k, k)
        dj = jnp.clip(sj - jax.lax.broadcasted_iota(jnp.int32, (h, w), 1),
                      -k, k)
        pad = jnp.pad(packed, ((k, k), (k, k), (0, 0)), mode="edge")
        out = jnp.zeros_like(packed)
        for dy in range(-k, k + 1):
            for dx in range(-k, k + 1):
                view = jax.lax.slice(
                    pad, (k + dy, k + dx, 0),
                    (k + dy + h, k + dx + w, packed.shape[-1]))
                sel = ((di == dy) & (dj == dx))[..., None]
                out = jnp.where(sel, view, out)
        return jnp.sum(out.astype(jnp.float32)) * 1e-12 + s * 0.5

    def fb_warp(dtype):
        from transflow_tpu.ops.image import (bilinear_sample_packed,
                                             prepack_bilinear_taps)
        pack = prepack_bilinear_taps(poly.astype(dtype))

        def f(s):
            yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
            xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
            out = bilinear_sample_packed(pack, yy + flow[..., 1] + s * 1e-6,
                                         xx + flow[..., 0])
            return jnp.sum(out.astype(jnp.float32)) * 1e-12 + s * 0.5
        return f

    base = timed_chain(lambda s: s * 0.5 + 1e-6)
    rows = {}
    cases = [
        ("movement_packed", movement_packed, packed.shape[-1]),
        ("movement_split", movement_split, packed.shape[-1]),
        ("pixmap_regather", pixmap_regather, 4),
        ("movement_select_k4", movement_select_k4, None),
        ("scatter_any", scatter_op, None),
        ("fb_warp_bf16", fb_warp(jnp.bfloat16), 5 * 4 * 2),
        ("fb_warp_f32", fb_warp(jnp.float32), 5 * 4 * 4),
    ]
    for name, f, bytes_per_px in cases:
        ms = (timed_chain(f) - base) * 1e3
        row = {"ms_per_op": round(ms, 3)}
        if bytes_per_px:
            gbps = h * w * bytes_per_px / (ms * 1e-3) / 1e9 if ms > 0 else None
            row["gathered_bytes_mb"] = round(h * w * bytes_per_px / 1e6, 1)
            row["effective_gbps"] = round(gbps, 1) if gbps else None
        rows[name] = row
        print(json.dumps({name: row}), file=sys.stderr, flush=True)
    print(json.dumps({"backend": jax.default_backend(), "h": h, "w": w,
                      "n_chain": N, "base_ms": round(base * 1e3, 3),
                      "cases": rows}), flush=True)


if __name__ == "__main__":
    main()
