"""Chained A/B: XLA gather vs the bounded select kernel at level-2 shape.

(The MXU selection-matrix variant this file was named for was deleted in
round 4 — the real Mosaic toolchain rejects its row reshape at every
dtype; the filename stays for healthy_window_queue.sh compatibility.)

24-deep data-dependent chains in one program, value readback, minus base.
Usage: timeout 1800 python tools/mxu_warp_bench.py [N]
"""
import sys
import time

import numpy as np
import jax

import os
if os.environ.get("TRANSFLOW_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TRANSFLOW_PLATFORM"])
import jax.numpy as jnp

import os as _os_
sys.path.insert(0, _os_.path.dirname(_os_.path.dirname(_os_.path.abspath(__file__))))
from transflow_tpu.flow.estimators.liteflownet import backwarp  # noqa: E402
from transflow_tpu.ops.pallas_warp import bounded_backwarp  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
H, W, C = 544, 960, 64
K = 16
rng = np.random.default_rng(0)
interp = jax.default_backend() == "cpu"


def chain(f, img, flow, n=N):
    def step(s, _):
        out = f(img + s.astype(img.dtype) * 1e-6, flow)
        return jnp.mean(out).astype(jnp.float32) * 1e-6, None
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


def base(img, flow):
    def step(s, _):
        return jnp.mean(img[0, 0] + s) * 1e-6, None
    def run(s0):
        s, _ = jax.lax.scan(step, s0, None, length=N)
        return s
    jit = jax.jit(run)
    ts = []
    for i in range(4):
        t0 = time.time()
        float(jit(jnp.float32(rng.random() * 1e-3)))
        if i:
            ts.append(time.time() - t0)
    return float(np.median(ts)) / N


img = jnp.asarray(rng.standard_normal((H, W, C), np.float32)).astype(jnp.bfloat16)
yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
fields = {
    "pan": np.broadcast_to(np.array([3.25, -2.75], np.float32), (H, W, 2)),
    "smooth": np.stack([12.0 * np.sin(xx / 37) * np.cos(yy / 23),
                        12.0 * np.cos(xx / 31) * np.sin(yy / 41)], -1),
    "noise": rng.uniform(-K + 0.1, K - 0.1, (H, W, 2)).astype(np.float32),
}

print(f"backend={jax.default_backend()} shape=({H},{W},{C}) K={K} N={N}",
      flush=True)
b = base(img, jnp.zeros((H, W, 2), jnp.float32))
print(f"base chain: {b*1e3:.2f} ms/op", flush=True)
for name, f in fields.items():
    flow = jnp.asarray(f.astype(np.float32))
    t_g = chain(lambda a, fl: backwarp(a, fl), img, flow) - b
    t_s = chain(lambda a, fl: bounded_backwarp(a, fl, K, interpret=interp),
                img, flow) - b
    print(f"{name:8s} gather={t_g*1e3:7.2f}  select={t_s*1e3:7.2f} ms/op  "
          f"ratio={t_g/max(t_s,1e-9):.2f}x", flush=True)
