"""Real-Mosaic validation of the Pallas kernels (healthy-window queue).

Interpret-mode tests prove the math; this proves the actual TPU lowering:
the bounded select warp, the correlation band kernel, and the
shard_map'd sharded correlation (1-device 'space' mesh — same Mosaic
kernel + the ppermute/manual-SPMD plumbing the --mesh path uses).
(The MXU selection-matrix warp this script once checked was deleted in
round 4: the real Mosaic toolchain rejected its row reshape — this
script's check was how that would have been caught in a healthy
window.)
TRANSFLOW_PLATFORM=cpu smoke-tests the script logic in interpret mode.
"""
import os
import sys
import time

import numpy as np

import jax

if os.environ.get("TRANSFLOW_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["TRANSFLOW_PLATFORM"])
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from transflow_tpu.flow.estimators.liteflownet import backwarp  # noqa: E402
from transflow_tpu.ops.correlation import correlation7x7  # noqa: E402
from transflow_tpu.ops.pallas_correlation import (  # noqa: E402
    pallas_correlation7x7, sharded_pallas_correlation7x7)
from transflow_tpu.ops.pallas_warp import bounded_backwarp  # noqa: E402

INTERPRET = jax.default_backend() == "cpu"
rng = np.random.default_rng(0)
H, W, C = 32, 200, 32
img = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32))
yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
flow = jnp.asarray(np.stack([5.0 * np.sin(xx / 17), 3.0 * np.cos(yy / 9)],
                            -1).astype(np.float32))
t0 = time.time()
got = np.asarray(bounded_backwarp(img, flow, 8, interpret=INTERPRET))
print("select warp compile+run:", round(time.time() - t0, 1), "s", flush=True)
want = np.asarray(backwarp(img.astype(jnp.bfloat16), flow))
print("select warp max|err| vs exact:", float(np.abs(got - want).max()),
      flush=True)

f1 = jnp.asarray(rng.standard_normal((64, 48, 16)).astype(np.float32))
f2 = jnp.asarray(rng.standard_normal((64, 48, 16)).astype(np.float32))
for stride in (1, 2):
    ref = np.asarray(correlation7x7(f1, f2, stride=stride))
    got = np.asarray(pallas_correlation7x7(f1, f2, stride=stride,
                                           interpret=INTERPRET))
    print(f"corr stride={stride} max|err|:",
          float(np.abs(got - ref).max()), flush=True)
    mesh = Mesh(np.array(jax.devices()[:1]), ("space",))
    got_sh = np.asarray(sharded_pallas_correlation7x7(
        f1, f2, mesh, stride=stride, interpret=INTERPRET))
    print(f"sharded corr (1-dev mesh) stride={stride} max|err| vs pallas:",
          float(np.abs(got_sh - got).max()), flush=True)
