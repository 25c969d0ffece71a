"""Two-process jax.distributed E2E for the multi-host (DCN) path.

Spawns two coordinated CPU processes (4 virtual devices each) and builds
the host-major ('stream', 'space') global mesh from parallel/multihost.py,
then runs a sharded computation with a cross-stream collective and checks
the result on every host. This exercises the real jax.distributed wiring —
coordinator handshake, global device list, host-major reshape — that the
unit tests (test_multihost.py) only cover arithmetically.
"""
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy e2e/parity file: excluded from the driver-budget quick run (pytest.ini)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# isolate from the ambient TPU plugin: a dead tunnel must not hang the test
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, __REPO__)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=proc_id)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from transflow_tpu.parallel.multihost import make_global_mesh

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
mesh = make_global_mesh(space_axis=4)
assert dict(mesh.shape) == {"stream": 2, "space": 4}, dict(mesh.shape)
# every 'space' row must stay on one host (ICI rule)
grid = np.asarray(mesh.devices)
for row in grid:
    hosts = {d.process_index for d in row}
    assert len(hosts) == 1, f"space row crosses hosts: {hosts}"

# sharded computation with a cross-stream (DCN) collective
global_shape = (2, 16, 8)   # (stream, H, W)
sharding = NamedSharding(mesh, P("stream", "space", None))
base = np.arange(np.prod(global_shape), dtype=np.float32).reshape(global_shape)
arrays = []
for d in jax.local_devices():
    idx = sharding.addressable_devices_indices_map(global_shape)[d]
    arrays.append(jax.device_put(base[idx], d))
x = jax.make_array_from_single_device_arrays(global_shape, sharding, arrays)

@jax.jit
def fn(v):
    doubled = v * 2.0
    total = jnp.sum(doubled)     # all-reduce across every shard (DCN+ICI)
    return doubled + total

out = fn(x)
expected_total = float(base.sum() * 2.0)
for shard in out.addressable_shards:
    idx = shard.index
    np.testing.assert_allclose(np.asarray(shard.data),
                               base[idx] * 2.0 + expected_total, rtol=1e-6)

# ---- full pipeline step across both hosts -------------------------------
from transflow_tpu.config import LayerConfig
from transflow_tpu.flow import Direction
from transflow_tpu.model import FlowTransferModel
from transflow_tpu.parallel.mesh import (frames_spec, pixmap_spec,
                                         state_spec, sharded_scan)

h, w, chunk, n_streams = 32, 64, 2, 2
model = FlowTransferModel(
    h, w, [LayerConfig(0, reset_mode="random", reset_random_factor=0.05)],
    {0: [(3, np.ones((h, w), bool))]},
    method="horn-schunck", estimator_kwargs=dict(max_iters=2, delta=None),
    direction=Direction.BACKWARD, flow_filters="clip=6", halo=8)
rng = np.random.default_rng(0)   # same seed on both hosts
grays_np = rng.integers(0, 256, (n_streams, chunk, h, w), dtype=np.uint8)
first = rng.integers(0, 256, (n_streams, h, w), dtype=np.uint8)
# legacy uint32 keys: they cross the numpy boundary for global
# device_put (typed keys cannot), and jax.random.split accepts both
keys = np.stack([np.asarray(jax.random.PRNGKey(100 + s))
                 for s in range(n_streams)])
state_np = jax.tree.map(
    lambda *xs: np.stack([np.asarray(x) for x in xs]),
    *[model.init_state(first[s]) for s in range(n_streams)])

def put_global(value, spec):
    value = np.asarray(value)
    sh = NamedSharding(mesh, spec)
    arrays = []
    for d in jax.local_devices():
        idx = sh.addressable_devices_indices_map(value.shape)[d]
        arrays.append(jax.device_put(value[idx], d))
    return jax.make_array_from_single_device_arrays(value.shape, sh, arrays)

state = jax.tree.map(
    lambda v: put_global(v, state_spec(np.asarray(v).ndim)), state_np)
grays = put_global(grays_np, frames_spec(grays_np.ndim))
pixmaps_np = model.default_pixmaps()
pixmaps = jax.tree.map(
    lambda v: put_global(np.asarray(v), pixmap_spec(np.asarray(v).ndim)),
    pixmaps_np)
gkeys = put_global(keys, P("stream"))
run = sharded_scan(model, mesh)
with mesh:
    _, rgbs = run(state, grays, pixmaps, jnp.float32(0.0), gkeys)

# single-device oracle (computed identically on both hosts)
single = FlowTransferModel(
    h, w, [LayerConfig(0, reset_mode="random", reset_random_factor=0.05)],
    {0: [(3, np.ones((h, w), bool))]},
    method="horn-schunck", estimator_kwargs=dict(max_iters=2, delta=None),
    direction=Direction.BACKWARD, flow_filters="clip=6")
expected = []
for s in range(n_streams):
    st = single.init_state(first[s])
    _, r = single.jit_scan(st, jnp.asarray(grays_np[s]),
                           single.default_pixmaps(), jnp.float32(0.0),
                           jnp.asarray(keys[s]))
    expected.append(np.asarray(r))
expected = np.stack(expected)
for shard in rgbs.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data),
                                  expected[shard.index])

# ---- sharded Pallas correlation across the distributed runtime ----------
# shard_map + boundary-row ppermutes over the global 'space' axis (the
# --mesh liteflownet kernel routing); stream-replicated operands. Must
# match the single-device kernel on every host's shards at f32 rounding
# (the backend may retile the channel reduction per band shape).
from transflow_tpu.ops.pallas_correlation import (pallas_correlation7x7,
                                                  sharded_pallas_correlation7x7)
crng = np.random.default_rng(7)  # same seed on both hosts
f1_np = crng.standard_normal((64, 48, 16)).astype(np.float32)
f2_np = crng.standard_normal((64, 48, 16)).astype(np.float32)
f1 = put_global(f1_np, P("space", None, None))
f2 = put_global(f2_np, P("space", None, None))
corr = sharded_pallas_correlation7x7(f1, f2, mesh, stride=2, interpret=True)
corr_want = np.asarray(pallas_correlation7x7(
    jnp.asarray(f1_np), jnp.asarray(f2_np), stride=2, interpret=True))
for shard in corr.addressable_shards:
    np.testing.assert_allclose(np.asarray(shard.data),
                               corr_want[shard.index], rtol=0, atol=2e-7)
print(f"proc {proc_id} ok", flush=True)
"""


def _free_port():
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        return probe.getsockname()[1]


def test_two_process_global_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace('__REPO__', repr(REPO)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS")}
    env["PYTHONPATH"] = REPO
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outputs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=150)
            outputs.append(out)
    finally:
        for proc in procs:
            proc.kill()
    for i, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} ok" in out
