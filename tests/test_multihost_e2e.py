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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# isolate from the ambient TPU plugin: a dead tunnel must not hang the test
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                           num_processes=2, process_id=proc_id)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from transflow_tpu.parallel.multihost import make_global_mesh

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
mesh = make_global_mesh(space_axis=4)
assert dict(mesh.shape) == {{"stream": 2, "space": 4}}, dict(mesh.shape)
# every 'space' row must stay on one host (ICI rule)
grid = np.asarray(mesh.devices)
for row in grid:
    hosts = {{d.process_index for d in row}}
    assert len(hosts) == 1, f"space row crosses hosts: {{hosts}}"

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
print(f"proc {{proc_id}} ok", flush=True)
"""


def _free_port():
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        return probe.getsockname()[1]


def test_two_process_global_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=REPO))
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
