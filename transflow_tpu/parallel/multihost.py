"""Multi-host (DCN) scale-out helpers.

BASELINE.json's stretch configuration runs the pipeline across hosts. The
layout keeps ALL intra-frame communication on ICI: the ``space`` axis (H
sharding, halo exchanges) must never cross a host boundary, so the global
mesh is built host-major — hosts multiply the ``stream`` axis (independent
video streams, zero cross-stream communication, so DCN only carries input
frames and results).

Exercised end-to-end in CI by tests/test_multihost_e2e.py: two coordinated
jax.distributed CPU processes build this global mesh (space rows pinned per
host) and run the full sharded pipeline step bit-exact vs single-device.
The mesh arithmetic is additionally unit-tested with fake device lists
(tests/test_multihost.py).
"""
import jax
import numpy as np

from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """jax.distributed bring-up (no-op when already initialized or when
    env-configured through JAX_COORDINATOR_ADDRESS etc.)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def global_mesh_grid(n_devices: int, per_host: int,
                     space_axis: int | None = None) -> tuple[int, int]:
    """(stream, space) grid shape for ``n_devices`` across hosts of
    ``per_host`` devices each. Pure arithmetic, unit-testable without
    hardware: ``space`` must divide the per-host device count so halo
    collectives ride ICI; everything else — including the host dimension,
    which is the leading factor of a host-major device list — multiplies
    into ``stream``."""
    if space_axis is None:
        space_axis = per_host
    if per_host % space_axis:
        raise ValueError(
            f"space axis {space_axis} must divide the per-host device "
            f"count {per_host} (halo exchange must ride ICI, not DCN)")
    if n_devices % space_axis:
        raise ValueError(
            f"space axis {space_axis} must divide the global device "
            f"count {n_devices}")
    return n_devices // space_axis, space_axis


def make_global_mesh(space_axis: int | None = None,
                     devices=None, per_host: int | None = None) -> Mesh:
    """('stream', 'space') mesh over every device of every host.

    ``space_axis`` devices shard H (must divide the per-host device count so
    halo collectives stay on ICI); the remaining factor — including the
    host dimension — is stream parallelism. ``devices``/``per_host``
    default to the live topology (overridable for tests)."""
    devices = np.asarray(jax.devices() if devices is None else devices)
    if per_host is None:
        per_host = jax.local_device_count()
    n_streams, n_space = global_mesh_grid(len(devices), per_host, space_axis)
    grid = devices.reshape(n_streams, n_space)
    return Mesh(grid, axis_names=("stream", "space"))
