"""Multi-host (DCN) scale-out helpers.

BASELINE.json's stretch configuration runs the pipeline across hosts. The
layout keeps ALL intra-frame communication on ICI: the ``space`` axis (H
sharding, halo exchanges) must never cross a host boundary, so the global
mesh is built host-major — hosts multiply the ``stream`` axis (independent
video streams, zero cross-stream communication, so DCN only carries input
frames and results).

This module cannot be exercised in the single-host CI environment; it is
the documented, tested-shape code path for deployments.
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


def make_global_mesh(space_axis: int | None = None) -> Mesh:
    """('stream', 'space') mesh over every device of every host.

    ``space_axis`` devices shard H (must divide the per-host device count so
    halo collectives stay on ICI); the remaining factor — including the
    host dimension — is stream parallelism."""
    devices = np.asarray(jax.devices())
    per_host = jax.local_device_count()
    if space_axis is None:
        space_axis = per_host
    if per_host % space_axis:
        raise ValueError(
            f"space axis {space_axis} must divide the per-host device "
            f"count {per_host} (halo exchange must ride ICI, not DCN)")
    grid = devices.reshape(len(devices) // space_axis, space_axis)
    return Mesh(grid, axis_names=("stream", "space"))
