"""Multi-host mesh arithmetic (pure host math, fake device lists).

The DCN layout rule (parallel/multihost.py): the ``space`` axis must divide
the per-host device count so halo exchanges ride ICI; hosts multiply into
``stream``. These tests exercise the reshape/axis arithmetic without any
multi-host hardware.
"""
import numpy as np
import jax
import pytest

from transflow_tpu.parallel.multihost import (global_mesh_grid,
                                              make_global_mesh)


def test_default_space_axis_is_per_host():
    # 4 hosts x 8 devices, default space axis: hosts become streams
    assert global_mesh_grid(32, 8) == (4, 8)


def test_space_subdivides_host():
    # space=4 on 8-device hosts: 2 stream groups per host
    assert global_mesh_grid(32, 8, space_axis=4) == (8, 4)
    assert global_mesh_grid(8, 8, space_axis=2) == (4, 2)
    assert global_mesh_grid(8, 8, space_axis=1) == (8, 1)


def test_space_crossing_host_boundary_rejected():
    # space=16 would need halo exchange across two 8-device hosts -> DCN
    with pytest.raises(ValueError, match="ICI"):
        global_mesh_grid(32, 8, space_axis=16)
    with pytest.raises(ValueError, match="ICI"):
        global_mesh_grid(8, 8, space_axis=3)


def test_space_must_divide_global_count():
    with pytest.raises(ValueError):
        global_mesh_grid(12, 8, space_axis=8)


def test_host_major_stream_assignment():
    """With a host-major device list, each mesh row (one stream) must sit
    entirely on one host — cross-stream traffic is the only thing allowed
    to touch DCN."""
    devices = jax.devices()
    assert len(devices) >= 8
    # pretend: 2 hosts x 4 devices, host-major order
    mesh = make_global_mesh(space_axis=4, devices=devices[:8], per_host=4)
    assert mesh.axis_names == ("stream", "space")
    assert dict(mesh.shape) == {"stream": 2, "space": 4}
    grid = np.asarray(mesh.devices)
    for row in grid:
        host_of = [devices.index(d) // 4 for d in row]
        assert len(set(host_of)) == 1, "a space row crossed a host boundary"


def test_live_topology_default():
    # under conftest's forced 8-CPU platform this is a single 'host'
    mesh = make_global_mesh()
    assert mesh.axis_names == ("stream", "space")
    total = np.prod(list(mesh.shape.values()))
    assert total == len(jax.devices())
