"""Multi-device sharding: compiles on an 8-device CPU mesh and matches the
single-device result exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transflow_tpu.config import LayerConfig
from transflow_tpu.flow import Direction
from transflow_tpu.model import FlowTransferModel
from transflow_tpu.parallel import make_mesh, shard_model_inputs, sharded_scan


@pytest.fixture(scope="module")
def model():
    return FlowTransferModel(
        32, 128, [LayerConfig(0, reset_mode="random",
                              reset_random_factor=0.05)],
        {0: [(3, np.ones((32, 128), bool))]},
        method="horn-schunck",
        estimator_kwargs=dict(max_iters=2, delta=None),
        direction=Direction.BACKWARD)


def test_dryrun_entry():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    state, rgb = jax.jit(fn)(*args)
    assert rgb.shape == (64, 96, 3)
    __graft_entry__.dryrun_multichip(8)


def test_sharded_matches_single_device(model):
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(0)
    n_streams, chunk = 2, 4
    grays_np = rng.integers(0, 256, (n_streams, chunk, 32, 128),
                            dtype=np.uint8)
    first = rng.integers(0, 256, (n_streams, 32, 128), dtype=np.uint8)
    pixmaps = model.default_pixmaps()
    keys = jax.random.split(jax.random.key(7), n_streams)

    # single-device reference: per-stream python loop
    expected = []
    for s in range(n_streams):
        state = model.init_state(first[s])
        _, rgbs = model.jit_scan(state, jnp.asarray(grays_np[s]), pixmaps,
                                 jnp.float32(0.0), keys[s])
        expected.append(np.asarray(rgbs))
    expected = np.stack(expected)

    mesh = make_mesh(8)
    state = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[model.init_state(first[s]) for s in range(n_streams)])
    state, grays, pixmaps_sharded, keys_sharded = shard_model_inputs(
        mesh, state, jnp.asarray(grays_np), pixmaps, keys)
    run = sharded_scan(model, mesh)
    with mesh:
        _, rgbs = run(state, grays, pixmaps_sharded, jnp.float32(0.0),
                      keys_sharded)
    np.testing.assert_array_equal(np.asarray(rgbs), expected)


def test_sharded_multi_layer_all_classes():
    """Sharded parity for the full layer-class matrix: a static background,
    a sum layer, and an introduction layer (8 state channels, per-source
    masks) composited together — bit-exact vs single-device."""
    from transflow_tpu.config import LayerConfig
    h, w = 32, 128
    top = np.zeros((h, w), bool); top[:h // 2] = True
    model = FlowTransferModel(
        h, w,
        [LayerConfig(0, classname="static"),
         LayerConfig(1, classname="sum", reset_mode="linear",
                     reset_linear_factor=0.2, mask_alpha="circle:40%"),
         LayerConfig(2, classname="introduction",
                     moving_pixels_leave_empty_spot=True)],
        {0: [(3, np.ones((h, w), bool))],
         1: [(3, top)],
         2: [(4, ~top)]},
        method="horn-schunck",
        estimator_kwargs=dict(max_iters=2, delta=None),
        direction=Direction.BACKWARD)
    rng = np.random.default_rng(9)
    n_streams, chunk = 2, 3
    grays_np = rng.integers(0, 256, (n_streams, chunk, h, w), dtype=np.uint8)
    first = rng.integers(0, 256, (n_streams, h, w), dtype=np.uint8)
    pixmaps = model.default_pixmaps(seed=3)
    keys = jax.random.split(jax.random.key(11), n_streams)

    expected = []
    for s in range(n_streams):
        state = model.init_state(first[s])
        _, rgbs = model.jit_scan(state, jnp.asarray(grays_np[s]), pixmaps,
                                 jnp.float32(0.0), keys[s])
        expected.append(np.asarray(rgbs))
    expected = np.stack(expected)

    mesh = make_mesh(8)
    state = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[model.init_state(first[s]) for s in range(n_streams)])
    state, grays, pixmaps_sharded, keys_sharded = shard_model_inputs(
        mesh, state, jnp.asarray(grays_np), pixmaps, keys)
    run = sharded_scan(model, mesh)
    with mesh:
        _, rgbs = run(state, grays, pixmaps_sharded, jnp.float32(0.0),
                      keys_sharded)
    np.testing.assert_array_equal(np.asarray(rgbs), expected)


def test_sharded_liteflownet_compiles_and_matches(monkeypatch):
    """The CNN estimator under the stream x space mesh: every op in the
    pyramid (convs, phase upsamplers, fused regularization shifts, XLA
    correlation — the mesh-safe kernel choice, see
    engine.mesh_safe_estimator_kwargs) must partition under GSPMD with
    halo exchanges at shard boundaries. Random weights give near-zero
    flow, so the value here is compile+execute coverage plus closeness:
    spatial means inside Regularization reduce across shards, so
    bit-exactness is not guaranteed — assert the rendered frames agree on
    essentially every pixel instead."""
    monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_RANDOM", "1")
    h, w = 32, 128
    model = FlowTransferModel(
        h, w, [LayerConfig(0)],
        {0: [(3, np.ones((h, w), bool))]},
        method="liteflownet",
        estimator_kwargs=dict(corr_kernel="xla", warp_bound=0),
        direction=Direction.BACKWARD)
    rng = np.random.default_rng(3)
    n_streams, chunk = 2, 2
    grays_np = rng.integers(0, 256, (n_streams, chunk, h, w), dtype=np.uint8)
    first = rng.integers(0, 256, (n_streams, h, w), dtype=np.uint8)
    pixmaps = model.default_pixmaps()
    keys = jax.random.split(jax.random.key(5), n_streams)

    expected = []
    for s in range(n_streams):
        state = model.init_state(first[s])
        _, rgbs = model.jit_scan(state, jnp.asarray(grays_np[s]), pixmaps,
                                 jnp.float32(0.0), keys[s])
        expected.append(np.asarray(rgbs))
    expected = np.stack(expected)

    mesh = make_mesh(8)
    state = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[model.init_state(first[s]) for s in range(n_streams)])
    state, grays, pixmaps_sharded, keys_sharded = shard_model_inputs(
        mesh, state, jnp.asarray(grays_np), pixmaps, keys)
    run = sharded_scan(model, mesh)
    with mesh:
        _, rgbs = run(state, grays, pixmaps_sharded, jnp.float32(0.0),
                      keys_sharded)
    got = np.asarray(rgbs)
    assert got.shape == expected.shape
    match = (got == expected).mean()
    assert match > 0.999, f"sharded CNN output diverged: match={match:.5f}"
