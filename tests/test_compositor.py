"""Golden semantics tests for the compositor core.

The first block mirrors the reference's own deterministic mapping assertions
(reference tests/test_compositor.py); the second block property-tests the
movement kernel against a straight numpy oracle implementing the reference's
sequential scatter semantics (transflow/compositor/layers/movement.py:25-60).
"""
import jax
import jax.numpy as jnp
import numpy as np

from transflow_tpu.compositor import Compositor
from transflow_tpu.compositor.core import (
    LayerParams, init_layer_state, render_layer, update_introduction,
    update_moveref, update_static, update_sum)
from transflow_tpu.config import LayerConfig

KEY = jax.random.PRNGKey(0)


def make_params(cfg, h, w, sources=()):
    intro_masks = [m for _, m in sources]
    channels = [c for c, _ in sources]
    return LayerParams(cfg, h, w, intro_masks, channels)


def small_flow():
    # flow[0,0] and flow[0,1] = (dx=0, dy=1): those cells pull from the row below
    return jnp.asarray(
        [[[0, 1], [0, 1], [0, 0]], [[0, 0], [0, 0], [0, 0]]],
        dtype=jnp.float32)


class TestGolden:
    """Mirrors reference tests/test_compositor.py assertions."""

    def test_background(self):
        comp = Compositor(1, 1, [], {}, background_color="#ff8000")
        rgb = comp.render()
        assert rgb.shape == (1, 1, 3)
        assert rgb.dtype == np.uint8
        assert tuple(rgb[0, 0]) == (255, 128, 0)

    def test_moveref(self):
        params = make_params(LayerConfig(0), 2, 3)
        state = init_layer_state(params)
        state = update_moveref(params, state, small_flow(), (), KEY)
        assert int(state["pos_i"][0, 0]) == 1
        assert int(state["pos_j"][0, 0]) == 0
        assert int(state["pos_i"][0, 1]) == 1
        assert int(state["pos_j"][0, 1]) == 1

    def test_moveref_reset(self):
        params = make_params(
            LayerConfig(0, reset_mode="random", reset_random_factor=1), 2, 3)
        state = init_layer_state(params)
        state = update_moveref(params, state, small_flow(), (), KEY)
        assert int(state["pos_i"][0, 0]) == 0
        assert int(state["pos_j"][0, 0]) == 0
        assert int(state["pos_i"][0, 1]) == 0
        assert int(state["pos_j"][0, 1]) == 1

    def test_moveref_reset_mask(self):
        params = make_params(
            LayerConfig(0, reset_mode="random", reset_random_factor=1,
                        reset_mask="border-left:1"), 2, 3)
        state = init_layer_state(params)
        state = update_moveref(params, state, small_flow(), (), KEY)
        assert int(state["pos_i"][0, 0]) == 0
        assert int(state["pos_j"][0, 0]) == 0
        assert int(state["pos_i"][0, 1]) == 1
        assert int(state["pos_j"][0, 1]) == 1

    def test_static_smoke(self):
        params = make_params(LayerConfig(0, classname="static"), 2, 3)
        state = init_layer_state(params)
        state = update_static(params, state, small_flow(), (), KEY)
        _, rgba = render_layer(params, state)
        assert rgba.shape == (2, 3, 4)

    def test_sum_smoke(self):
        params = make_params(LayerConfig(0, classname="sum"), 2, 3)
        state = init_layer_state(params)
        state = update_sum(params, state, small_flow(), (), KEY)
        # dy=1 at (0,0): pos_i accumulates the y component (intended
        # semantics; the reference transposes here — documented deviation)
        assert int(state["pos_i"][0, 0]) == 1

    def test_introduction_smoke(self):
        params = make_params(LayerConfig(0, classname="introduction"), 2, 3)
        state = init_layer_state(params)
        state = update_introduction(params, state, small_flow(), (), KEY, ())
        assert bool(state["introduced_once"])


class TestRendering:

    def test_moveref_gather(self):
        mask = np.ones((2, 3), dtype=bool)
        params = make_params(LayerConfig(0), 2, 3, sources=[(3, mask)])
        state = init_layer_state(params)
        pixmap = jnp.arange(2 * 3 * 3, dtype=jnp.uint8).reshape(2, 3, 3)
        state = update_moveref(params, state, small_flow(), (pixmap,), KEY)
        _, rgba = render_layer(params, state)
        # cell (0,0) maps to pixmap (1,0); cell (2nd row) identity
        np.testing.assert_array_equal(np.asarray(rgba[0, 0, :3]),
                                      np.asarray(pixmap[1, 0]))
        np.testing.assert_array_equal(np.asarray(rgba[1, 2, :3]),
                                      np.asarray(pixmap[1, 2]))
        assert np.all(np.asarray(rgba[..., 3]) == 1)

    def test_composite_overwrite(self):
        mask = np.ones((2, 2), dtype=bool)
        comp = Compositor(2, 2, [LayerConfig(0)],
                          {0: [(3, mask)]}, background_color="#000000")
        pixmap = np.full((2, 2, 3), 200, dtype=np.uint8)
        comp.set_pixmap(0, 0, pixmap)
        comp.update(np.zeros((2, 2, 2), dtype=np.float32))
        rgb = comp.render()
        assert np.all(rgb == 200)

    def test_mask_alpha_hides_layer(self):
        mask = np.ones((2, 2), dtype=bool)
        comp = Compositor(2, 2, [LayerConfig(0, mask_alpha="zeros")],
                          {0: [(3, mask)]}, background_color="#010203")
        comp.set_pixmap(0, 0, np.full((2, 2, 3), 200, dtype=np.uint8))
        comp.update(np.zeros((2, 2, 2), dtype=np.float32))
        rgb = comp.render()
        assert np.all(rgb == np.array([1, 2, 3]))


# ---------------------------------------------------------------------------
# numpy oracle for the reference's sequential movement semantics
# ---------------------------------------------------------------------------

def oracle_move(cfg: LayerConfig, pos, alpha, source, flow,
                mask_src=None, mask_dst=None):
    """Reference movement semantics, straight numpy, sequential scatters."""
    h, w = alpha.shape
    n = h * w
    flow_int = np.round(flow).astype(np.int64)
    flow_flat = (flow_int[..., 1] * w + flow_int[..., 0]).ravel()
    shift = np.arange(n) + flow_flat
    shift_c = np.clip(shift, 0, n - 1)
    msrc = np.ones((h, w), bool) if mask_src is None else mask_src.copy()
    if cfg.transparent_pixels_can_move:
        src_filled = (alpha != 0).ravel()[shift_c].reshape(h, w)
    else:
        msrc[alpha == 0] = 0
        src_filled = None
    msrc = msrc.ravel()[shift_c].reshape(h, w)
    mdst = np.ones((h, w), bool) if mask_dst is None else mask_dst.copy()
    if not cfg.pixels_can_move_to_empty_spot:
        mdst[alpha == 0] = 0
    if not cfg.pixels_can_move_to_filled_spot:
        mdst[alpha != 0] = 0
    mask_all = (msrc.ravel() & mdst.ravel())
    where_target = np.nonzero((flow_flat != 0) & mask_all)[0]
    where_source = np.clip(where_target + flow_flat[where_target], 0, n - 1)
    data = np.stack([pos[..., 0].ravel(), pos[..., 1].ravel(),
                     alpha.ravel(), source.ravel()], axis=1)
    new = data.copy()
    new[where_target] = data[where_source]
    if cfg.moving_pixels_leave_empty_spot:
        new[where_source, 2] = 0
    if cfg.transparent_pixels_can_move:
        filled_targets = where_target[src_filled.ravel()[where_target]]
        new[filled_targets, 2] = 1
    else:
        new[where_target, 2] = 1
    return (new[:, :2].reshape(h, w, 2), new[:, 2].reshape(h, w),
            new[:, 3].reshape(h, w))


def run_movement_case(cfg, rng, h=13, w=17):
    # random in-bounds flow (as post_process guarantees)
    ii = np.arange(h)[:, None] * np.ones((1, w), int)
    jj = np.ones((h, 1), int) * np.arange(w)[None, :]
    dx = rng.integers(-3, 4, size=(h, w))
    dy = rng.integers(-3, 4, size=(h, w))
    dx = np.clip(dx, -jj, w - 1 - jj)
    dy = np.clip(dy, -ii, h - 1 - ii)
    flow = np.stack([dx, dy], axis=-1).astype(np.float32)
    alpha0 = rng.integers(0, 2, size=(h, w)).astype(np.int32)
    source0 = rng.integers(0, 3, size=(h, w)).astype(np.int32)
    pos0 = np.stack([ii, jj], axis=-1).astype(np.int32)
    mask_src = rng.random((h, w)) < 0.8
    mask_dst = rng.random((h, w)) < 0.8

    exp_pos, exp_alpha, exp_source = oracle_move(
        cfg, pos0, alpha0, source0, flow, mask_src, mask_dst)

    params = LayerParams(cfg, h, w, [], [])
    params.mask_src = jnp.asarray(mask_src)
    params.mask_dst = jnp.asarray(mask_dst)
    state = {
        "pos_i": jnp.asarray(pos0[..., 0]),
        "pos_j": jnp.asarray(pos0[..., 1]),
        "alpha": jnp.asarray(alpha0),
        "source": jnp.asarray(source0),
        "rgba": jnp.zeros((h, w, 4), dtype=jnp.uint8),
    }
    state = update_moveref(params, state, jnp.asarray(flow), (), KEY)
    np.testing.assert_array_equal(np.asarray(state["pos_i"]), exp_pos[..., 0])
    np.testing.assert_array_equal(np.asarray(state["pos_j"]), exp_pos[..., 1])
    np.testing.assert_array_equal(np.asarray(state["alpha"]), exp_alpha)
    np.testing.assert_array_equal(np.asarray(state["source"]), exp_source)


class TestMovementVsOracle:

    def test_default_flags(self):
        rng = np.random.default_rng(1)
        for _ in range(3):
            run_movement_case(LayerConfig(0), rng)

    def test_leave_empty(self):
        rng = np.random.default_rng(2)
        run_movement_case(
            LayerConfig(0, moving_pixels_leave_empty_spot=True), rng)

    def test_no_move_to_filled(self):
        rng = np.random.default_rng(3)
        run_movement_case(
            LayerConfig(0, pixels_can_move_to_filled_spot=False), rng)

    def test_no_move_to_empty(self):
        rng = np.random.default_rng(4)
        run_movement_case(
            LayerConfig(0, pixels_can_move_to_empty_spot=False), rng)

    def test_transparent_can_move(self):
        rng = np.random.default_rng(5)
        run_movement_case(
            LayerConfig(0, transparent_pixels_can_move=True), rng)

    def test_transparent_and_leave_empty(self):
        rng = np.random.default_rng(6)
        run_movement_case(
            LayerConfig(0, transparent_pixels_can_move=True,
                        moving_pixels_leave_empty_spot=True), rng)


class TestResetModes:

    def test_constant_step(self):
        params = make_params(
            LayerConfig(0, reset_mode="constant", reset_constant_step=1), 1, 5)
        state = init_layer_state(params)
        # displace cell (0,0) mapping far away: pos_j = 4
        state["pos_j"] = state["pos_j"].at[0, 0].set(4)
        flow = jnp.zeros((1, 5, 2), dtype=jnp.float32)
        state = update_moveref(params, state, flow, (), KEY)
        # one step back toward base (0,0): 4 -> 3
        assert int(state["pos_j"][0, 0]) == 3
        for _ in range(10):
            state = update_moveref(params, state, flow, (), KEY)
        assert int(state["pos_j"][0, 0]) == 0  # no overshoot, converges

    def test_linear_relaxation(self):
        params = make_params(
            LayerConfig(0, reset_mode="linear", reset_linear_factor=0.5),
            1, 9)
        state = init_layer_state(params)
        state["pos_j"] = state["pos_j"].at[0, 0].set(8)
        flow = jnp.zeros((1, 9, 2), dtype=jnp.float32)
        state = update_moveref(params, state, flow, (), KEY)
        assert int(state["pos_j"][0, 0]) == 4  # 8 + round(0.5 * (0-8))


def oracle_introduction(cfg: LayerConfig, state, flow, pixmap, intro_mask,
                        frame_number, introduced_once):
    """Intended introduction semantics (reference introduction.py:20-59 with
    its `numpy.where(x) == 0` no-op bugs fixed), straight numpy."""
    h, w = state["alpha"].shape
    # movement of all channels
    flow_int = np.round(flow).astype(np.int64)
    di, dj = flow_int[..., 1], flow_int[..., 0]
    moving = (di != 0) | (dj != 0)
    ii = np.arange(h)[:, None] * np.ones((1, w), int)
    jj = np.ones((h, 1), int) * np.arange(w)[None, :]
    si = np.clip(ii + di, 0, h - 1)
    sj = np.clip(jj + dj, 0, w - 1)
    filled0 = state["alpha"] != 0
    tgt = moving & filled0[si, sj]
    out = {}
    for key in ("rgb", "alpha", "source", "pos_i", "pos_j", "frame"):
        v = state[key]
        sel = tgt[..., None] if v.ndim == 3 else tgt
        out[key] = np.where(sel, v[si, sj], v)
    out["alpha"] = np.where(tgt, 1, out["alpha"])
    # introduction eligibility
    filled = out["alpha"] != 0
    mask = np.ones((h, w), bool)
    if not cfg.introduce_pixels_on_empty_spots:
        mask &= filled
    if not cfg.introduce_pixels_on_filled_spots:
        mask &= ~filled
    if not cfg.introduce_moving_pixels:
        mask &= ~moving
    if not cfg.introduce_unmoving_pixels:
        mask &= moving
    consider = not (cfg.introduce_on_all_filled_spots
                    or cfg.introduce_on_all_empty_spots)
    if cfg.introduce_on_all_filled_spots:
        mask |= filled
    if cfg.introduce_on_all_empty_spots:
        mask |= ~filled
    if cfg.introduce_once and introduced_once:
        mask &= False
    tgt2 = mask & intro_mask
    gi, gj = (si, sj) if consider else (ii, jj)
    out["rgb"] = np.where(tgt2[..., None], pixmap[gi, gj], out["rgb"])
    out["alpha"] = np.where(tgt2, 1, out["alpha"])
    out["source"] = np.where(tgt2, 0, out["source"])
    out["pos_i"] = np.where(tgt2, gi, out["pos_i"])
    out["pos_j"] = np.where(tgt2, gj, out["pos_j"])
    out["frame"] = np.where(tgt2, frame_number, out["frame"])
    return out


class TestIntroductionVsOracle:

    def _run(self, cfg, seed):
        rng = np.random.default_rng(seed)
        h, w = 11, 13
        ii = np.arange(h)[:, None] * np.ones((1, w), int)
        jj = np.ones((h, 1), int) * np.arange(w)[None, :]
        dx = np.clip(rng.integers(-2, 3, (h, w)), -jj, w - 1 - jj)
        dy = np.clip(rng.integers(-2, 3, (h, w)), -ii, h - 1 - ii)
        flow = np.stack([dx, dy], -1).astype(np.float32)
        intro_mask = rng.random((h, w)) < 0.7
        pixmap = rng.integers(0, 256, (h, w, 3), np.uint8)
        state_np = {
            "rgb": rng.integers(0, 256, (h, w, 3), np.uint8),
            "alpha": rng.integers(0, 2, (h, w)).astype(np.int32),
            "source": np.zeros((h, w), np.int32),
            "pos_i": rng.integers(0, h, (h, w)).astype(np.int32),
            "pos_j": rng.integers(0, w, (h, w)).astype(np.int32),
            "frame": np.zeros((h, w), np.int32),
        }
        expected = oracle_introduction(cfg, state_np, flow, pixmap,
                                       intro_mask, 4, False)
        params = LayerParams(cfg, h, w, [intro_mask], [3])
        state = {k: jnp.asarray(v) for k, v in state_np.items()}
        state["introduced_once"] = jnp.zeros((), jnp.bool_)
        got = update_introduction(params, state, jnp.asarray(flow),
                                  (jnp.asarray(pixmap),), KEY, (4,))
        for key, exp in expected.items():
            np.testing.assert_array_equal(np.asarray(got[key]), exp, err_msg=key)
        assert bool(got["introduced_once"])

    def test_default(self):
        self._run(LayerConfig(0, classname="introduction"), 1)

    def test_only_empty(self):
        self._run(LayerConfig(0, classname="introduction",
                              introduce_pixels_on_filled_spots=False), 2)

    def test_only_unmoving(self):
        self._run(LayerConfig(0, classname="introduction",
                              introduce_moving_pixels=False), 3)

    def test_force_all_filled(self):
        self._run(LayerConfig(0, classname="introduction",
                              introduce_on_all_filled_spots=True), 4)


class TestRgbaPixmaps:

    def test_four_channel_pixmap_alpha(self):
        """4-channel pixmaps copy their alpha through the mapping
        (reference.py:100-103)."""
        h, w = 4, 6
        mask = np.ones((h, w), dtype=bool)
        params = make_params(LayerConfig(0), h, w, sources=[(4, mask)])
        state = init_layer_state(params)
        pixmap = np.zeros((h, w, 4), np.uint8)
        pixmap[..., :3] = 77
        pixmap[:, :3, 3] = 255  # left half opaque, right half transparent
        state = update_moveref(params, state,
                               jnp.zeros((h, w, 2), jnp.float32),
                               (jnp.asarray(pixmap),), KEY)
        _, rgba = render_layer(params, state)
        rgba = np.asarray(rgba)
        assert np.all(rgba[:, :3, 3] == 255)
        assert np.all(rgba[:, 3:, 3] == 0)

    def test_checkpoint_roundtrip_introduction(self):
        """Engine state arrays round-trip for introduction layers too."""
        from transflow_tpu.config import Config, PixmapSourceConfig
        from transflow_tpu.engine import Engine
        from transflow_tpu.flow.sources.base import FlowSource
        from transflow_tpu.compositor.core import make_layer_params

        class DummySource(FlowSource):
            yields_frames = False

        cfg = Config("dummy.flow.zip",
                     pixmap_sources=[PixmapSourceConfig("noise")],
                     layers=[LayerConfig(0, classname="introduction")],
                     seed=1)
        h, w = 6, 8
        params = make_layer_params(
            cfg.layers, h, w, {0: [(3, np.ones((h, w), bool))]})
        src = DummySource()
        src.width, src.height = w, h
        engine = Engine(cfg, [src], params, h, w)
        arrays = engine.state_arrays()
        assert "layer0.introduced_once" in arrays
        assert "rng_key" in arrays
        engine2 = Engine(cfg, [src], params, h, w)
        engine2.load_state_arrays(arrays)
        for key, value in engine2.state_arrays().items():
            np.testing.assert_array_equal(value, arrays[key], err_msg=key)


class TestBytepack:
    """pack/unpack must round-trip every carry dtype bit-exactly, and a
    gather of the pack must equal per-plane gathers (the packed-movement
    reformulation's correctness contract)."""

    def test_roundtrip_and_gathered_equality(self):
        import jax.numpy as jnp
        from transflow_tpu.ops.bytepack import pack_planes, unpack_planes
        rng = np.random.default_rng(0)
        h, w = 13, 17
        planes = [
            rng.integers(0, 2, (h, w)).astype(bool),
            rng.integers(0, 256, (h, w), dtype=np.uint8),
            rng.integers(-300, 300, (h, w)).astype(np.int16),
            rng.integers(-2**30, 2**30, (h, w), dtype=np.int32),
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
            rng.standard_normal((h, w, 2)).astype(np.float32),
            rng.integers(0, 2, (h, w, 3)).astype(bool),
        ]
        jplanes = [jnp.asarray(p) for p in planes]
        packed, spec = pack_planes(jplanes)
        assert packed.dtype == jnp.uint8
        for got, want in zip(unpack_planes(packed, spec), planes):
            assert str(got.dtype) == str(want.dtype)
            np.testing.assert_array_equal(np.asarray(got), want)
        # gathered pack == per-plane gather
        si = jnp.asarray(rng.integers(0, h, (h, w)), jnp.int32)
        sj = jnp.asarray(rng.integers(0, w, (h, w)), jnp.int32)
        got = unpack_planes(packed[si, sj], spec)
        for g, p in zip(got, jplanes):
            np.testing.assert_array_equal(np.asarray(g),
                                          np.asarray(p[si, sj]))
