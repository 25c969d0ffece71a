"""Bounded-displacement gather: exactness vs plain gather, halo clamping,
and end-to-end model parity (halo vs plain, sharded vs single-device)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transflow_tpu.ops.halo_gather import bounded_row_gather


def plain(v, src_i, src_j):
    return np.asarray(v)[np.asarray(src_i), np.asarray(src_j)]


class TestBoundedRowGather:

    def test_exact_2d(self):
        rng = np.random.default_rng(0)
        h, w, halo = 24, 32, 5
        v = rng.normal(size=(h, w)).astype(np.float32)
        ii, jj = np.indices((h, w))
        di = rng.integers(-halo, halo + 1, (h, w))
        dj = rng.integers(-9, 10, (h, w))
        src_i = np.clip(ii + di, 0, h - 1).astype(np.int32)
        src_j = np.clip(jj + dj, 0, w - 1).astype(np.int32)
        got = np.asarray(bounded_row_gather(
            jnp.asarray(v), jnp.asarray(src_i), jnp.asarray(src_j), halo))
        np.testing.assert_array_equal(got, plain(v, src_i, src_j))

    def test_exact_3d_channels(self):
        rng = np.random.default_rng(1)
        h, w, c, halo = 16, 20, 3, 4
        v = rng.integers(0, 255, (h, w, c)).astype(np.uint8)
        ii, jj = np.indices((h, w))
        src_i = np.clip(ii + rng.integers(-halo, halo + 1, (h, w)),
                        0, h - 1).astype(np.int32)
        src_j = np.clip(jj + rng.integers(-6, 7, (h, w)),
                        0, w - 1).astype(np.int32)
        got = np.asarray(bounded_row_gather(
            jnp.asarray(v), jnp.asarray(src_i), jnp.asarray(src_j), halo))
        np.testing.assert_array_equal(got, plain(v, src_i, src_j))

    def test_bool_mask(self):
        rng = np.random.default_rng(2)
        h, w, halo = 12, 10, 3
        v = rng.random((h, w)) > 0.5
        ii, jj = np.indices((h, w))
        src_i = np.clip(ii + rng.integers(-halo, halo + 1, (h, w)),
                        0, h - 1).astype(np.int32)
        src_j = jj.astype(np.int32)
        got = np.asarray(bounded_row_gather(
            jnp.asarray(v), jnp.asarray(src_i), jnp.asarray(src_j), halo))
        np.testing.assert_array_equal(got, plain(v, src_i, src_j))

    def test_beyond_halo_clamps(self):
        h, w, halo = 16, 8, 2
        v = jnp.arange(h * w, dtype=jnp.float32).reshape(h, w)
        ii, jj = np.indices((h, w))
        src_i = np.clip(ii + 5, 0, h - 1).astype(np.int32)  # beyond halo
        got = np.asarray(bounded_row_gather(
            v, jnp.asarray(src_i), jnp.asarray(jj.astype(np.int32)), halo))
        clamped_i = np.clip(ii + halo, 0, h - 1)
        np.testing.assert_array_equal(got, plain(np.asarray(v), clamped_i, jj))


class TestModelHaloParity:

    def _model(self, halo):
        """Halo paired with a clip filter (the intended deployment pattern:
        the filter bounds |flow| on-device, making the halo window exact)."""
        from transflow_tpu.config import LayerConfig
        from transflow_tpu.flow import Direction
        from transflow_tpu.model import FlowTransferModel
        return FlowTransferModel(
            32, 64, [LayerConfig(0, reset_mode="random",
                                 reset_random_factor=0.05)],
            {0: [(3, np.ones((32, 64), bool))]},
            method="horn-schunck",
            estimator_kwargs=dict(max_iters=2, delta=None),
            direction=Direction.BACKWARD, flow_filters="clip=6",
            halo=halo)

    def test_halo_matches_plain_gather(self):
        """With halo >= the actual displacement bound the fused step is
        bit-exact vs the plain-gather model."""
        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (5, 32, 64), dtype=np.uint8)
        key = jax.random.key(11)
        outs = []
        for halo in (None, 8):
            model = self._model(halo)
            state = model.init_state(frames[0])
            state, rgbs = model.jit_scan(
                state, jnp.asarray(frames[1:]), pixmaps := model.
                default_pixmaps(), jnp.float32(0.0), key)
            outs.append(np.asarray(rgbs))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_sharded_halo_matches_single_device(self):
        """The halo model under the ('stream','space') mesh reproduces the
        single-device plain-gather result exactly."""
        from transflow_tpu.parallel import (make_mesh, shard_model_inputs,
                                            sharded_scan)
        assert len(jax.devices()) >= 8
        rng = np.random.default_rng(4)
        n_streams, chunk, h, w = 2, 3, 32, 64
        grays = rng.integers(0, 256, (n_streams, chunk, h, w), dtype=np.uint8)
        first = rng.integers(0, 256, (n_streams, h, w), dtype=np.uint8)
        keys = jax.random.split(jax.random.key(5), n_streams)

        plain_model = self._model(None)
        expected = []
        for s in range(n_streams):
            state = plain_model.init_state(first[s])
            _, rgbs = plain_model.jit_scan(
                state, jnp.asarray(grays[s]), plain_model.default_pixmaps(),
                jnp.float32(0.0), keys[s])
            expected.append(np.asarray(rgbs))
        expected = np.stack(expected)

        halo_model = self._model(8)
        mesh = make_mesh(8)
        state = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[halo_model.init_state(first[s]) for s in range(n_streams)])
        st, gr, pixmaps, ks = shard_model_inputs(
            mesh, state, jnp.asarray(grays), halo_model.default_pixmaps(),
            keys)
        run = sharded_scan(halo_model, mesh)
        with mesh:
            _, rgbs = run(st, gr, pixmaps, jnp.float32(0.0), ks)
        np.testing.assert_array_equal(np.asarray(rgbs), expected)


class TestHaloFlagMatrix:
    """halo vs plain gather across the movement/introduction flag matrix —
    every src_read call site must agree when |flow| <= halo."""

    @pytest.mark.parametrize("flags", [
        dict(transparent_pixels_can_move=True),
        dict(pixels_can_move_to_empty_spot=False),
        dict(pixels_can_move_to_filled_spot=False),
        dict(moving_pixels_leave_empty_spot=True),
        dict(mask_src="border-left:50%", mask_dst="circle:40%"),
    ])
    def test_moveref_flags(self, flags):
        from transflow_tpu.compositor.core import (build_compositor,
                                                   make_layer_params)
        from transflow_tpu.config import LayerConfig
        h, w = 24, 48
        rng = np.random.default_rng(17)
        flow = np.zeros((h, w, 2), np.float32)
        flow[4:20, 8:40] = rng.integers(-3, 4, (16, 32, 2))
        pixmap = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        outs = []
        for halo in (None, 4):
            cfg = LayerConfig(0, reset_mode="random",
                              reset_random_factor=0.1, **flags)
            params = make_layer_params([cfg], h, w,
                                       {0: [(3, np.ones((h, w), bool))]})
            init_fn, step = build_compositor(params, h, w, halo=halo)
            state = init_fn()
            key = jax.random.key(3)
            pixmaps = ((jnp.asarray(pixmap),),)
            frames = ((jnp.int32(0),),)
            for t in range(3):
                key, sub = jax.random.split(key)
                state = step.update(state, jnp.asarray(flow), pixmaps, sub,
                                    frames, params)
            state, rgb = step.render(state, params)
            outs.append(np.asarray(rgb))
        np.testing.assert_array_equal(outs[0], outs[1], err_msg=str(flags))

    def test_leave_empty_vacates_clamped_row_with_halo(self):
        """With halo and |dy| > halo the value gather reads the clamped
        row, so the leave-empty scatter must vacate that same clamped row —
        not the true source (advisor round 2: the two were inconsistent)."""
        from transflow_tpu.compositor.core import _movement, make_layer_params
        from transflow_tpu.config import LayerConfig
        h, w, halo = 16, 8, 2
        cfg = LayerConfig(0, moving_pixels_leave_empty_spot=True)
        params = make_layer_params(
            [cfg], h, w, {0: [(3, np.ones((h, w), bool))]})[0]
        flow = np.zeros((h, w, 2), np.float32)
        flow[4, 3, 1] = 5.0  # dy=5 > halo=2: gather reads row 4+2=6
        alpha = jnp.ones((h, w), jnp.int32)
        channels = {"v": jnp.arange(h * w, dtype=jnp.int32).reshape(h, w)}
        out, new_alpha, _ = _movement(
            params, channels, alpha, jnp.asarray(flow), halo=halo)
        assert int(out["v"][4, 3]) == 6 * w + 3   # value from the clamped row
        na = np.asarray(new_alpha)
        assert na[6, 3] == 0                      # clamped source vacated
        assert na[9, 3] == 1                      # true source untouched

    def test_introduction_flags(self):
        from transflow_tpu.compositor.core import (build_compositor,
                                                   make_layer_params)
        from transflow_tpu.config import LayerConfig
        h, w = 24, 48
        rng = np.random.default_rng(23)
        flow = np.zeros((h, w, 2), np.float32)
        flow[4:20, 8:40] = rng.integers(-3, 4, (16, 32, 2))
        pixmap = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        outs = []
        for halo in (None, 4):
            cfg = LayerConfig(0, classname="introduction",
                              moving_pixels_leave_empty_spot=True,
                              introduce_unmoving_pixels=False)
            params = make_layer_params([cfg], h, w,
                                       {0: [(4, np.ones((h, w), bool))]})
            init_fn, step = build_compositor(params, h, w, halo=halo)
            state = init_fn()
            key = jax.random.key(5)
            pixmaps = ((jnp.asarray(pixmap),),)
            frames = ((jnp.int32(0),),)
            for t in range(3):
                key, sub = jax.random.split(key)
                state = step.update(state, jnp.asarray(flow), pixmaps, sub,
                                    frames, params)
            state, rgb = step.render(state, params)
            outs.append(np.asarray(rgb))
        np.testing.assert_array_equal(outs[0], outs[1])


class TestShardedBoundedGather:
    """The manual-SPMD single-local-gather entry must be bit-identical to
    bounded_row_gather (and to the plain gather within the halo) on the
    forced multi-device CPU mesh."""

    def _mesh(self):
        from transflow_tpu.parallel.mesh import make_space_mesh
        n = min(4, len(jax.devices()))
        if n < 2:
            pytest.skip("needs a multi-device mesh")
        return make_space_mesh(n), n

    def test_bit_exact_vs_row_gather(self):
        from transflow_tpu.ops.halo_gather import sharded_bounded_gather
        mesh, n = self._mesh()
        rng = np.random.default_rng(1)
        h, w, halo = 8 * n, 32, 3
        ii, jj = np.indices((h, w))
        src_i = np.clip(ii + rng.integers(-halo, halo + 1, (h, w)),
                        0, h - 1).astype(np.int32)
        src_j = np.clip(jj + rng.integers(-7, 8, (h, w)),
                        0, w - 1).astype(np.int32)
        for shape in ((h, w), (h, w, 6)):
            v = rng.integers(0, 256, shape).astype(np.uint8)
            want = np.asarray(bounded_row_gather(
                jnp.asarray(v), jnp.asarray(src_i), jnp.asarray(src_j),
                halo))
            with mesh:
                got = np.asarray(sharded_bounded_gather(
                    jnp.asarray(v), jnp.asarray(src_i), jnp.asarray(src_j),
                    halo, mesh))
            np.testing.assert_array_equal(got, want, err_msg=str(shape))
            # within the halo the plain gather agrees too
            np.testing.assert_array_equal(got, plain(v, src_i, src_j))

    def test_model_step_matches_meshless(self):
        import sys
        sys.path.insert(0, ".")
        from __graft_entry__ import _make_model
        mesh, n = self._mesh()
        h, w = 8 * n, 64
        rng = np.random.default_rng(2)
        gray0 = rng.integers(0, 256, (h, w), dtype=np.uint8)
        grays = jnp.asarray(rng.integers(0, 256, (3, h, w), dtype=np.uint8))
        outs = []
        for m in (None, mesh):
            model = _make_model(h, w, mesh=m)
            state = model.init_state(gray0)
            if m is not None:
                with mesh:
                    state, rgbs = model.scan(
                        state, grays, model.default_pixmaps(),
                        jnp.float32(0.0), jax.random.key(0))
            else:
                state, rgbs = model.scan(
                    state, grays, model.default_pixmaps(),
                    jnp.float32(0.0), jax.random.key(0))
            outs.append(np.asarray(rgbs))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_precondition_guard(self):
        from transflow_tpu.ops.halo_gather import sharded_bounded_gather
        mesh, n = self._mesh()
        h, w = 2 * n, 8  # shard height 2
        v = jnp.zeros((h, w), jnp.uint8)
        idx = jnp.zeros((h, w), jnp.int32)
        for halo in (0, 3):  # halo=0 misaligns; halo>shard height unreachable
            with pytest.raises(ValueError):
                with mesh:
                    sharded_bounded_gather(v, idx, idx, halo, mesh)
