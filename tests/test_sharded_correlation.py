"""The Pallas correlation band kernel under GSPMD H-sharding.

A Pallas kernel is a tpu_custom_call with no SPMD partitioning rule, so
mesh runs used to fall back to the XLA shift formulation for the whole
pyramid. ops/pallas_correlation.sharded_pallas_correlation7x7 restores
the band kernel under a mesh: shard_map over the 'space' axis with
MAX_DISP*stride boundary rows of f2 exchanged via collective-permute
(zeros delivered at global edges = the frame's zero padding). These
tests pin bit-exactness against the unsharded kernel on the forced
8-device CPU mesh, the stride-2 shard-parity reduction, the trace-time
XLA fallback for indivisible levels, and the full network wired through
``corr_mesh``. "Pinned" equality is ulp-level (rtol 0, atol 2e-7), not
bitwise: every output pixel sees identical inputs, but the backend may
retile the channel reduction for the different per-shard band shapes
(fuzz-observed at c=32 on CPU interpret). corr_mesh is the config
engine.mesh_safe_estimator_kwargs selects for --mesh liteflownet runs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transflow_tpu.ops.correlation import correlation, correlation7x7
from transflow_tpu.ops.pallas_correlation import (
    pallas_correlation7x7, sharded_ok, sharded_pallas_correlation7x7)
from transflow_tpu.parallel.mesh import make_space_mesh


def _rand(shape, seed, dtype=np.float32):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(dtype))


class TestShardedKernelParity:
    @pytest.mark.parametrize("stride,h", [(1, 64), (2, 128)])
    @pytest.mark.parametrize("c", [16, 32])
    def test_ulp_exact_vs_unsharded(self, stride, h, c):
        mesh = make_space_mesh(4)
        f1 = _rand((h, 48, c), 1)
        f2 = _rand((h, 48, c), 2)
        assert sharded_ok(h, 4, stride)
        want = np.asarray(pallas_correlation7x7(f1, f2, stride=stride,
                                                interpret=True))
        got = np.asarray(sharded_pallas_correlation7x7(
            f1, f2, mesh, stride=stride, interpret=True))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)

    def test_mixed_dtype_staging(self):
        """bf16 f1 x f32 f2 through the sharded path must match the
        unsharded kernel (same per-shard staging rules)."""
        mesh = make_space_mesh(4)
        f1 = _rand((64, 48, 16), 3).astype(jnp.bfloat16)
        f2 = _rand((64, 48, 16), 4)
        want = np.asarray(pallas_correlation7x7(f1, f2, stride=1,
                                                interpret=True))
        got = np.asarray(sharded_pallas_correlation7x7(
            f1, f2, mesh, stride=1, interpret=True))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)

    def test_edge_rows_get_zero_halo(self):
        """Content in the first/last MAX_DISP rows correlates against the
        frame's zero padding, not wrapped-around rows: a non-zero f2
        everywhere must still produce the unsharded values at shard 0's
        top rows and the last shard's bottom rows (covered by equality,
        but pin it on an adversarial constant input where a wrap-around
        would be maximally visible)."""
        mesh = make_space_mesh(4)
        f1 = jnp.ones((64, 48, 16), jnp.float32)
        f2 = jnp.ones((64, 48, 16), jnp.float32) * 7.0
        want = np.asarray(pallas_correlation7x7(f1, f2, stride=1,
                                                interpret=True))
        got = np.asarray(sharded_pallas_correlation7x7(
            f1, f2, mesh, stride=1, interpret=True))
        np.testing.assert_array_equal(got, want)
        # sanity: the top-left channel (dy=-3) really does see zeros
        assert want[0, 10, 0] == 0.0


class TestDispatcher:
    def test_pallas_halo_dispatch_and_fallback(self):
        mesh = make_space_mesh(4)
        f1 = _rand((64, 48, 16), 5)
        f2 = _rand((64, 48, 16), 6)
        got = np.asarray(correlation(f1, f2, stride=1, kernel="pallas_halo",
                                     mesh=mesh))
        want = np.asarray(pallas_correlation7x7(f1, f2, stride=1,
                                                interpret=True))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-7)
        # indivisible H (or tiny shards) falls back to the XLA formulation
        f1s = _rand((20, 48, 16), 7)
        f2s = _rand((20, 48, 16), 8)
        assert not sharded_ok(20, 4, 1)
        got = np.asarray(correlation(f1s, f2s, stride=1,
                                     kernel="pallas_halo", mesh=mesh))
        want = np.asarray(correlation7x7(f1s, f2s, stride=1))
        np.testing.assert_array_equal(got, want)

    def test_pallas_halo_requires_mesh(self):
        f1 = _rand((16, 24, 8), 9)
        with pytest.raises(ValueError, match="mesh"):
            correlation(f1, f1, kernel="pallas_halo")

    def test_sharded_entry_rejects_indivisible(self):
        mesh = make_space_mesh(4)
        f1 = _rand((20, 48, 16), 10)
        with pytest.raises(ValueError, match="shard"):
            sharded_pallas_correlation7x7(f1, f1, mesh, stride=1,
                                          interpret=True)


class TestStreamSpaceComposition:
    def test_vmap_spmd_axis_over_sharded_corr(self):
        """The model path batches streams with vmap(spmd_axis_name=
        'stream') around the step; the shard_map'd correlation inside
        must survive that batching (ulp-level vs per-stream kernels)."""
        from transflow_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(8)
        rng = np.random.default_rng(3)
        f1 = jnp.asarray(rng.standard_normal((2, 64, 48, 16))
                         .astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((2, 64, 48, 16))
                         .astype(np.float32))
        out = jax.vmap(
            lambda a, b: sharded_pallas_correlation7x7(
                a, b, mesh, stride=2, interpret=True),
            spmd_axis_name="stream")(f1, f2)
        want = np.stack([np.asarray(pallas_correlation7x7(
            f1[s], f2[s], stride=2, interpret=True)) for s in range(2)])
        np.testing.assert_allclose(np.asarray(out), want, rtol=0, atol=2e-7)

    def test_sharded_scan_traces_with_corr_mesh(self, monkeypatch):
        """FlowTransferModel + sharded_scan with the estimator built on
        corr_kernel='pallas_halo': the traced stream x space program must
        contain the halo collective-permutes (trace-only — proves the
        vmap/shard_map wiring without paying an interpret-mode run)."""
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_RANDOM", "1")
        from transflow_tpu.config import LayerConfig
        from transflow_tpu.flow import Direction
        from transflow_tpu.model import FlowTransferModel
        from transflow_tpu.parallel.mesh import make_mesh, sharded_scan
        mesh = make_mesh(8)  # stream=2 x space=4
        h, w, chunk, n_streams = 128, 96, 1, 2
        model = FlowTransferModel(
            h, w, [LayerConfig(0)], {0: [(3, np.ones((h, w), bool))]},
            method="liteflownet",
            estimator_kwargs=dict(corr_kernel="pallas_halo", corr_mesh=mesh,
                                  warp_bound=0),
            direction=Direction.BACKWARD)
        rng = np.random.default_rng(5)
        state = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[model.init_state(rng.integers(0, 256, (h, w), dtype=np.uint8))
              for _ in range(n_streams)])
        grays = jnp.asarray(rng.integers(
            0, 256, (n_streams, chunk, h, w), dtype=np.uint8))
        pixmaps = model.default_pixmaps()
        keys = jax.random.split(jax.random.key(0), n_streams)
        run = sharded_scan(model, mesh)
        with mesh:
            jaxpr = str(jax.make_jaxpr(
                lambda s, g, k: run(s, g, pixmaps, jnp.float32(0.0), k))(
                    state, grays, keys))
        assert "ppermute" in jaxpr


class TestFullNetUnderMesh:
    def test_mesh_config_engages_sharded_kernel(self, monkeypatch):
        """Guard against a silent all-levels fallback: the traced program
        for the --mesh estimator config must actually contain the halo
        collective-permutes (a future sharded_ok/shape change could
        otherwise quietly route every level to the XLA formulation and
        nothing would fail)."""
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_RANDOM", "1")
        from transflow_tpu.flow.estimators.liteflownet import (LiteFlowNet,
                                                               get_weights)
        mesh = make_space_mesh(2)
        model = LiteFlowNet(corr_kernel="pallas_halo", corr_mesh=mesh)
        variables = get_weights(allow_random=True)
        img = jnp.zeros((64, 96, 3), jnp.float32)
        jaxpr = str(jax.make_jaxpr(
            lambda a, b: model.apply(variables, a, b))(img, img))
        assert "ppermute" in jaxpr
    def test_liteflownet_corr_mesh_matches_pallas(self, monkeypatch):
        """The assembled pyramid with corr_mesh (the --mesh engine config):
        level 2 (H=32, stride 2, 2-way mesh -> 8 output rows/shard) rides
        the sharded kernel, level 3 (H=16 -> 4 rows/shard) falls back to
        XLA at trace time. Output must match the unsharded Pallas-kernel
        run to f32 rounding (different fusion boundaries around the
        shard_map region)."""
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_RANDOM", "1")
        from transflow_tpu.flow.estimators.liteflownet import liteflownet
        mesh = make_space_mesh(2)
        rng = np.random.default_rng(11)
        prev = rng.integers(0, 256, (64, 96), np.uint8)
        nxt = np.roll(prev, 2, axis=1)
        want = np.asarray(liteflownet(prev, nxt, allow_random=True,
                                      corr_kernel="pallas"))
        got = np.asarray(liteflownet(prev, nxt, allow_random=True,
                                     corr_kernel="pallas_halo",
                                     corr_mesh=mesh))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
