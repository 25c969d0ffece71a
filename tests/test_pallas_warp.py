"""Bounded-displacement Pallas backwarp vs the exact gather path.

The kernel (ops/pallas_warp.py) replaces XLA's byte-throughput-bound TPU
gather with in-VMEM shifted selects when the displacement is bounded by K.
Contract under test:

  * |floor(displacement)| <= K per axis  ->  exact vs backwarp() up to the
    kernel's bf16 tap staging;
  * beyond K  ->  the floor clamps to [-K, K] while the bilinear fraction
    is kept (same contract as ops/halo_gather.py);
  * out-of-frame taps are zero-weighted ('zeros' padding), matching
    grid_sample per tests/test_liteflownet_parity.py.

Runs in interpret mode on the CPU test backend (conftest.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from transflow_tpu.flow.estimators.liteflownet import backwarp, _warp_bound
from transflow_tpu.ops.pallas_warp import bounded_backwarp


def _rand(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray((scale * rng.normal(size=shape)).astype(np.float32))


def _clamped_reference(image, flow, bound):
    """Exact backwarp after clamping flow floors into [-bound, bound]."""
    floor = jnp.floor(flow)
    frac = flow - floor
    return backwarp(image, jnp.clip(floor, -bound, bound) + frac)


class TestBoundedBackwarp:

    @pytest.mark.parametrize("bound", [3, 8])
    @pytest.mark.parametrize("shape", [(24, 40, 16), (37, 130, 24)])
    def test_exact_within_bound(self, bound, shape):
        image = _rand(shape, seed=bound)
        # uniform in (-bound, bound): floors stay in [-bound, bound-1]
        rng = np.random.default_rng(bound + 100)
        flow = jnp.asarray(
            (bound * (2 * rng.random(shape[:2] + (2,)) - 1))
            .astype(np.float32))
        want = backwarp(image, flow)
        got = bounded_backwarp(image, flow, bound, interpret=True)
        # the kernel stages the image in bf16 (taps only; weights and
        # accumulation are f32): tolerance is bf16 quantization of ~N(0,1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2)

    def test_integer_flow_is_bitexact_in_bf16_range(self):
        """Integer displacements hit single taps: no bilinear mixing, so
        bf16-representable inputs round-trip exactly."""
        image = jnp.asarray(
            np.random.default_rng(0)
            .integers(-64, 64, size=(16, 32, 16)).astype(np.float32))
        flow = jnp.asarray(np.random.default_rng(1)
                           .integers(-3, 4, size=(16, 32, 2))
                           .astype(np.float32))
        want = backwarp(image, flow)
        got = bounded_backwarp(image, flow, 4, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_out_of_frame_taps_read_zero(self):
        """A uniform shift off the frame edge must zero the vacated band,
        exactly like grid_sample 'zeros' padding."""
        image = jnp.ones((16, 32, 16), jnp.float32)
        flow = jnp.full((16, 32, 2), -2.5, jnp.float32)
        want = backwarp(image, flow)
        got = bounded_backwarp(image, flow, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2)
        # sanity on the semantics themselves: rows/cols whose source is
        # fully out of frame are zero
        assert np.all(np.asarray(got)[:, :1] == 0)

    def test_beyond_bound_clamps_floor_keeps_fraction(self):
        bound = 3
        image = _rand((24, 48, 16), seed=7)
        rng = np.random.default_rng(8)
        flow = jnp.asarray(
            (12 * rng.standard_normal((24, 48, 2))).astype(np.float32))
        want = _clamped_reference(image, flow, bound)
        got = bounded_backwarp(image, flow, bound, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-2)

    def test_backwarp_routes_on_bound(self):
        """backwarp(bound=K) must route to the kernel (clamping proves it
        took the bounded path), and bound=None must stay exact."""
        image = _rand((16, 32, 16), seed=3)
        flow = jnp.full((16, 32, 2), 9.25, jnp.float32)
        via_api = backwarp(image, flow, bound=2)
        direct = bounded_backwarp(image, flow, 2, interpret=True)
        np.testing.assert_array_equal(np.asarray(via_api),
                                      np.asarray(direct))
        exact = backwarp(image, flow, bound=None)
        assert not np.allclose(np.asarray(via_api), np.asarray(exact))


class TestWarpBoundEnv:

    def test_unset_means_exact(self, monkeypatch):
        monkeypatch.delenv("TRANSFLOW_LITEFLOWNET_WARP_BOUND",
                           raising=False)
        assert _warp_bound(2) is None
        assert _warp_bound(6) is None

    def test_levels_halve_with_floor(self, monkeypatch):
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_WARP_BOUND", "16")
        assert _warp_bound(2) == 16
        assert _warp_bound(3) == 8
        assert _warp_bound(4) == 4
        assert _warp_bound(5) == 3   # floored at 3
        assert _warp_bound(6) == 3

    def test_explicit_base_beats_env(self, monkeypatch):
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_WARP_BOUND", "16")
        assert _warp_bound(2, 8) == 8
        assert _warp_bound(2, 0) is None  # 0 = explicitly exact


class TestConfigSurface:
    """lfn_warp_bound travels config -> estimator_kwargs -> the net."""

    def test_cv_config_round_trip(self, tmp_path):
        from transflow_tpu.flow.sources.cv import CvFlowConfig
        cfg = CvFlowConfig(method="liteflownet", lfn_warp_bound=12)
        path = tmp_path / "cv.json"
        cfg.to_file(str(path))
        back = CvFlowConfig.from_file(str(path))
        assert back.lfn_warp_bound == 12
        assert back.estimator_kwargs() == {"warp_bound": 12, "scale": 1.0}
        # default 0 is passed explicitly: the config is authoritative,
        # overriding any TRANSFLOW_LITEFLOWNET_WARP_BOUND env fallback
        assert (CvFlowConfig(method="liteflownet").estimator_kwargs()
                == {"warp_bound": 0, "scale": 1.0})

    def test_estimator_entry_routes_kwarg(self, monkeypatch):
        """liteflownet(warp_bound=K) must reach the Pallas kernel."""
        import transflow_tpu.ops.pallas_warp as pw
        from transflow_tpu.flow.estimators import liteflownet as lfn
        calls = []
        orig = pw.bounded_backwarp

        def counting(image, flow, bound, **kw):
            calls.append(bound)
            return orig(image, flow, bound, **kw)

        monkeypatch.setattr(pw, "bounded_backwarp", counting)
        monkeypatch.delenv("TRANSFLOW_LITEFLOWNET_WARP_BOUND",
                           raising=False)
        img = np.zeros((64, 96), np.uint8)
        lfn.liteflownet(img, img, allow_random=True, warp_bound=16)
        assert calls and max(calls) == 16   # level 2 got the base bound
        assert min(calls) == 3              # coarsest levels floored
        calls.clear()
        lfn.liteflownet(img, img, allow_random=True)
        assert calls == []                  # default stays exact

class TestReviewFixes:
    """Round-3 self-review findings: negative bounds refuse, env kernel
    selection is honored across calls (jit static key), and --mesh runs
    force the XLA correlation (the Pallas kernels have no SPMD rule)."""

    def test_negative_bound_refused_everywhere(self, monkeypatch):
        from transflow_tpu.flow.sources.cv import CvFlowConfig
        with pytest.raises(ValueError, match="lfn_warp_bound"):
            CvFlowConfig(method="liteflownet", lfn_warp_bound=-16)
        with pytest.raises(ValueError, match=">= 0"):
            _warp_bound(2, -16)
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_WARP_BOUND", "-4")
        with pytest.raises(ValueError, match=">= 0"):
            _warp_bound(2)
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_WARP_BOUND", "16px")
        with pytest.raises(ValueError, match="WARP_BOUND"):
            _warp_bound(2)

    def test_env_bound_change_recompiles(self, monkeypatch):
        """Setting TRANSFLOW_LITEFLOWNET_WARP_BOUND after a first call
        must reach the kernel on the next call — the env is resolved
        eagerly into _run's static key, not baked at first trace."""
        import transflow_tpu.ops.pallas_warp as pw
        from transflow_tpu.flow.estimators import liteflownet as lfn
        calls = []
        orig = pw.bounded_backwarp
        monkeypatch.setattr(
            pw, "bounded_backwarp",
            lambda *a, **k: (calls.append(a[2]), orig(*a, **k))[1])
        monkeypatch.delenv("TRANSFLOW_LITEFLOWNET_WARP_BOUND",
                           raising=False)
        img = np.zeros((64, 96), np.uint8)
        lfn.liteflownet(img, img, allow_random=True)
        assert calls == []                      # exact gather (default)
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_WARP_BOUND", "8")
        lfn.liteflownet(img, img, allow_random=True)
        assert calls and max(calls) == 8        # bounded kernel reached

    def test_unknown_warp_kernel_rejected(self, monkeypatch):
        """'mxu' (deleted round 4: never compiled on the real Mosaic
        toolchain) and any other unknown kernel name must fail fast."""
        from transflow_tpu.flow.estimators.liteflownet import backwarp
        img = jnp.ones((16, 32, 16), jnp.float32)
        flow = jnp.zeros((16, 32, 2), jnp.float32)
        with pytest.raises(ValueError, match="mxu"):
            backwarp(img, flow, bound=4, kernel="mxu")

    def test_mesh_selects_sharded_pallas_correlation(self):
        from transflow_tpu.engine import mesh_safe_estimator_kwargs
        from transflow_tpu.flow.sources.cv import CvFlowConfig
        from transflow_tpu.parallel.mesh import make_space_mesh
        mesh = make_space_mesh(2)
        cfg = CvFlowConfig(method="liteflownet", lfn_warp_bound=12)
        meshed = mesh_safe_estimator_kwargs(cfg, mesh)
        assert meshed["corr_kernel"] == "pallas_halo"
        assert meshed["corr_mesh"] is mesh
        assert meshed["warp_bound"] == 0
        plain = mesh_safe_estimator_kwargs(cfg, None)
        assert "corr_kernel" not in plain
        assert plain["warp_bound"] == 12
        fb = mesh_safe_estimator_kwargs(CvFlowConfig(method="farneback"),
                                        mesh)
        assert "corr_kernel" not in fb

    def test_correlation_kernel_override(self):
        from transflow_tpu.ops.correlation import correlation
        f1 = _rand((16, 24, 8), seed=1)
        f2 = _rand((16, 24, 8), seed=2)
        want = correlation(f1, f2, kernel="xla")
        got = correlation(f1, f2, kernel="pallas")  # interpret on CPU
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        with pytest.raises(ValueError, match="correlation kernel"):
            correlation(f1, f2, kernel="cuda")
