"""LiteFlowNet conversion parity against committed torch-computed goldens.

These tests run WITHOUT torch: the fixtures under tests/fixtures/ were
generated once with torch (generate_liteflownet_golden.py) and committed, so
the numeric parity of the weight-conversion semantics — OIHW->HWIO conv
transpose, grouped-deconv kernel flip, grid_sample backwarp — is asserted in
any environment. When torch IS importable, an extra round-trip test saves a
fresh checkpoint and cross-checks the pure-numpy zip reader against it.
"""
import os
import pickle

import numpy as np
import jax.numpy as jnp
import pytest

from transflow_tpu.flow.estimators.liteflownet import (
    _upsample2x_groupdeconv, backwarp)
from transflow_tpu.flow.estimators.torch_zip import load_torch_zip

pytestmark = pytest.mark.slow  # heavy e2e/parity file: excluded from the driver-budget quick run (pytest.ini)

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures")


@pytest.fixture(scope="module")
def golden():
    return np.load(os.path.join(FIXTURES, "liteflownet_golden.npz"))


class TestTorchZipReader:

    def test_committed_checkpoint_exact(self):
        """The numpy reader must reproduce every tensor of the committed
        torch-saved checkpoint bit-exactly (bf16 widened to f32)."""
        loaded = load_torch_zip(os.path.join(FIXTURES, "mini_torch_ckpt.pt"))
        expected = np.load(
            os.path.join(FIXTURES, "mini_torch_ckpt_expected.npz"))
        assert set(loaded) == set(expected.files)
        for key in expected.files:
            got = np.asarray(loaded[key])
            want = expected[key]
            assert got.shape == want.shape, key
            np.testing.assert_array_equal(got, want, err_msg=key)

    def test_hostile_pickle_rejected(self, tmp_path):
        import zipfile
        path = str(tmp_path / "evil.pt")
        with zipfile.ZipFile(path, "w") as archive:
            archive.writestr("x/data.pkl", pickle.dumps({"f": os.system}))
        with pytest.raises(pickle.UnpicklingError, match="not allowed"):
            load_torch_zip(path)

    def test_round_trip_against_live_torch(self, tmp_path):
        torch = pytest.importorskip("torch")
        g = torch.Generator().manual_seed(42)
        state = {"w": torch.randn(5, 4, 3, 3, generator=g),
                 "t": torch.randn(8, 2, generator=g).t()}
        path = str(tmp_path / "ck.pt")
        torch.save(state, path)
        loaded = load_torch_zip(path)
        for key, value in state.items():
            np.testing.assert_array_equal(loaded[key], value.numpy())

    def test_legacy_format_round_trip(self, tmp_path):
        """The published 2019 network-default.pytorch predates the zip
        format; the legacy sequential format must load torch-free,
        including non-contiguous tensors and shared/offset storages."""
        torch = pytest.importorskip("torch")
        g = torch.Generator().manual_seed(7)
        base = torch.randn(24, generator=g)
        state = {"w": torch.randn(5, 4, 3, 3, generator=g),
                 "t": torch.randn(8, 2, generator=g).t(),
                 "half": torch.randn(6, generator=g).half(),
                 "ints": torch.arange(10, dtype=torch.int64),
                 "base": base,
                 "slice": base[4:12]}
        path = str(tmp_path / "legacy.pytorch")
        torch.save(state, path, _use_new_zipfile_serialization=False)
        assert not __import__("zipfile").is_zipfile(path)
        loaded = load_torch_zip(path)
        assert set(loaded) == set(state)
        for key, value in state.items():
            np.testing.assert_array_equal(loaded[key], value.numpy(), err_msg=key)

    def test_out_of_bounds_view_rejected(self, tmp_path):
        """A crafted checkpoint declaring shape (1000,) over a 4-element
        storage must raise, not leak adjacent process memory (advisor PoC
        round 2)."""
        torch = pytest.importorskip("torch")
        import collections
        import zipfile

        class _Ref:
            pass

        class _Evil:
            def __reduce__(self):
                return (torch._utils._rebuild_tensor_v2,
                        (_Ref(), 0, (1000,), (1,), False,
                         collections.OrderedDict()))

        class _EvilPickler(pickle.Pickler):
            def persistent_id(self, obj):
                if isinstance(obj, _Ref):
                    return ("storage", torch.FloatStorage, "0", "cpu", 4)
                return None

        import io
        buf = io.BytesIO()
        _EvilPickler(buf, protocol=2).dump({"w": _Evil()})
        path = str(tmp_path / "oob.pt")
        with zipfile.ZipFile(path, "w") as archive:
            archive.writestr("x/data.pkl", buf.getvalue())
            archive.writestr("x/data/0", b"\x00" * 16)
        with pytest.raises(pickle.UnpicklingError, match="addresses"):
            load_torch_zip(path)

    def test_negative_stride_rejected(self, tmp_path):
        torch = pytest.importorskip("torch")
        import collections
        import io
        import zipfile

        class _Ref:
            pass

        class _Evil:
            def __reduce__(self):
                return (torch._utils._rebuild_tensor_v2,
                        (_Ref(), 3, (4,), (-1,), False,
                         collections.OrderedDict()))

        class _EvilPickler(pickle.Pickler):
            def persistent_id(self, obj):
                if isinstance(obj, _Ref):
                    return ("storage", torch.FloatStorage, "0", "cpu", 4)
                return None

        buf = io.BytesIO()
        _EvilPickler(buf, protocol=2).dump({"w": _Evil()})
        path = str(tmp_path / "neg.pt")
        with zipfile.ZipFile(path, "w") as archive:
            archive.writestr("x/data.pkl", buf.getvalue())
            archive.writestr("x/data/0", b"\x00" * 16)
        with pytest.raises(pickle.UnpicklingError, match="negative"):
            load_torch_zip(path)


class TestConversionSemantics:
    """Converted weights fed to our ops must reproduce torch outputs."""

    def test_conv_oihw_to_hwio(self, golden):
        """_torch_conv's transpose: lax conv on NHWC/HWIO must equal torch
        Conv2d on the committed input/weights (reference nets are stacks of
        exactly this, liteflownet.py:417-611)."""
        import jax
        x = jnp.asarray(golden["conv_x"])              # HWC
        kernel = jnp.asarray(golden["conv_w"].transpose(2, 3, 1, 0))  # HWIO
        bias = jnp.asarray(golden["conv_b"])
        y = jax.lax.conv_general_dilated(
            x[None], kernel, window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + bias
        np.testing.assert_allclose(np.asarray(y), golden["conv_y"],
                                   atol=1e-4, rtol=1e-4)

    @pytest.mark.parametrize("name", ["upflow", "upcorr"])
    def test_grouped_deconv_upsample(self, golden, name):
        """_deconv_kernel + _upsample2x_groupdeconv must equal torch's
        grouped ConvTranspose2d(k=4, s=2, p=1) — the netUpflow/netUpcorr
        bilinear upsamplers (liteflownet.py:469-474)."""
        x = jnp.asarray(golden[f"{name}_x"])
        torch_w = golden[f"{name}_w"]                  # (C, 1, 4, 4)
        kernel = jnp.asarray(torch_w[:, 0].transpose(1, 2, 0))  # (4, 4, C)
        y = _upsample2x_groupdeconv(x, kernel)
        np.testing.assert_allclose(np.asarray(y), golden[f"{name}_y"],
                                   atol=1e-4, rtol=1e-4)

    def test_backwarp_matches_grid_sample(self, golden):
        """backwarp must equal grid_sample(bilinear, zeros,
        align_corners=True) with the reference's pixel->normalized flow
        scaling (liteflownet.py:398-412), including out-of-bounds zeros."""
        image = jnp.asarray(golden["warp_image"])
        flow = jnp.asarray(golden["warp_flow"])
        y = backwarp(image, flow)
        np.testing.assert_allclose(np.asarray(y), golden["warp_y"],
                                   atol=1e-5, rtol=1e-5)


class TestFullCheckpointPath:

    def test_load_torch_weights_via_numpy_reader(self, tmp_path):
        """End-to-end: a torch-format checkpoint with the sniklaus naming
        (module* prefixes) loads through load_torch_weights into a pytree
        the Flax net accepts."""
        torch = pytest.importorskip("torch")
        # reuse the synthetic full state dict from the mapping test
        from test_liteflownet import TestNetwork  # noqa: F401
        import test_liteflownet as tl
        state = tl.build_synthetic_state()
        tensors = {k.replace("net", "module", 1): torch.from_numpy(
            np.ascontiguousarray(v)) for k, v in state.items()}
        path = str(tmp_path / "network-default.pytorch")
        torch.save(tensors, path)

        from transflow_tpu.flow.estimators.liteflownet import (
            LiteFlowNet, load_torch_weights)
        variables = load_torch_weights(path)
        flow = LiteFlowNet().apply(
            variables, jnp.zeros((64, 64, 3)), jnp.zeros((64, 64, 3)))
        assert flow.shape == (32, 32, 2)


class TestFullNetworkGolden:
    """Assembled-pyramid parity against the ACTUAL reference network.

    The golden was computed by /root/reference's torch Network (cupy
    correlation replaced with a CPU stand-in of the same math) on
    deterministic random weights — see generate_liteflownet_golden.py.
    This catches wiring mistakes (level constants, feature routing,
    _FLT_BACKWARP misuse) that per-op goldens cannot."""

    @pytest.fixture(scope="class")
    def fullnet(self):
        from test_liteflownet import build_random_state, state_checksum
        golden = np.load(
            os.path.join(FIXTURES, "liteflownet_fullnet_golden.npz"))
        state = build_random_state()
        assert state_checksum(state) == bytes(
            golden["state_sha256"]).hex(), (
            "synthetic weight stream drifted — regenerate the golden")
        return golden, state

    def test_assembled_pyramid_matches_reference_net(self, fullnet):
        golden, state = fullnet
        from transflow_tpu.flow.estimators.liteflownet import (
            LiteFlowNet, convert_torch_state)
        variables = convert_torch_state(state)
        flow = LiteFlowNet().apply(
            variables, jnp.asarray(golden["fullnet_img1"]),
            jnp.asarray(golden["fullnet_img2"]))
        want = golden["fullnet_flow"]
        assert flow.shape == want.shape
        np.testing.assert_allclose(np.asarray(flow), want,
                                   atol=1e-3, rtol=1e-3)

    def test_estimator_entry_matches_reference_estimate(self, fullnet):
        """liteflownet() wrapper (BGR, /255, resize-to-/32, magnitude
        rescale) vs the reference's calc_optical_flow_liteflownet on a
        non-multiple-of-32 uint8 frame pair (reference :614-647)."""
        golden, state = fullnet
        from transflow_tpu.flow.estimators.liteflownet import (
            convert_torch_state, liteflownet)
        variables = convert_torch_state(state)
        flow = liteflownet(golden["estimate_frame1"],
                           golden["estimate_frame2"], params=variables)
        want = golden["estimate_flow"]
        assert flow.shape == want.shape
        np.testing.assert_allclose(np.asarray(flow), want,
                                   atol=1e-3, rtol=1e-3)


class TestResizeSemantics:

    @pytest.mark.parametrize("name,target", [("resize_up", (64, 64)),
                                             ("resize_down", (23, 31))])
    def test_torch_bilinear_resize(self, golden, name, target):
        """torch_bilinear_resize must match F.interpolate(bilinear,
        align_corners=False) in BOTH directions — torch does not anti-alias
        downscales, and the net's image pyramid (reference :592-611) was
        trained with exactly that."""
        from transflow_tpu.ops.image import torch_bilinear_resize
        x = jnp.asarray(golden[f"{name}_x"])
        got = np.asarray(torch_bilinear_resize(x, *target))
        np.testing.assert_allclose(got, golden[f"{name}_y"],
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("h,w,c", [(64, 96, 3), (34, 60, 2), (8, 8, 1),
                                       (2, 2, 3)])
    def test_2x_fast_paths_bit_identical(self, h, w, c):
        """Exact 2x scales (the only ones the LFN pyramid uses) take
        gather-free strided fast paths; they must reproduce the general
        take-based formulation BIT-FOR-BIT — same weights, same operation
        order, explicit handling of the index-0 weight-clip edge case."""
        from transflow_tpu.ops.image import (_torch_bilinear_resize_take,
                                             torch_bilinear_resize)
        rng = np.random.default_rng(h * w + c)
        x = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32) * 7)
        for nh, nw in [(h // 2, w // 2), (2 * h, 2 * w)]:
            fast = np.asarray(torch_bilinear_resize(x, nh, nw))
            ref = np.asarray(_torch_bilinear_resize_take(
                x.astype(jnp.float32), nh, nw))
            np.testing.assert_array_equal(fast, ref)

    def test_non_2x_shapes_use_general_path(self):
        """Odd dims (ceil-halved pyramid levels that aren't exact halves)
        must keep routing through the take formulation unchanged."""
        from transflow_tpu.ops.image import (_torch_bilinear_resize_take,
                                             torch_bilinear_resize)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((33, 61, 3)).astype(np.float32))
        got = np.asarray(torch_bilinear_resize(x, 17, 31))
        ref = np.asarray(_torch_bilinear_resize_take(
            x.astype(jnp.float32), 17, 31))
        np.testing.assert_array_equal(got, ref)

    def test_antialiased_resize_differs_on_downscale(self, golden):
        """Sanity: the anti-aliased jax resize does NOT match torch on
        downscale — the reason liteflownet uses torch_bilinear_resize."""
        from transflow_tpu.ops.image import bilinear_resize
        x = jnp.asarray(golden["resize_down_x"])
        got = np.asarray(bilinear_resize(x, 23, 31))
        assert np.abs(got - golden["resize_down_y"]).max() > 1e-3
