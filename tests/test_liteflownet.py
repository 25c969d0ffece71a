"""LiteFlowNet: correlation-op oracle, architecture shapes, weight mapping."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transflow_tpu.ops.correlation import correlation7x7

pytestmark = pytest.mark.slow  # heavy e2e/parity file: excluded from the driver-budget quick run (pytest.ini)


def build_synthetic_state() -> dict:
    """A numpy state dict with the sniklaus layout (every key and torch-side
    shape of network-default.pytorch, zeros). Shared with
    test_liteflownet_parity.py's end-to-end checkpoint test."""
    state = {}

    def conv(i, o, k):
        if isinstance(k, int):
            k = (k, k)
        return {"weight": np.zeros((o, i) + k, np.float32),
                "bias": np.zeros(o, np.float32)}

    def put(prefix, d):
        for key, value in d.items():
            state[f"{prefix}.{key}"] = value

    put("netFeatures.netOne.0", conv(3, 32, 7))
    put("netFeatures.netTwo.0", conv(32, 32, 3))
    put("netFeatures.netTwo.2", conv(32, 32, 3))
    put("netFeatures.netTwo.4", conv(32, 32, 3))
    put("netFeatures.netThr.0", conv(32, 64, 3))
    put("netFeatures.netThr.2", conv(64, 64, 3))
    put("netFeatures.netFou.0", conv(64, 96, 3))
    put("netFeatures.netFou.2", conv(96, 96, 3))
    put("netFeatures.netFiv.0", conv(96, 128, 3))
    put("netFeatures.netSix.0", conv(128, 192, 3))
    kernels = {2: 7, 3: 5, 4: 5, 5: 3, 6: 3}
    dist_ch = {2: 49, 3: 25, 4: 25, 5: 9, 6: 9}
    feat_ch = {2: 32, 3: 64, 4: 96, 5: 128, 6: 192}
    sub_in = {2: 130, 3: 130, 4: 194, 5: 258, 6: 386}
    reg_in = {2: 131, 3: 131, 4: 131, 5: 131, 6: 195}
    for idx, lvl in enumerate((2, 3, 4, 5, 6)):
        k = kernels[lvl]
        if lvl == 2:
            put(f"netMatching.{idx}.netFeat.0", conv(32, 64, 1))
            put(f"netSubpixel.{idx}.netFeat.0", conv(32, 64, 1))
        if lvl != 6:
            state[f"netMatching.{idx}.netUpflow.weight"] = \
                np.zeros((2, 1, 4, 4), np.float32)
        if lvl < 4:
            state[f"netMatching.{idx}.netUpcorr.weight"] = \
                np.zeros((49, 1, 4, 4), np.float32)
        put(f"netMatching.{idx}.netMain.0", conv(49, 128, 3))
        put(f"netMatching.{idx}.netMain.2", conv(128, 64, 3))
        put(f"netMatching.{idx}.netMain.4", conv(64, 32, 3))
        put(f"netMatching.{idx}.netMain.6", conv(32, 2, k))
        put(f"netSubpixel.{idx}.netMain.0", conv(sub_in[lvl], 128, 3))
        put(f"netSubpixel.{idx}.netMain.2", conv(128, 64, 3))
        put(f"netSubpixel.{idx}.netMain.4", conv(64, 32, 3))
        put(f"netSubpixel.{idx}.netMain.6", conv(32, 2, k))
        if lvl < 5:
            put(f"netRegularization.{idx}.netFeat.0",
                conv(feat_ch[lvl], 128, 1))
        put(f"netRegularization.{idx}.netMain.0", conv(reg_in[lvl], 128, 3))
        put(f"netRegularization.{idx}.netMain.2", conv(128, 128, 3))
        put(f"netRegularization.{idx}.netMain.4", conv(128, 64, 3))
        put(f"netRegularization.{idx}.netMain.6", conv(64, 64, 3))
        put(f"netRegularization.{idx}.netMain.8", conv(64, 32, 3))
        put(f"netRegularization.{idx}.netMain.10", conv(32, 32, 3))
        if lvl >= 5:
            put(f"netRegularization.{idx}.netDist.0",
                conv(32, dist_ch[lvl], k))
        else:
            state[f"netRegularization.{idx}.netDist.0.weight"] = \
                np.zeros((dist_ch[lvl], 32, k, 1), np.float32)
            state[f"netRegularization.{idx}.netDist.0.bias"] = \
                np.zeros(dist_ch[lvl], np.float32)
            state[f"netRegularization.{idx}.netDist.1.weight"] = \
                np.zeros((dist_ch[lvl], dist_ch[lvl], 1, k), np.float32)
            state[f"netRegularization.{idx}.netDist.1.bias"] = \
                np.zeros(dist_ch[lvl], np.float32)
        put(f"netRegularization.{idx}.netScaleX", conv(dist_ch[lvl], 1, 1))
        put(f"netRegularization.{idx}.netScaleY", conv(dist_ch[lvl], 1, 1))
    return state


def build_random_state(seed: int = 11) -> dict:
    """Deterministic random weights over the synthetic layout — shared
    between the full-net golden generator (which feeds them to the
    reference torch network) and the parity test (which feeds them to the
    Flax pyramid), so the 21 MB of weights never needs committing; the
    golden npz carries a checksum to catch RNG-stream drift."""
    import math
    rng = np.random.default_rng(seed)
    state = {}
    for key, zeros in build_synthetic_state().items():
        scale = 0.5 if key.endswith(".bias") else \
            0.3 / math.sqrt(max(1, int(np.prod(zeros.shape[1:]))))
        state[key] = (scale * rng.standard_normal(zeros.shape)
                      ).astype(np.float32)
    return state


def state_checksum(state: dict) -> str:
    import hashlib
    digest = hashlib.sha256()
    for key in sorted(state):
        digest.update(key.encode())
        digest.update(np.ascontiguousarray(state[key]).tobytes())
    return digest.hexdigest()


class TestCorrelation:

    def oracle(self, f1, f2, stride):
        h, w, c = f1.shape
        pad = 3 * stride
        f2p = np.pad(f2, ((pad, pad), (pad, pad), (0, 0)))
        oh, ow = h // stride, w // stride
        out = np.zeros((oh, ow, 49), np.float32)
        for oy in range(oh):
            for ox in range(ow):
                y, x = oy * stride, ox * stride
                for dy in range(-3, 4):
                    for dx in range(-3, 4):
                        ch = (dy + 3) * 7 + (dx + 3)
                        patch = f2p[y + dy * stride + pad,
                                    x + dx * stride + pad]
                        out[oy, ox, ch] = np.mean(f1[y, x] * patch)
        return out

    def test_stride1(self):
        rng = np.random.default_rng(0)
        f1 = rng.normal(size=(10, 12, 8)).astype(np.float32)
        f2 = rng.normal(size=(10, 12, 8)).astype(np.float32)
        got = np.asarray(correlation7x7(jnp.asarray(f1), jnp.asarray(f2)))
        np.testing.assert_allclose(got, self.oracle(f1, f2, 1), atol=1e-5)

    def test_stride2(self):
        rng = np.random.default_rng(1)
        f1 = rng.normal(size=(12, 16, 4)).astype(np.float32)
        f2 = rng.normal(size=(12, 16, 4)).astype(np.float32)
        got = np.asarray(correlation7x7(jnp.asarray(f1), jnp.asarray(f2),
                                        stride=2))
        np.testing.assert_allclose(got, self.oracle(f1, f2, 2), atol=1e-5)

    def test_self_correlation_center_channel(self):
        rng = np.random.default_rng(2)
        f = rng.normal(size=(16, 16, 8)).astype(np.float32)
        corr = np.asarray(correlation7x7(jnp.asarray(f), jnp.asarray(f)))
        center = 3 * 7 + 3
        np.testing.assert_allclose(corr[..., center],
                                   np.mean(f * f, axis=-1), atol=1e-5)


class TestNetwork:

    def test_forward_shapes(self):
        from transflow_tpu.flow.estimators.liteflownet import liteflownet
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)  # not /32
        b = rng.integers(0, 256, (70, 90, 3), dtype=np.uint8)
        flow = liteflownet(a, b, allow_random=True)
        assert flow.shape == (70, 90, 2)
        assert flow.dtype == jnp.float32

    def test_grayscale_input(self):
        from transflow_tpu.flow.estimators.liteflownet import liteflownet
        rng = np.random.default_rng(0)
        a = rng.integers(0, 256, (64, 64), dtype=np.uint8)
        flow = liteflownet(a, a, allow_random=True)
        assert flow.shape == (64, 64, 2)

    def test_weight_conversion_mapping(self):
        """A synthetic torch-layout state dict must map onto the module tree
        exactly (all leaves consumed and shapes matching flax init).
        Torch-free: the synthetic dict is plain numpy in torch's layout."""
        from transflow_tpu.flow.estimators.liteflownet import (
            LiteFlowNet, convert_torch_state)
        converted = convert_torch_state(build_synthetic_state())

        # reference structure from a random init
        model = LiteFlowNet()
        dummy = jnp.zeros((64, 64, 3), jnp.float32)
        expected = model.init(jax.random.key(0), dummy, dummy)

        exp_flat = jax.tree.leaves_with_path(expected)
        got_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
        exp_paths = {jax.tree_util.keystr(p): leaf.shape
                     for p, leaf in exp_flat}
        got_paths = {jax.tree_util.keystr(p): leaf.shape
                     for p, leaf in got_flat.items()} if isinstance(
                         got_flat, dict) else {}
        got_paths = {jax.tree_util.keystr(p): leaf.shape
                     for p, leaf in
                     jax.tree_util.tree_flatten_with_path(converted)[0]}
        assert set(exp_paths) == set(got_paths), (
            sorted(set(exp_paths) ^ set(got_paths))[:10])
        for path, shape in exp_paths.items():
            assert got_paths[path] == shape, (path, got_paths[path], shape)


class TestPallasCorrelation:
    """Interpret-mode parity of the Pallas band kernel (runs on CPU)."""

    def test_matches_xla(self):
        from transflow_tpu.ops.pallas_correlation import pallas_correlation7x7
        rng = np.random.default_rng(3)
        for (h, w, c, s) in [(16, 24, 8, 1), (32, 48, 16, 2)]:
            f1 = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
            f2 = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
            ref = np.asarray(correlation7x7(f1, f2, stride=s))
            got = np.asarray(pallas_correlation7x7(f1, f2, stride=s,
                                                   interpret=True))
            np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_bf16_staging_matches_f32_math_on_bf16_values(self):
        """bf16 inputs are staged bf16 (half the band DMA) but the kernel
        computes f32 — results must equal the XLA path fed the SAME bf16
        values upcast to f32 (no extra quantization beyond the input's)."""
        from transflow_tpu.ops.pallas_correlation import pallas_correlation7x7
        rng = np.random.default_rng(5)
        f1 = jnp.asarray(rng.normal(size=(16, 24, 16))
                         .astype(np.float32)).astype(jnp.bfloat16)
        f2 = jnp.asarray(rng.normal(size=(16, 24, 16))
                         .astype(np.float32)).astype(jnp.bfloat16)
        ref = np.asarray(correlation7x7(f1.astype(jnp.float32),
                                        f2.astype(jnp.float32), stride=1))
        got = np.asarray(pallas_correlation7x7(f1, f2, stride=1,
                                               interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-6)


class TestModelIntegration:
    """FlowTransferModel with the CNN estimator: weights must thread through
    the fused scan as program arguments (engine.make_estimator_step has the
    on-chip measurements) and agree with the per-step path."""

    def test_scan_matches_steps(self, monkeypatch):
        monkeypatch.setenv("TRANSFLOW_LITEFLOWNET_RANDOM", "1")
        import jax
        import jax.numpy as jnp
        from transflow_tpu.model import FlowTransferModel
        model = FlowTransferModel(64, 96, method="liteflownet")
        rng = np.random.default_rng(5)
        frames = rng.integers(0, 256, (4, 64, 96), dtype=np.uint8)
        pixmaps = model.default_pixmaps()
        key = jax.random.key(7)
        state = model.init_state(frames[0])
        _, rgbs = model.jit_scan(state, jnp.asarray(frames[1:]), pixmaps,
                                 jnp.float32(0.0), key)
        assert rgbs.shape == (3, 64, 96, 3) and rgbs.dtype == jnp.uint8
        # per-step replay with the same keys
        state2 = model.init_state(frames[0])
        keys = jax.random.split(key, 3)
        outs = []
        for i in range(3):
            state2, rgb = model.jit_step(
                state2, jnp.asarray(frames[1 + i]), pixmaps,
                jnp.float32(i / model.framerate), keys[i],
                model.default_frame_numbers(i))
            outs.append(np.asarray(rgb))
        np.testing.assert_array_equal(np.asarray(rgbs), np.stack(outs))


class TestFusedRegularizationApply:
    """The fused shift-multiply-accumulate apply must equal the 1x1-conv
    formulation it replaces (same scalex/scaley weights, identical param
    tree), across the two unfold sizes (7 at levels 2-4, 3 at levels 5-6)
    and the separable-vs-square dist-conv branches."""

    @pytest.mark.parametrize("lvl,ch", [(2, 32), (5, 128)])
    def test_matches_conv_path(self, lvl, ch):
        from transflow_tpu.flow.estimators.liteflownet import Regularization
        rng = np.random.default_rng(11)
        h, w = 24, 40
        img1 = jnp.asarray(rng.random((h, w, 3), np.float32))
        img2 = jnp.asarray(rng.random((h, w, 3), np.float32))
        feat = jnp.asarray(rng.standard_normal((h, w, ch)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((h, w, 2)) * 3.0).astype(np.float32))
        conv_mod = Regularization(lvl, fused_apply=False)
        variables = conv_mod.init(jax.random.key(0), img1, img2, feat, flow)
        ref = np.asarray(conv_mod.apply(variables, img1, img2, feat, flow))
        got = np.asarray(Regularization(lvl, fused_apply=True).apply(
            variables, img1, img2, feat, flow))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    def test_param_tree_identical(self):
        from transflow_tpu.flow.estimators.liteflownet import Regularization
        rng = np.random.default_rng(1)
        args = (jnp.asarray(rng.random((16, 16, 3), np.float32)),
                jnp.asarray(rng.random((16, 16, 3), np.float32)),
                jnp.asarray(rng.random((16, 16, 32), np.float32)),
                jnp.asarray(rng.random((16, 16, 2), np.float32)))
        tree_a = Regularization(2, fused_apply=True).init(
            jax.random.key(0), *args)
        tree_b = Regularization(2, fused_apply=False).init(
            jax.random.key(0), *args)
        paths_a = {jax.tree_util.keystr(p): leaf.shape for p, leaf in
                   jax.tree_util.tree_flatten_with_path(tree_a)[0]}
        paths_b = {jax.tree_util.keystr(p): leaf.shape for p, leaf in
                   jax.tree_util.tree_flatten_with_path(tree_b)[0]}
        assert paths_a == paths_b


class TestPhaseUpsample:
    """_upsample2x_phases must equal the grouped-deconv formulation it
    replaces (torch-exactness of the deconv itself is pinned in
    test_liteflownet_parity.py), including on the real tap counts (2 for
    flow, 49 for the upsampled cost volume) and non-bilinear kernels."""

    @pytest.mark.parametrize("h,w,c", [(8, 12, 2), (16, 10, 49), (6, 6, 7)])
    def test_matches_groupdeconv(self, h, w, c):
        from transflow_tpu.flow.estimators.liteflownet import (
            _upsample2x_groupdeconv, _upsample2x_phases)
        rng = np.random.default_rng(17)
        x = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
        kernel = jnp.asarray(
            rng.standard_normal((4, 4, c)).astype(np.float32))
        ref = np.asarray(_upsample2x_groupdeconv(x, kernel))
        got = np.asarray(_upsample2x_phases(x, kernel))
        assert got.shape == ref.shape == (2 * h, 2 * w, c)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


class TestBatchedTrunk:
    def test_batch2_features_match_separate_calls(self):
        """The full net runs Features ONCE on a stacked (2, H, W, 3) batch.
        Batch elements never mix, but XLA may retile the conv reduction for
        the batched shape (observed on the multi-threaded CPU backend), so
        agreement is at f32 rounding level, not bitwise."""
        from transflow_tpu.flow.estimators.liteflownet import Features
        rng = np.random.default_rng(11)
        img1 = jnp.asarray(rng.standard_normal((64, 96, 3)).astype(np.float32))
        img2 = jnp.asarray(rng.standard_normal((64, 96, 3)).astype(np.float32))
        feat = Features()
        fv = feat.init(jax.random.PRNGKey(0), img1)
        sep1 = feat.apply(fv, img1)
        sep2 = feat.apply(fv, img2)
        both = feat.apply(fv, jnp.stack([img1, img2]))
        for a, b, c in zip(sep1, sep2, both):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c[0]),
                                       atol=1e-5, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(b), np.asarray(c[1]),
                                       atol=1e-5, rtol=1e-4)

    def test_channel_paired_resize_bitwise_equal(self):
        """Image pyramids resize img1|img2 concatenated on channels; the
        resize is per-channel so the pairing must be value-neutral."""
        from transflow_tpu.ops.image import torch_bilinear_resize
        rng = np.random.default_rng(12)
        img1 = rng.standard_normal((64, 96, 3)).astype(np.float32)
        img2 = rng.standard_normal((64, 96, 3)).astype(np.float32)
        pair = torch_bilinear_resize(
            jnp.concatenate([jnp.asarray(img1), jnp.asarray(img2)], -1),
            32, 48)
        np.testing.assert_array_equal(
            np.asarray(pair[..., :3]),
            np.asarray(torch_bilinear_resize(jnp.asarray(img1), 32, 48)))
        np.testing.assert_array_equal(
            np.asarray(pair[..., 3:]),
            np.asarray(torch_bilinear_resize(jnp.asarray(img2), 32, 48)))


class TestPallasCorrelationMixedDtype:
    def test_f32_operand_not_quantized(self):
        """bf16 f1 x f32 f2 (the real Matching case: bf16 features vs the
        f32 backwarped map) — the f2 values must enter the kernel exactly,
        not rounded to bf16."""
        from transflow_tpu.ops.correlation import correlation7x7
        from transflow_tpu.ops.pallas_correlation import pallas_correlation7x7
        rng = np.random.default_rng(7)
        f1 = jnp.asarray(rng.normal(size=(16, 24, 16))
                         .astype(np.float32)).astype(jnp.bfloat16)
        # perturbations far below bf16 resolution but far above f32 noise
        f2 = jnp.asarray((rng.normal(size=(16, 24, 16))
                          + rng.uniform(1e-4, 5e-4, (16, 24, 16)))
                         .astype(np.float32))
        ref = np.asarray(correlation7x7(f1.astype(jnp.float32), f2, stride=1))
        got = np.asarray(pallas_correlation7x7(f1, f2, stride=1,
                                               interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-6)
        # sanity: a bf16-quantized f2 WOULD show up at this tolerance
        bad = np.asarray(correlation7x7(
            f1.astype(jnp.float32), f2.astype(jnp.bfloat16)
            .astype(jnp.float32), stride=1))
        assert np.abs(bad - ref).max() > 1e-5


class TestLfnScale:
    def test_scale_one_is_identity_with_default_path(self):
        """scale=1.0 must trace the exact same program as no scale."""
        from transflow_tpu.flow.estimators.liteflownet import liteflownet
        rng = np.random.default_rng(0)
        prev = rng.integers(0, 256, (64, 96), np.uint8)
        nxt = np.roll(prev, 2, axis=1)
        a = np.asarray(liteflownet(prev, nxt, allow_random=True))
        b = np.asarray(liteflownet(prev, nxt, allow_random=True, scale=1.0))
        np.testing.assert_array_equal(a, b)

    def test_half_scale_runs_and_correlates(self):
        """scale=0.5: output still at caller resolution, finite, and
        pointing the same way as the full-scale flow on a simple pan."""
        from transflow_tpu.flow.estimators.liteflownet import liteflownet
        rng = np.random.default_rng(1)
        prev = rng.integers(0, 256, (96, 128), np.uint8)
        nxt = np.roll(prev, 3, axis=1)
        full = np.asarray(liteflownet(prev, nxt, allow_random=True))
        half = np.asarray(liteflownet(prev, nxt, allow_random=True,
                                      scale=0.5))
        assert half.shape == full.shape == (96, 128, 2)
        assert np.isfinite(half).all()

    def test_scale_validation(self):
        import pytest
        from transflow_tpu.flow.estimators.liteflownet import liteflownet
        from transflow_tpu.flow.sources.cv import CvFlowConfig
        img = np.zeros((64, 64), np.uint8)
        with pytest.raises(ValueError, match="lfn_scale"):
            liteflownet(img, img, allow_random=True, scale=0.0)
        with pytest.raises(ValueError, match="lfn_scale"):
            liteflownet(img, img, allow_random=True, scale=1.5)
        with pytest.raises(ValueError, match="lfn_scale"):
            CvFlowConfig(method="liteflownet", lfn_scale=-0.5)

    def test_config_carries_scale(self):
        from transflow_tpu.flow.sources.cv import CvFlowConfig
        cfg = CvFlowConfig(method="liteflownet", lfn_scale=0.5)
        assert cfg.estimator_kwargs()["scale"] == 0.5
