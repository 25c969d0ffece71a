"""Published-weights rehearsal — self-upgrading LiteFlowNet parity.

The real ``network-default.pytorch`` (the checkpoint the reference loads at
/root/reference/transflow/flow/methods/liteflownet.py:585-590) has never
been present in this zero-egress build image, so the CNN parity claim is
pinned against committed torch goldens computed under DETERMINISTIC
SYNTHETIC weights (test_liteflownet_parity.py). This file closes the last
link the moment the published file lands on any disk: point
``TRANSFLOW_LITEFLOWNET_WEIGHTS`` at it and the claim upgrades itself —

1. file integrity — sha256 computed and, once docs/WEIGHTS.md pins a
   digest, asserted against it (first verified run pastes the printed
   digest into the doc);
2. production load path — the checkpoint parses through the torch-free
   restricted unpickler and the converted tree matches the Flax module's
   own init shapes (tools/verify_weights.py checks, run as a test);
3. output fidelity — our Flax net vs the ACTUAL reference torch Network
   running the same real weights in this process (cupy correlation
   replaced by a CPU oracle of the CUDA kernel's math,
   kernel_Correlation_updateOutput, reference liteflownet.py:48-116),
   >= 40 dB flow PSNR on a deterministic frame pair (BASELINE.md bar).

So the harness cannot rot while the published file stays unavailable, the
SAME code paths are rehearsed unconditionally against a synthetic 21 MB
checkpoint sharing the parity suite's deterministic weight stream
(``TestHarnessSelfRehearsal``). Without the env var the published-file
tests SKIP (never fail). VERDICT r4 item #9.
"""
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WEIGHTS = os.environ.get("TRANSFLOW_LITEFLOWNET_WEIGHTS", "")

needs_published_file = pytest.mark.skipif(
    not (WEIGHTS and os.path.isfile(WEIGHTS)),
    reason="TRANSFLOW_LITEFLOWNET_WEIGHTS absent (zero-egress image); "
           "see docs/WEIGHTS.md for the one-command recipe")

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


# ---------------------------------------------------------------------------
# harness core — every assertion takes the checkpoint path as an argument so
# the self-rehearsal and the published-file tests run literally the same code
# ---------------------------------------------------------------------------

def load_reference_net(weights_path: str):
    """The reference torch Network loaded with the given weights, runnable
    on CPU: cupy stubbed before import, its CUDA correlation replaced by
    the same CPU oracle the committed goldens were generated with
    (tests/fixtures/generate_liteflownet_golden.py), .cuda() no-ops."""
    import torch
    import torch.nn.functional as F

    cupy_stub = types.ModuleType("cupy")
    cupy_stub.memoize = lambda **_kw: (lambda fn: fn)
    cupy_stub.RawKernel = lambda *a, **k: None
    cupy_stub.int32 = int
    sys.modules.setdefault("cupy", cupy_stub)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import transflow.flow.methods.liteflownet as ref

    def cpu_correlation(tenOne, tenTwo, intStride):
        # CPU restatement of kernel_Correlation_updateOutput (reference
        # liteflownet.py:48-116): 49 shifted channel-mean products over a
        # 3*stride zero-padded second operand
        b, c, h, w = tenOne.shape
        pad = 3 * intStride
        two_p = F.pad(tenTwo, (pad, pad, pad, pad))
        one_s = tenOne[:, :, ::intStride, ::intStride]
        outs = []
        for k in range(49):
            s2o = (k % 7 - 3) * intStride
            s2p = (k // 7 - 3) * intStride
            shifted = two_p[:, :, pad + s2p:pad + s2p + h:intStride,
                            pad + s2o:pad + s2o + w:intStride]
            outs.append((one_s * shifted).mean(dim=1))
        return torch.stack(outs, dim=1)

    ref.FunctionCorrelation = cpu_correlation
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.hub.load_state_dict_from_url = (
        lambda *a, **k: torch.load(weights_path, map_location="cpu",
                                   weights_only=True))
    ref.netNetwork = ref.Network().train(False)
    return ref


def assert_load_and_tree_ok(weights_path: str) -> dict:
    import verify_weights
    report = verify_weights.verify(weights_path)
    assert report["tree_problems"] == [], (
        "converted parameter tree diverges from the Flax module init: "
        + "; ".join(report["tree_problems"]))
    assert report["ok"]
    assert report["flow_golden"]["shape"][-1] == 2
    return report


def assert_psnr_vs_reference(weights_path: str) -> float:
    """The headline assertion: >= 40 dB between our net and the reference
    implementation, both running the given checkpoint on the same
    deterministic frame pair (reference calc path :614-647)."""
    import torch

    import verify_weights
    from transflow_tpu.flow.estimators.liteflownet import (liteflownet,
                                                           load_torch_weights)

    ref = load_reference_net(weights_path)
    f0, f1 = verify_weights.bundled_frames()
    with torch.no_grad():
        want = np.asarray(
            ref.calc_optical_flow_liteflownet(f0, f1), np.float64)
    got = np.asarray(
        liteflownet(f0, f1, params=load_torch_weights(weights_path)),
        np.float64)
    assert got.shape == want.shape
    peak = float(np.ptp(want))
    assert peak > 0.1, "reference flow is degenerate — bad frames or weights"
    mse = float(np.mean((got - want) ** 2))
    db = float("inf") if mse == 0 else 10 * np.log10(peak ** 2 / mse)
    assert db >= 40.0, (
        f"flow PSNR {db:.1f} dB < 40 dB vs the reference net under these "
        f"weights (peak {peak:.2f}px, rmse {np.sqrt(mse):.4f}px)")
    return db


# ---------------------------------------------------------------------------
# published-file tests (skip until the checkpoint is present)
# ---------------------------------------------------------------------------

@needs_published_file
def test_sha256_recorded_or_pinned():
    import verify_weights
    digest = verify_weights.sha256_of(WEIGHTS)
    pin = verify_weights.pinned_sha()
    if pin is None:
        pytest.fail(
            f"docs/WEIGHTS.md has no sha256 pin — record this verified "
            f"digest there: `{digest}`")
    assert digest == pin, (
        f"checkpoint bytes differ from the pinned digest: got {digest}, "
        f"pinned {pin} — wrong or corrupted file")


@needs_published_file
def test_loader_and_tree_fidelity():
    assert_load_and_tree_ok(WEIGHTS)


@needs_published_file
def test_psnr_vs_reference_with_published_weights():
    assert_psnr_vs_reference(WEIGHTS)


# ---------------------------------------------------------------------------
# unconditional self-rehearsal — proves the harness above stays runnable
# ---------------------------------------------------------------------------

class TestHarnessSelfRehearsal:
    """Drive the exact functions the published-file tests call, against a
    synthetic torch checkpoint over the parity suite's deterministic
    weight stream (test_liteflownet.build_random_state). If this passes,
    the only unproven link left is the published file's byte content."""

    @pytest.fixture(scope="class")
    def synth_ckpt(self, tmp_path_factory):
        import torch
        from test_liteflownet import build_random_state
        path = tmp_path_factory.mktemp("weights") / "synthetic.pytorch"
        torch.save({k: torch.from_numpy(v) for k, v in
                    build_random_state().items()}, str(path))
        return str(path)

    def test_loader_and_tree(self, synth_ckpt):
        assert_load_and_tree_ok(synth_ckpt)

    def test_psnr_vs_reference(self, synth_ckpt):
        assert_psnr_vs_reference(synth_ckpt)
