"""Generate committed golden fixtures for LiteFlowNet conversion parity.

Run once in an environment WITH torch (cpu is fine):

    python tests/fixtures/generate_liteflownet_golden.py

Outputs (committed to the repo so the parity tests never skip):

* ``mini_torch_ckpt.pt``       — a small torch-format checkpoint exercising
  every storage dtype the reader supports, plus non-contiguous tensors.
* ``mini_torch_ckpt_expected.npz`` — the same tensors as numpy arrays.
* ``liteflownet_golden.npz``   — torch-computed outputs of the three ops
  whose weight-conversion semantics could silently break parity with the
  reference (transflow/flow/methods/liteflownet.py): Conv2d (OIHW->HWIO
  transpose + padding), grouped ConvTranspose2d k4 s2 p1 (the netUpflow/
  netUpcorr upsamplers), and grid_sample(bilinear, zeros, align_corners=True)
  (backwarp, reference :398-412).
"""
import os

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))


def gen_mini_ckpt():
    g = torch.Generator().manual_seed(0)
    state = {
        "conv.weight": torch.randn(8, 3, 5, 5, generator=g),
        "conv.bias": torch.randn(8, generator=g),
        "param": torch.nn.Parameter(torch.randn(4, 4, generator=g)),
        "half": torch.randn(3, 3, generator=g).half(),
        "bf16": torch.randn(3, 3, generator=g).bfloat16(),
        "longs": torch.arange(10),
        "noncontig": torch.randn(6, 6, generator=g).t(),
        "bools": torch.tensor([True, False, True]),
    }
    torch.save(state, os.path.join(HERE, "mini_torch_ckpt.pt"))
    expected = {}
    for key, value in state.items():
        tensor = value.detach()
        if tensor.dtype == torch.bfloat16:
            tensor = tensor.float()  # numpy has no bf16; reader widens
        expected[key] = tensor.numpy()
    np.savez(os.path.join(HERE, "mini_torch_ckpt_expected.npz"), **expected)


def gen_op_golden():
    g = torch.Generator().manual_seed(1)
    out = {}

    # Conv2d, odd kernel, same padding, bias — the _torch_conv layout
    x = torch.randn(1, 6, 10, 12, generator=g)          # NCHW
    w = torch.randn(16, 6, 3, 3, generator=g)
    b = torch.randn(16, generator=g)
    y = torch.nn.functional.conv2d(x, w, b, padding=1)
    out["conv_x"] = x[0].permute(1, 2, 0).numpy()       # HWC
    out["conv_w"] = w.numpy()                           # OIHW (torch layout)
    out["conv_b"] = b.numpy()
    out["conv_y"] = y[0].permute(1, 2, 0).numpy()

    # grouped ConvTranspose2d(k=4, s=2, p=1, groups=C, bias=False) — the
    # netUpflow (C=2) and netUpcorr (C=49) upsampling deconvolutions
    for name, channels in (("upflow", 2), ("upcorr", 49)):
        x = torch.randn(1, channels, 7, 9, generator=g)
        w = torch.randn(channels, 1, 4, 4, generator=g)
        y = torch.nn.functional.conv_transpose2d(
            x, w, stride=2, padding=1, groups=channels)
        out[f"{name}_x"] = x[0].permute(1, 2, 0).numpy()
        out[f"{name}_w"] = w.numpy()                    # (C, 1, 4, 4)
        out[f"{name}_y"] = y[0].permute(1, 2, 0).numpy()

    # bilinear resize, align_corners=False — BOTH directions (torch does
    # not anti-alias downscales; the net's image pyramid depends on that,
    # reference :592-611 / estimate :614-636)
    for name, (h, w, th, tw) in (("resize_up", (23, 31, 64, 64)),
                                 ("resize_down", (64, 64, 23, 31))):
        x = torch.randn(1, 3, h, w, generator=g)
        y = torch.nn.functional.interpolate(
            x, size=(th, tw), mode="bilinear", align_corners=False)
        out[f"{name}_x"] = x[0].permute(1, 2, 0).numpy()
        out[f"{name}_y"] = y[0].permute(1, 2, 0).numpy()

    # grid_sample backwarp: bilinear, zeros padding, align_corners=True,
    # pixel-space flow normalized exactly like the reference (:403-406)
    image = torch.randn(1, 5, 11, 13, generator=g)      # NCHW
    flow = 3.0 * torch.randn(1, 2, 11, 13, generator=g)  # (dx, dy) pixels
    h, w_ = 11, 13
    hor = torch.linspace(-1.0, 1.0, w_).view(1, 1, 1, -1).repeat(1, 1, h, 1)
    ver = torch.linspace(-1.0, 1.0, h).view(1, 1, -1, 1).repeat(1, 1, 1, w_)
    grid = torch.cat([hor, ver], 1)
    norm_flow = torch.cat([flow[:, 0:1] * (2.0 / (w_ - 1.0)),
                           flow[:, 1:2] * (2.0 / (h - 1.0))], 1)
    warped = torch.nn.functional.grid_sample(
        image, (grid + norm_flow).permute(0, 2, 3, 1), mode="bilinear",
        padding_mode="zeros", align_corners=True)
    out["warp_image"] = image[0].permute(1, 2, 0).numpy()
    out["warp_flow"] = flow[0].permute(1, 2, 0).numpy()
    out["warp_y"] = warped[0].permute(1, 2, 0).numpy()

    np.savez(os.path.join(HERE, "liteflownet_golden.npz"), **out)


def gen_fullnet_golden():
    """Full-network golden computed by the ACTUAL reference network code.

    Imports /root/reference's torch LiteFlowNet (cupy stubbed out, its CUDA
    correlation replaced by a CPU stand-in reproducing the kernel's math:
    49 shifted channel-mean products over a 3*stride zero-padded operand,
    kernel_Correlation_updateOutput, reference liteflownet.py:48-116), loads
    committed random weights through Network.load_state_dict (strict — an
    independent shape check of the synthetic layout), and records
    input->flow for the assembled pyramid plus the estimate() wrapper on a
    non-multiple-of-32 frame pair. Proves the Flax pyramid WIRING (level
    constants, feature routing, _FLT_BACKWARP scaling), not just per-op
    conversion semantics."""
    import sys
    import types

    import torch.nn.functional as F

    cupy_stub = types.ModuleType("cupy")
    cupy_stub.memoize = lambda **_kw: (lambda fn: fn)
    cupy_stub.RawKernel = lambda *a, **k: None
    cupy_stub.int32 = int
    sys.modules.setdefault("cupy", cupy_stub)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    sys.path.insert(0, os.path.dirname(HERE))  # tests/ for test_liteflownet
    sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root
    import transflow.flow.methods.liteflownet as ref
    from test_liteflownet import build_random_state, state_checksum

    torch.Tensor.cuda = lambda self, *a, **k: self  # run the oracle on CPU

    def cpu_correlation(tenOne, tenTwo, intStride):
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

    state = build_random_state()
    torch.hub.load_state_dict_from_url = lambda *a, **k: {
        key: torch.from_numpy(value) for key, value in state.items()}
    net = ref.Network().train(False)

    # weights re-derive deterministically from the seed in the test; only
    # commit a checksum so an RNG-stream change fails loudly, not subtly
    out = {"state_sha256": np.frombuffer(
        bytes.fromhex(state_checksum(state)), np.uint8)}
    rng = np.random.default_rng(21)

    # assembled pyramid at /32 resolution (LiteFlowNet().apply parity point)
    img1 = rng.random((64, 96, 3), np.float32)
    img2 = np.clip(img1 + 0.1 * rng.standard_normal((64, 96, 3)), 0, 1) \
        .astype(np.float32)
    ten1 = torch.from_numpy(img1.transpose(2, 0, 1)).unsqueeze(0).clone()
    ten2 = torch.from_numpy(img2.transpose(2, 0, 1)).unsqueeze(0).clone()
    with torch.no_grad():
        flow = net(ten1, ten2)
    out["fullnet_img1"] = img1
    out["fullnet_img2"] = img2
    out["fullnet_flow"] = flow[0].permute(1, 2, 0).numpy()

    # estimate() wrapper on uint8 BGR-order frames at a non-/32 size
    # (reference :614-647: /255, BGR, resize to /32, net, resize back,
    # magnitude rescale) — the liteflownet() entry-point parity point
    frame1 = rng.integers(0, 256, (50, 70, 3), np.uint8)
    frame2 = np.clip(frame1.astype(np.int16)
                     + rng.integers(-20, 21, (50, 70, 3)), 0, 255) \
        .astype(np.uint8)
    ref.netNetwork = net  # skip lazy Network().cuda() construction
    with torch.no_grad():
        est = ref.calc_optical_flow_liteflownet(frame1, frame2)
    out["estimate_frame1"] = frame1
    out["estimate_frame2"] = frame2
    out["estimate_flow"] = np.asarray(est, np.float32)

    np.savez_compressed(os.path.join(HERE, "liteflownet_fullnet_golden.npz"),
                        **out)


if __name__ == "__main__":
    gen_mini_ckpt()
    gen_op_golden()
    gen_fullnet_golden()
    print("fixtures written to", HERE)
