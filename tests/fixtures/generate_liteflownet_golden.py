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


if __name__ == "__main__":
    gen_mini_ckpt()
    gen_op_golden()
    print("fixtures written to", HERE)
