"""Device-side image primitives: grayscale, 2-D convolution, resize, upscale.

These replace the reference's host-side cv2/scipy calls
(transflow/flow/sources/cv.py:465-466 grayscale, source.py:344-348 kernel
convolution, utils.py:417-418 kron upscale) with XLA ops that fuse into the
per-frame step.
"""
import functools

import jax
import jax.numpy as jnp


def rgb_to_gray(rgb) -> jax.Array:
    """BT.601 luma, matching cv2.cvtColor(..., COLOR_RGB2GRAY) rounding."""
    rgb = rgb.astype(jnp.float32)
    gray = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    return jnp.round(gray).astype(jnp.uint8)


def conv2d_same(image, kernel, fill_value: float = 0.0) -> jax.Array:
    """'same' 2-D correlation-style convolution with constant fill.

    Matches scipy.signal.convolve2d(image, kernel, mode="same",
    boundary="fill") — i.e. a true convolution (kernel flipped).
    """
    image = image.astype(jnp.float32)
    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    flipped = kernel[::-1, ::-1]
    kh, kw = flipped.shape
    # scipy centers the kernel with the extra tap on the low side for even sizes
    pad_top, pad_left = (kh - 1) // 2, (kw - 1) // 2
    pad_bottom, pad_right = kh - 1 - pad_top, kw - 1 - pad_left
    lhs = image[None, None, :, :]
    if fill_value != 0.0:
        lhs = jnp.pad(lhs, ((0, 0), (0, 0), (pad_top, pad_bottom),
                            (pad_left, pad_right)), constant_values=fill_value)
        padding = "VALID"
    else:
        padding = ((pad_top, pad_bottom), (pad_left, pad_right))
    rhs = flipped[None, None, :, :]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return out[0, 0]


def correlate2d_reflect(image, kernel) -> jax.Array:
    """'same' 2-D cross-correlation with reflect ('symmetric') padding.

    Matches scipy.ndimage.convolve(image, kernel, mode="reflect") — note that
    scipy.ndimage.convolve flips the kernel, so pass the kernel as the caller
    holds it and we flip here to agree.
    """
    image = image.astype(jnp.float32)
    kernel = jnp.asarray(kernel, dtype=jnp.float32)[::-1, ::-1]
    kh, kw = kernel.shape
    # ndimage origin-0 convolution == cross-correlation with the flipped
    # kernel where even sizes put the extra tap on the HIGH side
    pad_top, pad_left = (kh - 1) // 2, (kw - 1) // 2
    pad_bottom, pad_right = kh // 2, kw // 2
    padded = jnp.pad(image, ((pad_top, pad_bottom), (pad_left, pad_right)),
                     mode="symmetric")
    out = jax.lax.conv_general_dilated(
        padded[None, None], kernel[None, None], window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return out[0, 0]


def separable_correlate(image, kernel_1d, axis: int,
                        mode: str = "symmetric") -> jax.Array:
    """1-D cross-correlation along ``axis`` of a 2-D image with edge padding.

    bf16 inputs stay bf16 through the convolution (MXU-native, half the
    operand HBM traffic) with f32 accumulation; every other dtype computes
    in f32 as before. Output is always f32."""
    dt = jnp.bfloat16 if image.dtype == jnp.bfloat16 else jnp.float32
    image = image.astype(dt)
    k = jnp.asarray(kernel_1d, dtype=dt)
    n = k.shape[0]
    pad_lo = (n - 1) // 2
    pad_hi = n - 1 - pad_lo
    pads = [(0, 0), (0, 0)]
    pads[axis] = (pad_lo, pad_hi)
    padded = jnp.pad(image, pads, mode=mode)
    rhs = k.reshape((n, 1) if axis == 0 else (1, n))
    out = jax.lax.conv_general_dilated(
        padded[None, None], rhs[None, None], window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return out[0, 0]


def box_filter(image, size: int) -> jax.Array:
    """Separable (size x size) box sum with zero padding (not normalized).

    bf16 inputs keep bf16 storage between the two passes (each pass
    accumulates f32 — separable_correlate); output is f32."""
    ones = jnp.ones((size,), dtype=jnp.float32)
    tmp = separable_correlate(image, ones, axis=0, mode="constant")
    if image.dtype == jnp.bfloat16:
        tmp = tmp.astype(jnp.bfloat16)
    return separable_correlate(tmp, ones, axis=1, mode="constant")


def gaussian_kernel_1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(image, sigma: float, radius: int | None = None) -> jax.Array:
    """Separable Gaussian blur with reflect padding (cv2.GaussianBlur-like)."""
    if radius is None:
        radius = int(3.0 * sigma + 0.5)
    k = gaussian_kernel_1d(sigma, radius)
    tmp = separable_correlate(image, k, axis=0)
    return separable_correlate(tmp, k, axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2))
def upscale_flow(flow, width_factor: int, height_factor: int) -> jax.Array:
    """Integer-factor kron upscale that also scales vector magnitudes.

    Parity reference: transflow/utils.py:417-418 (upscale_array).
    """
    scaled = flow * jnp.asarray([width_factor, height_factor], dtype=flow.dtype)
    out = jnp.repeat(scaled, height_factor, axis=0)
    return jnp.repeat(out, width_factor, axis=1)


def bilinear_resize(image, new_h: int, new_w: int) -> jax.Array:
    """Bilinear resize of a (H, W) or (H, W, C) float image (align_corners=False)."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w = image.shape[:2]
    out = jax.image.resize(image.astype(jnp.float32), (new_h, new_w, image.shape[2]),
                           method="bilinear")
    # preserve flow magnitudes relative to new resolution is the caller's job
    return out[..., 0] if squeeze else out


def _down2x_torch(image) -> jax.Array:
    """Exact 2x torch-bilinear downscale without gathers.

    At scale 2 the sample centers are sy = 2i + 0.5, so every output pixel
    is (in[2i]*0.5 + in[2i+1]*0.5) per axis — strided slices + FMAs that
    XLA fuses, instead of the general path's four jnp.take gathers (TPU
    gathers run ~45x below HBM bandwidth). Bit-identical to the general
    path: same weights (0.5 is exact), same y-then-x operation order."""
    rows = image[0::2] * 0.5 + image[1::2] * 0.5
    return rows[:, 0::2] * 0.5 + rows[:, 1::2] * 0.5


def _up2x_axis_torch(x, axis: int) -> jax.Array:
    """Exact 2x torch-bilinear upscale along one axis without gathers.

    Sample centers land at sy = j - 0.25 (even outputs) and j + 0.25 (odd
    outputs), i.e. a two-phase decomposition with fixed (0.25, 0.75)
    weights and edge clamping. Index 0 is special in the general path:
    its floor clamps to 0 AND its weight clips to 0, so it computes
    in[0]*1.0 + in[0]*0.0 = in[0] exactly — reproduced with an explicit
    set so the fast path stays bit-identical (0.25*x + 0.75*x can be one
    ulp off x)."""
    x = jnp.moveaxis(x, axis, 0)
    prev = jnp.concatenate([x[:1], x[:-1]], axis=0)      # in[j-1], clamped
    nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)       # in[j+1], clamped
    # index 0 reproduces the take path's exact expression in[0]*1.0 +
    # in[min(1, h-1)]*0.0 — NOT a bare in[0]: the *0.0 term matters for
    # bit-identity when in[1] is non-finite (NaN*0.0 = NaN propagates)
    row0 = x[0] * 1.0 + x[min(1, x.shape[0] - 1)] * 0.0
    evens = (prev * 0.25 + x * 0.75).at[0].set(row0)
    odds = x * 0.75 + nxt * 0.25
    out = jnp.stack([evens, odds], axis=1).reshape((-1,) + x.shape[1:])
    return jnp.moveaxis(out, 0, axis)


def torch_bilinear_resize(image, new_h: int, new_w: int) -> jax.Array:
    """torch's ``F.interpolate(mode='bilinear', align_corners=False)``.

    Unlike jax.image.resize (= bilinear_resize above), torch does NOT
    anti-alias when downscaling: every output pixel samples exactly four
    neighbors at half-pixel-center coordinates, edges clamped. LiteFlowNet
    needs these exact semantics — the published weights were trained with
    torch's pyramid downsampling (liteflownet.py:592-611), and the two
    formulations agree only for upscales. Verified against torch to 1e-7
    both directions (tests/test_liteflownet_parity.py).

    Exact 2x scales (the only ones LiteFlowNet's pyramid uses) take
    gather-free strided fast paths, bit-identical to the general take-
    based formulation (pinned by tests)."""
    squeeze = image.ndim == 2
    if squeeze:
        image = image[..., None]
    h, w = image.shape[:2]
    image = image.astype(jnp.float32)
    if (new_h, new_w) == (h, w):
        out = image
    elif (new_h * 2, new_w * 2) == (h, w):
        out = _down2x_torch(image)
    elif (new_h, new_w) == (2 * h, 2 * w):
        out = _up2x_axis_torch(_up2x_axis_torch(image, 0), 1)
    else:
        out = _torch_bilinear_resize_take(image, new_h, new_w)
    return out[..., 0] if squeeze else out


def _torch_bilinear_resize_take(image, new_h: int, new_w: int) -> jax.Array:
    """The general take-based formulation (any scale); the 2x fast paths
    above must stay bit-identical to this (pinned by tests)."""
    h, w = image.shape[:2]
    sy = (jnp.arange(new_h, dtype=jnp.float32) + 0.5) * (h / new_h) - 0.5
    sx = (jnp.arange(new_w, dtype=jnp.float32) + 0.5) * (w / new_w) - 0.5
    y0 = jnp.clip(jnp.floor(sy), 0, h - 1)
    x0 = jnp.clip(jnp.floor(sx), 0, w - 1)
    wy = jnp.clip(sy - y0, 0.0, 1.0)
    wx = jnp.clip(sx - x0, 0.0, 1.0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    # separable: gather rows then columns (axis-aligned takes, no 2-D gather)
    top = jnp.take(image, y0i, axis=0)
    bottom = jnp.take(image, y1i, axis=0)
    rows = top * (1.0 - wy)[:, None, None] + bottom * wy[:, None, None]
    left = jnp.take(rows, x0i, axis=1)
    right = jnp.take(rows, x1i, axis=1)
    return left * (1.0 - wx)[None, :, None] + right * wx[None, :, None]


def downsample2x(image) -> jax.Array:
    """5-tap Gaussian blur then 2x decimation (classic pyramid reduce)."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], dtype=jnp.float32) / 16.0
    blurred = separable_correlate(separable_correlate(image, k, 0), k, 1)
    return blurred[::2, ::2]


def prepack_bilinear_taps(image) -> jax.Array:
    """(H, W[, C]) -> (H, W, 4C) tap pack for ``bilinear_sample_packed``.

    Channel blocks are the [v00 | v01 | v10 | v11] bilinear neighborhoods:
    the image plus its edge-REPLICATED right / down / down-right shifts, so
    one gather at the clamped floor anchor fetches all four taps at once.
    Same tap-batching that took LiteFlowNet's backwarp from four C-slice
    gathers to one 4C-slice gather (flow/estimators/liteflownet.py::backwarp
    — XLA's TPU gather is a ~10-20 GB/s serial-slice wall, and one wide
    slice beats four narrow ones 1.25-1.45x measured); edge replication
    (not the zero padding backwarp uses) reproduces ``bilinear_sample``'s
    per-tap clamp semantics exactly.

    The pack is worth hoisting whenever the sampled image is loop-invariant
    (Farneback / Lucas-Kanade iterate the warp coordinates against a fixed
    image): build once, gather per iteration."""
    if image.ndim == 2:
        image = image[..., None]
    right = jnp.concatenate([image[:, 1:], image[:, -1:]], axis=1)
    down = jnp.concatenate([image[1:], image[-1:]], axis=0)
    downright = jnp.concatenate([right[1:], right[-1:]], axis=0)
    return jnp.concatenate([image, right, down, downright], axis=-1)


def bilinear_sample_packed(packed, yy, xx) -> jax.Array:
    """Sample a ``prepack_bilinear_taps`` pack at float (yy, xx).

    Returns (H, W, C); bit-identical to ``bilinear_sample`` on the original
    image (identical tap values and lerp expression — only the number of
    gathers changes)."""
    h, w = packed.shape[:2]
    y0f = jnp.floor(yy)
    x0f = jnp.floor(xx)
    wy = (yy - y0f)[..., None]
    wx = (xx - x0f)[..., None]
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    g = packed[y0, x0]
    v00, v01, v10, v11 = jnp.split(g, 4, axis=-1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_sample(image, yy, xx) -> jax.Array:
    """Sample image (H, W[, C]) at float coordinates (yy, xx) with edge clamp.

    One-shot convenience over prepack_bilinear_taps + bilinear_sample_packed
    (still a win over four per-tap gathers — the pack build is a cheap
    elementwise pass at HBM bandwidth, the gathers ride the ~10-20 GB/s
    wall); loops sampling a fixed image should hoist the pack instead."""
    out = bilinear_sample_packed(prepack_bilinear_taps(image), yy, xx)
    return out[..., 0] if image.ndim == 2 else out
