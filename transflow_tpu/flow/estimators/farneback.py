"""Farneback dense optical flow (polynomial expansion) in JAX.

Parity reference: the default estimator of transflow
(transflow/flow/sources/cv.py:476-490 calls cv2.calcOpticalFlowFarneback with
fb_* hyper-parameters). This is a from-scratch implementation of Farneback's
algorithm ("Two-Frame Motion Estimation Based on Polynomial Expansion",
SCIA 2003):

1. per level, quadratic polynomial expansion f(x) ~ x'Ax + b'x + c fitted by
   Gaussian-weighted least squares — six separable correlations plus a
   constant 6x6 solve folded into a matmul (MXU work),
2. displacement update A d = db with the classic averaging of the two
   expansions and a winsize box (or Gaussian) aggregation of the normal
   equations, solved in closed form per pixel,
3. a coarse-to-fine pyramid with arbitrary pyr_scale.

Everything is static-shaped XLA; the pyramid loop unrolls at trace time.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.image import (bilinear_sample_packed, box_filter, gaussian_blur,
                          prepack_bilinear_taps, separable_correlate)
from ...ops.select_warp import shift_select_warp

OPTFLOW_USE_INITIAL_FLOW = 4  # cv2 flag value
OPTFLOW_FARNEBACK_GAUSSIAN = 256  # cv2 flag value


def _storage_dtype():
    """Materialized-plane dtype: bf16 on accelerators, f32 on CPU.

    The estimator's HBM traffic is dominated by its materialized planes —
    pyramid images, the polynomial coefficient planes, the warp tap pack
    and the box-filter operands (~1.6 GB/frame at 1080p defaults in f32,
    ~20x the scan carry; docs/PERF.md) — so storing them in bf16 halves
    the bound. Precision-critical arithmetic is unaffected: convolutions
    accumulate f32 over bf16 operands (MXU-native; ops/image.py), the
    lerp weights, displacement algebra and the 2x2 solve stay f32, and
    the flow itself is always f32. Measured numerics cost (CPU bf16
    emulation, 240x320 shifted-noise pair, default params): 46.7 dB vs
    cv2 against 46.65 dB for the all-f32 path — noise-level
    (tests/test_flow_ops.py pins >= 40 dB on the real code path).
    TRANSFLOW_FARNEBACK_BF16=0 forces all-f32; read at trace time (same
    caveat as liteflownet._compute_dtype)."""
    if os.environ.get("TRANSFLOW_FARNEBACK_BF16", "1") == "0":
        return jnp.float32
    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32


@functools.lru_cache(maxsize=None)
def _poly_exp_consts(n: int, sigma: float):
    """1-D basis kernels and the inverse Gram matrix for the weighted LS fit.

    Returns numpy arrays ONLY: inside a jit trace jnp.asarray stages a
    tracer, and caching a tracer across traces is a leak."""
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    # basis over the 2-D window: [1, x, y, x^2, y^2, xy]
    xx, yy = np.meshgrid(x, x)  # yy varies along rows
    w = np.outer(g, g)
    basis = np.stack([np.ones_like(xx), xx, yy, xx ** 2, yy ** 2, xx * yy])
    gram = np.einsum("kij,lij,ij->kl", basis, basis, w)
    ginv = np.linalg.inv(gram)
    return (g.astype(np.float32), (g * x).astype(np.float32),
            (g * x * x).astype(np.float32), ginv.astype(np.float32))


def poly_expansion(image, n: int, sigma: float, storage=jnp.float32):
    """Per-pixel quadratic fit. Returns (bx, by, axx, ayy, axy) planes.

    ``storage``: dtype of the intermediate and returned planes (see
    _storage_dtype); convolutions and the Gram solve accumulate f32."""
    g, xg, xxg, ginv_np = _poly_exp_consts(n, sigma)
    ginv = jnp.asarray(ginv_np)
    f = image.astype(storage)
    # vertical passes (axis 0 = y), then horizontal (axis 1 = x)
    fy0 = separable_correlate(f, g, axis=0).astype(storage)
    fy1 = separable_correlate(f, xg, axis=0).astype(storage)
    fy2 = separable_correlate(f, xxg, axis=0).astype(storage)
    m00 = separable_correlate(fy0, g, axis=1).astype(storage)
    m10 = separable_correlate(fy0, xg, axis=1).astype(storage)   # w*x*f
    m01 = separable_correlate(fy1, g, axis=1).astype(storage)    # w*y*f
    m20 = separable_correlate(fy0, xxg, axis=1).astype(storage)  # w*x^2*f
    m02 = separable_correlate(fy2, g, axis=1).astype(storage)    # w*y^2*f
    m11 = separable_correlate(fy1, xg, axis=1).astype(storage)   # w*x*y*f
    moments = jnp.stack([m00, m10, m01, m20, m02, m11], axis=-1)
    coeffs = (moments @ ginv.T).astype(storage)  # [c, bx, by, axx, ayy, axy]
    bx = coeffs[..., 1]
    by = coeffs[..., 2]
    axx = coeffs[..., 3]
    ayy = coeffs[..., 4]
    axy = coeffs[..., 5] * jnp.asarray(0.5, storage)
    return bx, by, axx, ayy, axy


def _update_flow(poly1, poly2_pack, flow, winsize: int, use_gaussian: bool,
                 storage=jnp.float32, select_radius: int = 0):
    """One Farneback displacement-update iteration at one pyramid level.

    ``poly2_pack``: prepack_bilinear_taps of the stacked (H, W, 5) image-2
    coefficient planes — poly2 is loop-invariant across the ``iterations``
    updates, so the tap pack is built once per level and each iteration
    pays ONE 20-channel gather instead of four 5-channel ones (the
    gather-wall arithmetic in ops/image.py::prepack_bilinear_taps).
    With ``select_radius`` > 0, ``poly2_pack`` is instead the RAW stacked
    (H, W, 5) planes and the warp runs gather-free through the two-pass
    shift-select (ops/select_warp.py — the per-pixel gather is the
    flagship's measured dominator at ~1 GB/s effective); displacements
    clamp to the radius.
    ``storage``: dtype of the box-filter operands (_storage_dtype); the
    displacement algebra, aggregation sums and the 2x2 solve stay f32."""
    bx1, by1, axx1, ayy1, axy1 = poly1
    h, w = bx1.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dx = flow[..., 0]
    dy = flow[..., 1]
    sx = xx + dx
    sy = yy + dy
    # the 5 coefficient planes of image2 warped to x + d
    if select_radius > 0:
        p2w = shift_select_warp(poly2_pack, dy, dx, select_radius)
    else:
        p2w = bilinear_sample_packed(poly2_pack, sy, sx)
    bx2, by2, axx2, ayy2, axy2 = (p2w[..., k] for k in range(5))
    # in-bounds confidence: OpenCV ramps down matrices near borders /
    # out-of-range warps; we zero-weight fully out-of-frame samples
    inb = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
           ).astype(jnp.float32)
    a11 = 0.5 * (axx1 + axx2)
    a22 = 0.5 * (ayy1 + ayy2)
    a12 = 0.5 * (axy1 + axy2)
    db_x = -0.5 * (bx2 - bx1) + (a11 * dx + a12 * dy)
    db_y = -0.5 * (by2 - by1) + (a12 * dx + a22 * dy)
    # normal equations G = A'A, hvec = A'db, aggregated over the window
    g11 = a11 * a11 + a12 * a12
    g12 = a11 * a12 + a12 * a22
    g22 = a12 * a12 + a22 * a22
    h1 = a11 * db_x + a12 * db_y
    h2 = a12 * db_x + a22 * db_y
    planes = jnp.stack([g11 * inb, g12 * inb, g22 * inb,
                        h1 * inb, h2 * inb, inb], axis=0).astype(storage)
    if use_gaussian:
        sigma = winsize * 0.3
        agg = jax.vmap(lambda p: gaussian_blur(p, sigma, winsize // 2))(planes)
    else:
        agg = jax.vmap(lambda p: box_filter(p, winsize))(planes)
    g11, g12, g22, h1, h2, weight = (agg[k] for k in range(6))
    det = g11 * g22 - g12 * g12
    ok = (det > 1e-9) & (weight > 0)
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    new_dx = (g22 * h1 - g12 * h2) * inv_det
    new_dy = (g11 * h2 - g12 * h1) * inv_det
    new = jnp.stack([new_dx, new_dy], axis=-1)
    return jnp.where(ok[..., None], new, flow)


@functools.partial(jax.jit, static_argnames=(
    "pyr_scale", "levels", "winsize", "iterations", "poly_n", "poly_sigma",
    "flags", "downscale", "select_warp"))
def farneback(prev_gray, next_gray, prev_flow=None, *, pyr_scale: float = 0.5,
              levels: int = 3, winsize: int = 15, iterations: int = 3,
              poly_n: int = 5, poly_sigma: float = 1.2, flags: int = 0,
              downscale: int = 1, select_warp: int = 0):
    """Estimate (H, W, 2) float32 flow from two uint8 grayscale frames.

    Arguments mirror cv2.calcOpticalFlowFarneback; ``prev_flow`` is honored
    only with OPTFLOW_USE_INITIAL_FLOW, like OpenCV.

    ``downscale`` (TPU extension, no cv2 counterpart — `fb_downscale` in
    CvFlowConfig): run the whole estimator at 1/downscale resolution and
    bilinearly upsample the flow back (magnitudes rescaled). The
    estimator's HBM traffic — materialized planes AND the per-iteration
    warp-pack gather, the two candidate bounds in docs/PERF.md — scales
    by 1/downscale**2, which is what the `fast`/`fastest` presets in
    assets/configs/ buy; dense flow is smooth so the quality cost is
    small (PSNR pins in tests/test_flow_ops.py). The output shape stays
    (H, W, 2) at full resolution.

    ``select_warp`` (TPU extension, `fb_select_warp` in CvFlowConfig):
    when > 0, the per-iteration warp of the image-2 coefficient planes —
    the flagship's measured gather-wall dominator (~45.5 ms per 1080p
    instance at ~1.8 GB/s effective; bench GATHER_WALL_EVIDENCE) — runs
    gather-free through the two-pass shift-select warp with this
    per-level displacement radius (ops/select_warp.py). Displacements
    beyond the radius clamp; quality is PSNR-pinned in
    tests/test_flow_ops.py. 0 = exact gather path."""
    h, w = prev_gray.shape
    sdt = _storage_dtype()
    # uint8 -> bf16 is exact (integers <= 256); pyramid blurs/resizes and
    # the polynomial fit accumulate f32 over the bf16 storage
    prev = prev_gray.astype(sdt)
    nxt = next_gray.astype(sdt)
    use_gaussian = bool(flags & OPTFLOW_FARNEBACK_GAUSSIAN)

    downscale = int(downscale)
    full_h, full_w = h, w
    if downscale > 1:
        h = int(round(full_h / downscale))
        w = int(round(full_w / downscale))
        if min(h, w) <= 2 * poly_n + 1:
            raise ValueError(
                f"downscale={downscale} reduces {full_h}x{full_w} below the "
                f"poly_n={poly_n} expansion window; lower fb_downscale")
        # same anti-alias rule as the pyramid levels below
        sigma = (downscale - 1) * 0.5
        prev = jax.image.resize(gaussian_blur(prev, sigma), (h, w), "linear")
        nxt = jax.image.resize(gaussian_blur(nxt, sigma), (h, w), "linear")
        if prev_flow is not None:
            prev_flow = jax.image.resize(
                prev_flow.astype(jnp.float32), (h, w, 2), "bilinear"
            ) * (1.0 / downscale)

    # level sizes, coarsest last; drop levels that get degenerate
    level_shapes = []
    for k in range(levels + 1):
        scale = pyr_scale ** k
        lh, lw = int(round(h * scale)), int(round(w * scale))
        if min(lh, lw) <= 2 * poly_n + 1:
            break
        level_shapes.append((lh, lw, scale))

    if flags & OPTFLOW_USE_INITIAL_FLOW and prev_flow is not None:
        flow = prev_flow.astype(jnp.float32)
        lh, lw, scale = level_shapes[-1]
        flow = jax.image.resize(flow, (lh, lw, 2), "bilinear") * scale
    else:
        lh, lw, _ = level_shapes[-1]
        flow = jnp.zeros((lh, lw, 2), dtype=jnp.float32)

    for k in range(len(level_shapes) - 1, -1, -1):
        lh, lw, scale = level_shapes[k]
        if flow.shape[:2] != (lh, lw):
            prev_scale = level_shapes[k + 1][2]
            flow = jax.image.resize(flow, (lh, lw, 2), "bilinear") * (
                scale / prev_scale)
        if scale != 1.0:
            sigma = (1.0 / scale - 1.0) * 0.5
            img1 = jax.image.resize(gaussian_blur(prev, sigma), (lh, lw),
                                    "linear")
            img2 = jax.image.resize(gaussian_blur(nxt, sigma), (lh, lw),
                                    "linear")
        else:
            img1, img2 = prev, nxt
        poly1 = poly_expansion(img1, poly_n, poly_sigma, storage=sdt)
        poly2 = poly_expansion(img2, poly_n, poly_sigma, storage=sdt)
        poly2_stack = jnp.stack(poly2, axis=-1)
        # select mode samples the raw stack (no tap pack: the 4-neighbor
        # taps come from the +1 shifts inside the select passes)
        poly2_pack = (poly2_stack if select_warp > 0
                      else prepack_bilinear_taps(poly2_stack))
        # fori_loop keeps the traced program small: the update body is
        # compiled once per level instead of ``iterations`` times
        flow = jax.lax.fori_loop(
            0, iterations,
            lambda _, f: _update_flow(poly1, poly2_pack, f, winsize,
                                      use_gaussian, storage=sdt,
                                      select_radius=select_warp),
            flow)
    if downscale > 1:
        flow = jax.image.resize(flow, (full_h, full_w, 2),
                                "bilinear") * float(downscale)
    return flow
