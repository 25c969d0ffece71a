"""LiteFlowNet (Hui et al., CVPR'18) in Flax for TPU inference.

Parity reference: transflow/flow/methods/liteflownet.py — a torch+cupy
implementation (adapted from sniklaus/pytorch-liteflownet) whose cost-volume
correlation is a raw CUDA kernel (:48-116). Here:

* the network is flax.linen, NHWC float32, jitted end-to-end;
* the 7x7 cost-volume correlation is expressed as 49 shifted elementwise
  products + channel reductions (ops/correlation.py) — XLA fuses it into
  VPU/MXU work; no custom CUDA;
* weights convert from the published checkpoint
  (network-default.pytorch, torch state_dict) via ``load_torch_weights`` —
  this environment has no network egress, so the checkpoint must be provided
  on disk (TRANSFLOW_LITEFLOWNET_WEIGHTS or an explicit path); without
  weights the estimator raises, or runs randomly initialized when
  ``allow_random`` is set (shape/integration tests).
"""
import functools
import os
import typing

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.correlation import correlation as correlation7x7
# torch-exact resize (no downscale anti-aliasing): the published
# weights were trained with F.interpolate's pyramid (reference
# :592-611); jax.image.resize anti-aliases downscales and diverges
from ...ops.image import torch_bilinear_resize as bilinear_resize

_LEVELS = (2, 3, 4, 5, 6)
# per-level constants, indexed by the absolute level number
_FLT_BACKWARP = {2: 10.0, 3: 5.0, 4: 2.5, 5: 1.25, 6: 0.625}
_KERNEL = {2: 7, 3: 5, 4: 5, 5: 3, 6: 3}
_PAD = {2: 3, 3: 2, 4: 2, 5: 1, 6: 1}
_DIST_CH = {2: 49, 3: 25, 4: 25, 5: 9, 6: 9}
_FEAT_CH = {2: 32, 3: 64, 4: 96, 5: 128, 6: 192}
_SUBPIXEL_IN = {2: 130, 3: 130, 4: 194, 5: 258, 6: 386}
_REG_IN = {2: 131, 3: 131, 4: 131, 5: 131, 6: 195}

_MEAN_ONE = np.asarray([0.411618, 0.434631, 0.454253], np.float32)
_MEAN_TWO = np.asarray([0.410782, 0.433645, 0.452793], np.float32)


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _compute_dtype():
    """bf16 on accelerators (5x faster on the v5e MXU, measured), fp32 on
    CPU (where bf16 is emulated and crawls). TRANSFLOW_LITEFLOWNET_BF16=0
    forces fp32 everywhere."""
    if os.environ.get("TRANSFLOW_LITEFLOWNET_BF16", "1") == "0":
        return jnp.float32
    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32


def _conv(features, kernel, stride=1, pad=None, name=None):
    """Conv with fp32 params; compute dtype per _compute_dtype()."""
    if pad is None:
        pad = kernel // 2 if isinstance(kernel, int) else None
    if isinstance(kernel, int):
        kernel = (kernel, kernel)
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    return nn.Conv(features, kernel, strides=(stride, stride), padding=pad,
                   name=name, dtype=_compute_dtype(), param_dtype=jnp.float32)


def _env_warp_bound() -> int:
    """TRANSFLOW_LITEFLOWNET_WARP_BOUND parsed with context (0 if unset)."""
    value = os.environ.get("TRANSFLOW_LITEFLOWNET_WARP_BOUND")
    if not value:
        return 0
    try:
        return int(value)
    except ValueError:
        raise ValueError(
            f"TRANSFLOW_LITEFLOWNET_WARP_BOUND={value!r} is not an "
            "integer (pixels at level 2; 0 disables)") from None


def _warp_bound(level: int, base: int | None = None) -> int | None:
    """Per-level displacement bound for the opt-in Pallas warp kernel.

    ``base`` is the level-2 bound; coarser levels halve it (motion
    magnitude in level pixels halves per level), floored at 3. ``base``
    None falls back to TRANSFLOW_LITEFLOWNET_WARP_BOUND; 0 (or an unset
    env) means OFF: the exact gather path. The config surface is
    ``lfn_warp_bound`` (flow/sources/cv.py CvFlowConfig)."""
    if base is None:
        base = _env_warp_bound()
    if base < 0:
        # a negative bound would silently floor to 3 and clamp all motion
        # to +-3 px — refuse like the analogous --halo < 0 check
        raise ValueError(
            f"lfn_warp_bound must be >= 0, got {base} (0 disables the "
            "bounded kernel)")
    if not base:
        return None
    return max(3, int(base) >> (level - 2))


def backwarp(image, flow, bound: int | None = None,
             kernel: str | None = None):
    """Bilinear warp with zero padding, align_corners semantics.

    Parity: liteflownet.py:398-412 (grid_sample). ``flow`` is in pixels.

    TAP-BATCHED formulation: the four bilinear taps are pre-assembled
    into one (H, W, 4C) tensor via three cheap shifts, then fetched with
    ONE gather instead of four. XLA's TPU gather is byte-throughput-bound
    at ~10 GB/s (measured: slice size barely changes it — the serial
    slice loop, not DMA width, is the wall), but a single 4C-slice gather
    still beats four C-slice gathers by ~1.25x in f32 and ~1.45x with the
    net's bf16 compute dtype (v5e, 544x960x64: 4-tap 60 ms -> 42 ms
    median in the same regime). Full-network effect at 1088p: 186 ->
    148.6 ms/frame median (chained dispatches + value readback; the 186
    was taken in a healthier tunnel regime, so the true gain is larger
    than the 1.25x these two numbers suggest). Alternatives measured and rejected:
    flattened single-index take (~same), 2x2-patch lax.gather (36x
    WORSE), W-axis take_along_axis row-shift decomposition (2K+1 gathers,
    strictly worse since every gather axis hits the same wall), complex64
    channel-packing (unimplemented on the TPU backend), and Mosaic/Pallas
    (no per-element gather primitive). Remaining known-open: a bounded
    (2K+1)^2 in-VMEM select kernel — only wins if K stays small, which
    level-2 flows do not guarantee.

    Edge semantics: the gather is anchored at the clamped (y0, x0) base,
    so on the LOW edges the +1 taps fall back to the base slot (the
    reference clamps each tap independently); in-bounds masks use the raw
    float floors so deep out-of-bounds rows stay zero-weighted.

    ``bound``: opt-in bounded-displacement mode — route through the
    Pallas in-VMEM select kernel (ops/pallas_warp.py), which sidesteps
    the gather wall entirely but CLAMPS displacements beyond ``bound``
    pixels per axis. Enabled per level via
    TRANSFLOW_LITEFLOWNET_WARP_BOUND (see _warp_bound); default None =
    exact."""
    if bound is not None and image.shape[-1] >= 16:
        # the bounded select kernel (2-D tiled in-VMEM selects, dx AND dy
        # bounded) — opt-in for pan-dominated content, see the measured
        # verdict in ops/pallas_warp.py. ``kernel`` falls back to
        # TRANSFLOW_LITEFLOWNET_WARP_KERNEL, read here AT TRACE TIME: the
        # liteflownet() entry resolves it eagerly and passes it as a jit
        # static argument so env changes between calls are honored. The
        # round-3 'mxu' variant was deleted in round 4 (the real Mosaic
        # toolchain rejects its row reshape; interpret-mode only).
        if kernel is None:
            kernel = os.environ.get("TRANSFLOW_LITEFLOWNET_WARP_KERNEL")
        kernel = kernel or "select"
        if kernel != "select":
            raise ValueError(
                f"warp kernel must be 'select', got {kernel!r} "
                "(the 'mxu' variant was removed: it never compiled on "
                "the real TPU toolchain)")
        from ...ops.pallas_warp import bounded_backwarp
        return bounded_backwarp(image, flow, int(bound),
                                interpret=jax.default_backend() == "cpu")
    h, w = image.shape[-3], image.shape[-2]
    c = image.shape[-1]
    zrow = jnp.zeros((1, w, c), image.dtype)
    zcol = jnp.zeros((h, 1, c), image.dtype)
    right = jnp.concatenate([image[:, 1:], zcol], axis=1)
    down = jnp.concatenate([image[1:], zrow], axis=0)
    downright = jnp.concatenate([right[1:], zrow], axis=0)
    v4 = jnp.concatenate([image, right, down, downright], axis=-1)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = xx + flow[..., 0]
    sy = yy + flow[..., 1]
    x0f = jnp.floor(sx)
    y0f = jnp.floor(sy)
    wx = (sx - x0f)[..., None]
    wy = (sy - y0f)[..., None]
    x0 = jnp.clip(x0f, -1, w).astype(jnp.int32)
    y0 = jnp.clip(y0f, -1, h).astype(jnp.int32)
    g = v4[jnp.clip(y0, 0, h - 1), jnp.clip(x0, 0, w - 1)]
    t00, t01, t10, t11 = jnp.split(g, 4, axis=-1)
    mx = (x0 < 0)[..., None]
    my = (y0 < 0)[..., None]
    t01e = jnp.where(mx, t00, t01)
    t10e = jnp.where(my, t00, t10)
    t11e = jnp.where(mx & my, t00,
                     jnp.where(mx, t10, jnp.where(my, t01, t11)))

    def inb(xi, yi):
        return (((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
                .astype(jnp.float32)[..., None])

    return (t00 * (1 - wx) * (1 - wy) * inb(x0f, y0f)
            + t01e * wx * (1 - wy) * inb(x0f + 1, y0f)
            + t10e * (1 - wx) * wy * inb(x0f, y0f + 1)
            + t11e * wx * wy * inb(x0f + 1, y0f + 1))


def _bilinear_deconv_init(key, shape, dtype=jnp.float32):
    """Bilinear-upsampling taps — sane default when running weightless."""
    taps = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32) / 16.0
    return jnp.broadcast_to(jnp.asarray(taps)[..., None], shape).astype(dtype)


def _upsample2x_groupdeconv(x, kernel):
    """torch ConvTranspose2d(k=4, s=2, p=1, groups=C, bias=False) on NHWC.

    ``kernel``: (4, 4, C) per-channel taps (torch weight[:, 0] transposed)."""
    c = x.shape[-1]
    x = x.astype(jnp.float32)
    rhs = kernel[::-1, ::-1, :].astype(jnp.float32)  # flip: conv == convT
    rhs = rhs[:, :, None, :]  # (4, 4, 1, C): HWIO with I = in/groups = 1
    out = jax.lax.conv_general_dilated(
        x[None], rhs, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, preferred_element_type=jnp.float32)
    return out[0]


def _upsample2x_phases(x, kernel):
    """Exact phase decomposition of ``_upsample2x_groupdeconv``.

    A stride-2 k=4 depthwise transpose conv touches each output pixel from
    exactly 2x2 input taps, with the tap pair selected by the output pixel's
    parity phase (r, s): kernel rows {r, r+2} x cols {s, s+2} applied to
    input rows {a+r-1, a+r} x cols {b+s-1, b+s} for output (2a+r, 2b+s)
    (derived from the lhs_dilation=2 / pad=2 XLA form). That makes it 16
    shift-multiply-accumulates on the half-res plane plus one interleave —
    pure VPU work XLA fuses fully, instead of a feature_group_count=C
    dilated conv whose 1-channel groups defeat MXU tiling. Bit-identical
    math up to f32 summation order (tested against the deconv).

    Dtype-preserving: accumulation is always f32 (the f32 kernel promotes
    each product), but reads and the output keep x's dtype — so the bf16
    correlation upsample at levels 2-3 moves half the bytes (the level-2
    output alone is ~102 MB/frame in f32) while the f32 flow upsample
    stays exact. CPU parity tests run f32 end to end, unaffected."""
    c = x.shape[-1]
    h, w = x.shape[0], x.shape[1]
    out_dtype = (x.dtype if x.dtype in (jnp.bfloat16, jnp.float32)
                 else jnp.float32)
    x = x.astype(out_dtype)
    rhs = kernel[::-1, ::-1, :].astype(jnp.float32)  # flip: conv == convT
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    rows = []
    for r in (0, 1):
        cols = []
        for s in (0, 1):
            acc = None
            for ki, di in ((r, r - 1), (r + 2, r)):
                for kj, dj in ((s, s - 1), (s + 2, s)):
                    term = rhs[ki, kj] * xp[di + 1:di + 1 + h,
                                            dj + 1:dj + 1 + w]
                    acc = term if acc is None else acc + term
            cols.append(acc)
        rows.append(jnp.stack(cols, axis=2))       # (h, w, 2s, c)
    out = jnp.stack(rows, axis=1)                  # (h, 2r, w, 2s, c)
    return out.reshape(2 * h, 2 * w, c).astype(out_dtype)


def _unfold(plane, size: int):
    """(H, W) -> (H, W, size*size) patch extraction with zero padding."""
    pad = (size - 1) // 2
    padded = jnp.pad(plane, ((pad, pad), (pad, pad)))
    h, w = plane.shape
    patches = [padded[dy:dy + h, dx:dx + w]
               for dy in range(size) for dx in range(size)]
    return jnp.stack(patches, axis=-1)


class Features(nn.Module):
    """6-level feature pyramid. Parity: liteflownet.py:417-461."""

    @nn.compact
    def __call__(self, x):
        one = _leaky(_conv(32, 7, name="one0")(x))
        two = _leaky(_conv(32, 3, 2, name="two0")(one))
        two = _leaky(_conv(32, 3, name="two1")(two))
        two = _leaky(_conv(32, 3, name="two2")(two))
        thr = _leaky(_conv(64, 3, 2, name="thr0")(two))
        thr = _leaky(_conv(64, 3, name="thr1")(thr))
        fou = _leaky(_conv(96, 3, 2, name="fou0")(thr))
        fou = _leaky(_conv(96, 3, name="fou1")(fou))
        fiv = _leaky(_conv(128, 3, 2, name="fiv0")(fou))
        six = _leaky(_conv(192, 3, 2, name="six0")(fiv))
        return [one, two, thr, fou, fiv, six]


class Matching(nn.Module):
    """Cost-volume matching head. Parity: liteflownet.py:463-503."""
    level: int
    warp_bound: int | None = None
    warp_kernel: str | None = None
    corr_kernel: str | None = None
    corr_mesh: typing.Any = None  # jax Mesh for corr_kernel='pallas_halo'

    @nn.compact
    def __call__(self, feat1, feat2, flow):
        lvl = self.level
        if lvl == 2:
            # shared weights; one batch-2 call (numerically equivalent,
            # see LiteFlowNet.__call__'s trunk note)
            both = _leaky(_conv(64, 1, pad=0, name="feat0")(
                jnp.stack([feat1, feat2])))
            feat1, feat2 = both[0], both[1]
        if flow is not None:
            up_kernel = self.param(
                "upflow_kernel", _bilinear_deconv_init, (4, 4, 2))
            flow = _upsample2x_phases(flow, up_kernel)
            feat2 = backwarp(feat2, flow * _FLT_BACKWARP[lvl],
                             bound=_warp_bound(lvl, self.warp_bound),
                             kernel=self.warp_kernel)
        if lvl >= 4:
            corr = _leaky(correlation7x7(feat1, feat2, stride=1,
                                         kernel=self.corr_kernel,
                                         mesh=self.corr_mesh))
        else:
            corr = _leaky(correlation7x7(feat1, feat2, stride=2,
                                         kernel=self.corr_kernel,
                                         mesh=self.corr_mesh))
            upcorr_kernel = self.param(
                "upcorr_kernel", _bilinear_deconv_init, (4, 4, 49))
            corr = _upsample2x_phases(corr, upcorr_kernel)
        x = _leaky(_conv(128, 3, name="main0")(corr))
        x = _leaky(_conv(64, 3, name="main1")(x))
        x = _leaky(_conv(32, 3, name="main2")(x))
        delta = _conv(2, _KERNEL[lvl], pad=_PAD[lvl], name="main3")(x)
        return delta if flow is None else flow + delta


class Subpixel(nn.Module):
    """Sub-pixel refinement head. Parity: liteflownet.py:505-531."""
    level: int
    warp_bound: int | None = None
    warp_kernel: str | None = None

    @nn.compact
    def __call__(self, feat1, feat2, flow):
        lvl = self.level
        if lvl == 2:
            # shared weights; one batch-2 call (numerically equivalent,
            # see LiteFlowNet.__call__'s trunk note)
            both = _leaky(_conv(64, 1, pad=0, name="feat0")(
                jnp.stack([feat1, feat2])))
            feat1, feat2 = both[0], both[1]
        warped = backwarp(feat2, flow * _FLT_BACKWARP[lvl],
                          bound=_warp_bound(lvl, self.warp_bound),
                          kernel=self.warp_kernel)
        x = jnp.concatenate([feat1, warped, flow], axis=-1)
        x = _leaky(_conv(128, 3, name="main0")(x))
        x = _leaky(_conv(64, 3, name="main1")(x))
        x = _leaky(_conv(32, 3, name="main2")(x))
        delta = _conv(2, _KERNEL[lvl], pad=_PAD[lvl], name="main3")(x)
        return flow + delta


class _TapWeights(nn.Module):
    """Raw parameters of a 1x1 conv (``taps`` -> 1), for the fused
    regularization apply. The param tree (kernel (1,1,taps,1) + bias (1,))
    is byte-identical to the ``nn.Conv`` it replaces, so
    ``convert_torch_state``'s scalex/scaley mapping and existing
    checkpoints/goldens are unaffected."""
    taps: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.taps, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        return kernel[0, 0, :, 0], bias[0]


class Regularization(nn.Module):
    """Feature-driven local flow regularization.

    Parity: liteflownet.py:533-579 (distance-weighted softmax filtering).

    ``fused_apply`` (default): the distance-weighted tap sum
    ``scale = conv1x1(dist * unfold(flow))`` is computed as a fused
    shift-multiply-accumulate loop instead — same weights, and it never
    materializes the two (H, W, taps) unfold tensors or their products
    with ``dist`` that the 1x1-conv formulation forces (conv operands are
    library-call inputs on TPU, so XLA cannot fuse their producers):
    ~600 MB -> ~200 MB of HBM traffic per frame at level 2 (544x960, 49
    taps). Numerics: identical on CPU (both paths f32; pinned by tests).
    On TPU the replaced ``nn.Conv`` computed in bf16 (_compute_dtype), so
    the fused f32 accumulation is slightly MORE accurate there, and an
    A/B timing via ``fused_apply=False`` compares f32 fused work against
    bf16 conv work — attribute deltas accordingly."""
    level: int
    fused_apply: bool = True

    @nn.compact
    def __call__(self, img1, img2, feat1, flow):
        lvl = self.level
        size = _KERNEL[lvl]
        difference = jnp.sqrt(jnp.sum(jnp.square(
            img1 - backwarp(img2, flow * _FLT_BACKWARP[lvl])), axis=-1,
            keepdims=True))
        difference = jax.lax.stop_gradient(difference)
        if lvl < 5:
            feat1 = _leaky(_conv(128, 1, pad=0, name="feat0")(feat1))
        x = jnp.concatenate(
            [difference, flow - jnp.mean(flow, axis=(0, 1), keepdims=True),
             feat1], axis=-1)
        x = _leaky(_conv(128, 3, name="main0")(x))
        x = _leaky(_conv(128, 3, name="main1")(x))
        x = _leaky(_conv(64, 3, name="main2")(x))
        x = _leaky(_conv(64, 3, name="main3")(x))
        x = _leaky(_conv(32, 3, name="main4")(x))
        x = _leaky(_conv(32, 3, name="main5")(x))
        dch = _DIST_CH[lvl]
        if lvl >= 5:
            dist = _conv(dch, size, pad=_PAD[lvl], name="dist0")(x)
        else:
            dist = _conv(dch, (size, 1), pad=((_PAD[lvl], _PAD[lvl]), (0, 0)),
                         name="dist0")(x)
            dist = _conv(dch, (1, size), pad=((0, 0), (_PAD[lvl], _PAD[lvl])),
                         name="dist1")(dist)
        dist = dist.astype(jnp.float32)
        dist = -jnp.square(dist)
        dist = jnp.exp(dist - jnp.max(dist, axis=-1, keepdims=True))
        divisor = 1.0 / jnp.sum(dist, axis=-1, keepdims=True)
        if self.fused_apply:
            wx, bx = _TapWeights(size * size, name="scalex")()
            wy, by = _TapWeights(size * size, name="scaley")()
            pad = (size - 1) // 2
            h, w = flow.shape[0], flow.shape[1]
            px = jnp.pad(flow[..., 0], pad)
            py = jnp.pad(flow[..., 1], pad)
            acc_x = jnp.zeros((h, w), jnp.float32)
            acc_y = jnp.zeros((h, w), jnp.float32)
            k = 0
            for dy in range(size):
                for dx in range(size):
                    d = dist[..., k]
                    acc_x = acc_x + (wx[k] * d) * px[dy:dy + h, dx:dx + w]
                    acc_y = acc_y + (wy[k] * d) * py[dy:dy + h, dx:dx + w]
                    k += 1
            scale_x = (acc_x + bx)[..., None]
            scale_y = (acc_y + by)[..., None]
        else:
            fx = _unfold(flow[..., 0], size)
            fy = _unfold(flow[..., 1], size)
            scale_x = _conv(1, 1, pad=0, name="scalex")(dist * fx)
            scale_y = _conv(1, 1, pad=0, name="scaley")(dist * fy)
        return jnp.concatenate([scale_x * divisor, scale_y * divisor],
                               axis=-1)


class LiteFlowNet(nn.Module):
    """Full pyramid network. Parity: liteflownet.py:581-611.

    ``warp_bound``: level-2 displacement bound for the Pallas backwarp
    (see _warp_bound); None falls back to the env var, 0 disables.
    ``warp_kernel``: 'select' (the only bounded-kernel variant; see
    backwarp); ``corr_kernel``: 'xla' | 'pallas' | 'pallas_halo'
    correlation override (ops/correlation.py) — under GSPMD sharding use
    'pallas_halo' with ``corr_mesh`` set (shard_map + halo exchange; the
    plain Pallas kernel has no partitioning rule) or 'xla'."""
    warp_bound: int | None = None
    warp_kernel: str | None = None
    corr_kernel: str | None = None
    corr_mesh: typing.Any = None

    @nn.compact
    def __call__(self, img1, img2):
        img1 = img1 - jnp.asarray(_MEAN_ONE)
        img2 = img2 - jnp.asarray(_MEAN_TWO)
        # One batch-2 trunk call instead of two batch-1 calls: batch
        # elements never mix and the param tree is unchanged (kernel shapes
        # don't see N), so this is numerically equivalent — to f32 rounding,
        # not bitwise: XLA may retile the conv reduction for the batched
        # shape. XLA emits half as many convolutions with twice the MXU rows.
        feats = Features(name="features")(jnp.stack([img1, img2]))
        feats1 = [f[0] for f in feats]
        feats2 = [f[1] for f in feats]
        # Image pyramids pair along channels for the same reason: resize
        # treats channels independently, so (H, W, 6) halves the op count.
        pair = [jnp.concatenate([img1, img2], axis=-1)]
        for lvl in range(1, 6):
            shape = feats1[lvl].shape
            pair.append(bilinear_resize(pair[-1], shape[0], shape[1]))
        imgs1 = [p[..., :3] for p in pair]
        imgs2 = [p[..., 3:] for p in pair]
        flow = None
        for idx in (-1, -2, -3, -4, -5):
            lvl = _LEVELS[idx]
            flow = Matching(lvl, self.warp_bound, self.warp_kernel,
                            self.corr_kernel, self.corr_mesh,
                            name=f"matching{lvl}")(
                feats1[idx], feats2[idx], flow)
            flow = Subpixel(lvl, self.warp_bound, self.warp_kernel,
                            name=f"subpixel{lvl}")(
                feats1[idx], feats2[idx], flow)
            flow = Regularization(lvl, name=f"regularization{lvl}")(
                imgs1[idx], imgs2[idx], feats1[idx], flow)
        return flow * 20.0


# ---------------------------------------------------------------------------
# weight conversion from the published torch checkpoint
# ---------------------------------------------------------------------------

def _torch_conv(state, key):
    w = np.asarray(state[key + ".weight"], dtype=np.float32)
    out = {"kernel": w.transpose(2, 3, 1, 0)}  # OIHW -> HWIO
    if key + ".bias" in state:
        out["bias"] = np.asarray(state[key + ".bias"], dtype=np.float32)
    return out

def _deconv_kernel(state, key):
    w = np.asarray(state[key + ".weight"], dtype=np.float32)  # (C, 1, 4, 4)
    return w[:, 0].transpose(1, 2, 0)  # (4, 4, C)


def convert_torch_state(state: dict) -> dict:
    """Map the sniklaus state_dict layout onto this module tree."""
    params: dict = {}
    feat = {}
    for name, tkey in [("one0", "netOne.0"), ("two0", "netTwo.0"),
                       ("two1", "netTwo.2"), ("two2", "netTwo.4"),
                       ("thr0", "netThr.0"), ("thr1", "netThr.2"),
                       ("fou0", "netFou.0"), ("fou1", "netFou.2"),
                       ("fiv0", "netFiv.0"), ("six0", "netSix.0")]:
        feat[name] = _torch_conv(state, "netFeatures." + tkey)
    params["features"] = feat
    for idx, lvl in enumerate(_LEVELS):
        match: dict = {}
        if lvl == 2:
            match["feat0"] = _torch_conv(state, f"netMatching.{idx}.netFeat.0")
        if lvl != 6:
            match["upflow_kernel"] = _deconv_kernel(
                state, f"netMatching.{idx}.netUpflow")
        if lvl < 4:
            match["upcorr_kernel"] = _deconv_kernel(
                state, f"netMatching.{idx}.netUpcorr")
        for conv_idx, torch_idx in enumerate((0, 2, 4, 6)):
            match[f"main{conv_idx}"] = _torch_conv(
                state, f"netMatching.{idx}.netMain.{torch_idx}")
        params[f"matching{lvl}"] = match
        sub: dict = {}
        if lvl == 2:
            sub["feat0"] = _torch_conv(state, f"netSubpixel.{idx}.netFeat.0")
        for conv_idx, torch_idx in enumerate((0, 2, 4, 6)):
            sub[f"main{conv_idx}"] = _torch_conv(
                state, f"netSubpixel.{idx}.netMain.{torch_idx}")
        params[f"subpixel{lvl}"] = sub
        reg: dict = {}
        if lvl < 5:
            reg["feat0"] = _torch_conv(
                state, f"netRegularization.{idx}.netFeat.0")
        for conv_idx, torch_idx in enumerate((0, 2, 4, 6, 8, 10)):
            reg[f"main{conv_idx}"] = _torch_conv(
                state, f"netRegularization.{idx}.netMain.{torch_idx}")
        reg["dist0"] = _torch_conv(state, f"netRegularization.{idx}.netDist.0")
        if lvl < 5:
            reg["dist1"] = _torch_conv(
                state, f"netRegularization.{idx}.netDist.1")
        reg["scalex"] = _torch_conv(state, f"netRegularization.{idx}.netScaleX")
        reg["scaley"] = _torch_conv(state, f"netRegularization.{idx}.netScaleY")
        params[f"regularization{lvl}"] = reg
    return {"params": params}


def load_torch_weights(path: str) -> dict:
    """Load the published torch checkpoint WITHOUT torch: both the zip
    container (torch >= 1.6) and the legacy sequential format (the 2019
    network-default.pytorch vintage) are parsed by a restricted pure-numpy
    unpickler (torch_zip.py), so the flagship CNN works in torch-free
    deployments."""
    from .torch_zip import load_torch_zip
    state = load_torch_zip(path)
    state = {key.replace("module", "net"): np.asarray(value)
             for key, value in state.items()}
    return convert_torch_state(state)


# ---------------------------------------------------------------------------
# estimator entry point
# ---------------------------------------------------------------------------

WEIGHTS_ENV = "TRANSFLOW_LITEFLOWNET_WEIGHTS"
_CACHE: dict = {}


def _get_variables(shape_hint, allow_random: bool, *, as_numpy: bool = False):
    """Weights in two forms: numpy leaves (baked as program literals when
    tracing into an outer jit) and device leaves (passed as args to _run).

    Closure-captured *device* arrays inside a jit re-sync to the device on
    every call in this environment (~21 MB of weights = milliseconds per
    frame); numpy closures bake into the executable once. Conversely, numpy
    leaves passed as jit *args* re-upload per call — so the direct path
    wants the device copy."""
    if "np" not in _CACHE:
        path = os.environ.get(WEIGHTS_ENV)
        if path and os.path.isfile(path):
            variables = load_torch_weights(path)
        elif allow_random or os.environ.get("TRANSFLOW_LITEFLOWNET_RANDOM"):
            # deterministic host-side random weights (tests only). Shapes
            # come from eval_shape — abstract, so this is safe both eagerly
            # and when first reached while tracing an outer jit (running
            # model.init for real there would either leak tracers into the
            # cache or, under compile-time eval, concretize the pallas
            # kernel's closure scalars)
            model = LiteFlowNet()
            dummy = np.zeros((64, 64, 3), np.float32)
            shapes = jax.eval_shape(
                lambda: model.init(jax.random.key(0), dummy, dummy))
            host_rng = np.random.default_rng(0)
            variables = jax.tree.map(
                lambda s: (0.02 * host_rng.standard_normal(s.shape))
                .astype(s.dtype), shapes)
        else:
            raise FileNotFoundError(
                "LiteFlowNet weights not found. Download "
                "network-default.pytorch (sniklaus/pytorch-liteflownet) and "
                f"point {WEIGHTS_ENV} at it, or set "
                "TRANSFLOW_LITEFLOWNET_RANDOM=1 for random weights.")
        _CACHE["np"] = jax.tree.map(np.asarray, variables)
    if as_numpy:
        return _CACHE["np"]
    if "dev" not in _CACHE:
        _CACHE["dev"] = jax.tree.map(jnp.asarray, _CACHE["np"])
    return _CACHE["dev"]


@functools.partial(jax.jit, static_argnames=("warp_bound", "warp_kernel",
                                             "corr_kernel", "corr_mesh"))
def _run(variables, img1, img2, warp_bound=None, warp_kernel=None,
         corr_kernel=None, corr_mesh=None):
    return LiteFlowNet(warp_bound, warp_kernel, corr_kernel,
                       corr_mesh).apply(variables, img1, img2)


def get_weights(allow_random: bool = False):
    """Device-resident weights pytree, for threading through an outer jit
    (the engine passes this as a proper argument of its step/scan programs —
    see ``liteflownet(..., params=...)``)."""
    return _get_variables(None, allow_random)


def liteflownet(prev_gray_or_rgb, next_gray_or_rgb, *,
                allow_random: bool = False, params=None,
                warp_bound: int | None = None,
                warp_kernel: str | None = None,
                corr_kernel: str | None = None,
                corr_mesh=None,
                scale: float = 1.0):
    """Estimate (H, W, 2) flow. Accepts RGB (H, W, 3) or grayscale uint8.

    Parity: liteflownet.py:614-647 (estimate + calc_optical_flow_...):
    pad to /32 via bilinear resize, run, resize back, rescale magnitudes.
    NOTE: the reference feeds BGR (frame[:, :, ::-1]); we match.

    ``scale`` (config key ``lfn_scale``, default 1.0 = reference parity):
    run the network at a reduced internal resolution — a speed/accuracy
    knob the reference doesn't offer (its lk_step is the analogous knob
    for Lucas-Kanade). The estimate() contract already resizes the net's
    output back to the caller's resolution and rescales magnitudes, so a
    scaled run reuses exactly that path; 0.5 cuts the network's work
    ~4x. The network remains exact at scale=1.0 (the /32 pad rounds UP,
    so parity inputs are untouched).

    ``params``: pass the weights pytree explicitly when calling from inside
    an outer jit (engine step / chunk scan) so they stay program ARGUMENTS.
    Measured at 1088p (async-dispatch comparison): weights as args ~6x
    faster than the same network with weights baked as program literals —
    XLA handles large constants badly. True wall-clock with a hard data
    dependency + value readback: 186 ms/frame (see backwarp's docstring for
    the profile). Without ``params``, a traced call falls back to baking
    the (numpy) weights as literals: correct, but slow."""
    img1 = _to_rgb01(prev_gray_or_rgb)
    img2 = _to_rgb01(next_gray_or_rgb)
    h, w = img1.shape[:2]
    if not 0.0 < scale <= 1.0:
        raise ValueError(f"lfn_scale must be in (0, 1], got {scale}")
    ph = max(32, int(np.ceil(h * scale / 32.0) * 32))
    pw = max(32, int(np.ceil(w * scale / 32.0) * 32))
    traced = isinstance(img1, jax.core.Tracer)
    if params is None:
        params = _get_variables((ph, pw), allow_random, as_numpy=traced)
    if (ph, pw) != (h, w):
        img1 = bilinear_resize(img1, ph, pw)
        img2 = bilinear_resize(img2, ph, pw)
    # resolve the env fallbacks EAGERLY, outside jit, so they become part
    # of _run's static cache key — an env change between two calls in the
    # same process must recompile, not silently replay the first config
    if warp_bound is None:
        warp_bound = _env_warp_bound() or None
    if warp_kernel is None:
        warp_kernel = (os.environ.get("TRANSFLOW_LITEFLOWNET_WARP_KERNEL")
                       or None)
    # the network emits flow on the level-2 (half-res) grid in full-res pixel
    # units; resize to the caller's resolution and rescale magnitudes
    # (liteflownet.py:631-634)
    if traced:
        flow = LiteFlowNet(warp_bound, warp_kernel, corr_kernel,
                           corr_mesh).apply(params, img1, img2)
    else:
        flow = _run(params, img1, img2, warp_bound, warp_kernel,
                    corr_kernel, corr_mesh)
    flow = bilinear_resize(flow, h, w)
    flow = flow * jnp.asarray([w / pw, h / ph], dtype=jnp.float32)
    return flow


def _to_rgb01(image):
    image = jnp.asarray(image)
    if image.ndim == 2:
        image = jnp.repeat(image[..., None], 3, axis=-1)
    # reference converts RGB -> BGR before the network (liteflownet.py:642)
    image = image[..., ::-1]
    return image.astype(jnp.float32) / 255.0
