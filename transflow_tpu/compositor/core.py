"""Functional compositor core — the per-frame stateful pixel-mapping update.

Parity reference: transflow/compositor/ (compositor.py, layers/*.py). The
reference mutates (H, W, DEPTH) int32 buffers with numpy.put scatters; here
every layer update is a pure function over a pytree of arrays, designed for
TPU:

* The reference's scatter permutation (movement.py:25-60) is re-expressed as a
  **gather**: ``new[p] = data[p + flow[p]]`` where p is a target. Targets are
  unique by construction, so no scatter conflicts exist; the only true
  scatters left write constants (alpha 0/1), which are order-independent and
  implemented with an associative scatter-max (ops/scatter.py).
* All updates for all layers fuse into one jitted step; `jax.lax.scan` over a
  chunk of frames amortizes dispatch (see pipeline.py).
* Reset randomness uses jax PRNG keys (statistical parity with the
  reference's global numpy RNG, per SURVEY §7 "Exact-parity RNG").

Known reference bugs NOT replicated (documented deviations):
* introduction.py:26,36 — ``numpy.where(x) == 0`` is always False, making the
  introduce-on-empty / introduce-unmoving exclusions no-ops. We implement the
  intended semantics.
* sum.py:9-14 adds flow x-component to the row index and y to the column
  (transposed); movement.py and the WebGL acc shader agree on (dy->i, dx->j),
  which is what we implement.
"""
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LayerConfig
from ..utils import load_bool_mask, load_float_mask, parse_color
from ..ops.bytepack import pack_planes, unpack_planes
from ..ops.halo_gather import bounded_row_gather, sharded_bounded_gather
from ..ops.scatter import scatter_any

# Compact carry dtypes (round 4): the layer state round-trips HBM every
# scan iteration (docs/PERF.md corrected accounting), so its footprint is
# the dominant per-frame traffic. The mapping pair holds in-frame
# coordinates (< 32768 for any real video — asserted at init), alpha is
# 0..255 by construction (a pixmap alpha byte or 0/1), and source indexes
# < 256 pixmap sources (the GUI caps at 5). Halving/quartering these
# leaves cuts the flagship carry ~60 -> ~38 MB. SumLayer keeps int32
# positions: its additive displacement is unbounded (reference
# sum.py:9-14) and can leave the int16 range on long runs.
POS_DTYPE = jnp.int16
ALPHA_DTYPE = jnp.uint8
SOURCE_DTYPE = jnp.uint8


# --------------------------------------------------------------------------
# Layer parameter bundles (host-side, static per pipeline)
# --------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class LayerParams:
    """Per-layer parameters: config flags (static) + mask arrays (leaves).

    Registered as a pytree so the mask arrays travel as jit ARGUMENTS: baking
    (H, W) arrays into the program as closure constants sends XLA down a
    pathological constant-handling path (hour-long compiles / 100x slower
    gathers, observed on v5e)."""

    def __init__(self, cfg: LayerConfig, height: int, width: int,
                 intro_masks: Sequence[np.ndarray],
                 channel_counts: Sequence[int]):
        self.cfg = cfg
        self.height = height
        self.width = width
        shape = (height, width)
        self.mask_alpha = jnp.asarray(
            load_float_mask(cfg.mask_alpha, shape, 1.0))
        self.mask_src = jnp.asarray(load_bool_mask(cfg.mask_src, shape, True))
        self.mask_dst = jnp.asarray(load_bool_mask(cfg.mask_dst, shape, True))
        self.reset_mask = jnp.asarray(
            load_float_mask(cfg.reset_mask, shape, 1.0))
        self.intro_masks = tuple(jnp.asarray(m) for m in intro_masks)
        self.channel_counts = tuple(channel_counts)
        self.num_sources = len(self.intro_masks)

    def tree_flatten(self):
        children = (self.mask_alpha, self.mask_src, self.mask_dst,
                    self.reset_mask, self.intro_masks)
        aux = (self.cfg, self.height, self.width, self.channel_counts)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.mask_alpha, obj.mask_src, obj.mask_dst, obj.reset_mask,
         obj.intro_masks) = children
        obj.cfg, obj.height, obj.width, obj.channel_counts = aux
        obj.num_sources = len(obj.channel_counts)
        return obj

    def base_source(self) -> jnp.ndarray:
        """Initial per-pixel source index: later sources overwrite earlier.

        Parity: transflow/compositor/layers/reference.py:46-52.
        """
        source = jnp.zeros((self.height, self.width), dtype=SOURCE_DTYPE)
        for s, mask in enumerate(self.intro_masks):
            source = jnp.where(mask, jnp.asarray(s, SOURCE_DTYPE), source)
        return source


def _base_coords(height: int, width: int):
    ii = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    return ii, jj


# --------------------------------------------------------------------------
# State initialization
# --------------------------------------------------------------------------

def init_layer_state(params: LayerParams) -> dict:
    h, w = params.height, params.width
    classname = params.cfg.classname
    assert h < 32768 and w < 32768, "POS_DTYPE int16 requires dims < 32768"
    assert len(params.intro_masks) < 256, "SOURCE_DTYPE uint8 caps sources"
    rgba = jnp.zeros((h, w, 4), dtype=jnp.uint8)
    if classname == "static":
        # StaticLayer starts opaque (static.py:9-12)
        return {"rgba": rgba.at[:, :, 3].set(1)}
    if classname == "introduction":
        return {
            "rgb": jnp.zeros((h, w, 3), dtype=jnp.uint8),
            "alpha": jnp.zeros((h, w), dtype=ALPHA_DTYPE),
            "source": jnp.zeros((h, w), dtype=SOURCE_DTYPE),
            "pos_i": jnp.zeros((h, w), dtype=POS_DTYPE),
            "pos_j": jnp.zeros((h, w), dtype=POS_DTYPE),
            "frame": jnp.zeros((h, w), dtype=jnp.int32),
            "introduced_once": jnp.zeros((), dtype=jnp.bool_),
        }
    # moveref / sum: identity mapping, opaque (reference.py:38-42).
    # Sum keeps int32 positions (unbounded accumulation, see POS_DTYPE).
    pos_dtype = jnp.int32 if classname == "sum" else POS_DTYPE
    ii, jj = _base_coords(h, w)
    return {
        "pos_i": ii.astype(pos_dtype),
        "pos_j": jj.astype(pos_dtype),
        "alpha": jnp.ones((h, w), dtype=ALPHA_DTYPE),
        "source": params.base_source(),
        "rgba": rgba,
    }


# --------------------------------------------------------------------------
# Movement (shared by moveref and introduction layers)
# --------------------------------------------------------------------------

def _movement(params: LayerParams, channels: dict, alpha, flow,
              halo: int | None = None, mesh=None):
    """Apply the flow permutation to ``channels`` + ``alpha``.

    Parity: transflow/compositor/layers/movement.py:20-64, re-expressed as a
    masked gather (see module docstring). Returns (channels, alpha, move_info)
    where move_info = (moving, src_i, src_j) is reused by introduction.

    ``halo``: when set, source reads go through the bounded-displacement
    gather (ops/halo_gather.py) so an H-sharded multi-chip run exchanges
    only neighbor rows instead of all-gathering the full state every frame
    (measured in parallel/mesh.py). Bit-exact for |flow_y| <= halo; rows
    further than the halo clamp to it.
    """
    cfg = params.cfg
    h, w = params.height, params.width
    di = jnp.round(flow[..., 1]).astype(jnp.int32)
    dj = jnp.round(flow[..., 0]).astype(jnp.int32)
    moving = (di != 0) | (dj != 0)
    ii, jj = _base_coords(h, w)
    src_i = jnp.clip(ii + di, 0, h - 1)
    src_j = jnp.clip(jj + dj, 0, w - 1)
    filled = alpha != 0
    # ONE gather for every plane the movement reads: the TPU gather wall
    # pays per slice (ops/bytepack.py), so the masks, alpha and all state
    # channels are byte-packed and fetched together — one ~7-B-slice
    # gather (moveref) instead of five 1-4 B ones; the halo'd bounded
    # gather packs the same way, shrinking its per-shift W-gathers too.
    if cfg.transparent_pixels_can_move:
        # src_filled is recovered from the gathered alpha below — no
        # separate `filled` lane in the pack
        mask_planes = [params.mask_src]
    else:
        mask_planes = [params.mask_src & filled]
    names = list(channels)
    packed, spec = pack_planes(
        mask_planes + [alpha] + [channels[k] for k in names])
    if halo is not None:
        # explicit mesh with a splitting 'space' axis AND shard height
        # >= halo (the exchange only reaches nearest neighbors):
        # manual-SPMD single local gather; else the GSPMD-composable
        # shift formulation
        if (mesh is not None and "space" in mesh.shape
                and mesh.shape["space"] > 1
                and h % mesh.shape["space"] == 0
                and 1 <= halo <= h // mesh.shape["space"]):
            g = sharded_bounded_gather(packed, src_i, src_j, halo, mesh)
        else:
            g = bounded_row_gather(packed, src_i, src_j, halo)
    else:
        g = packed[src_i, src_j]
    got = unpack_planes(g, spec)
    src_ok, g_alpha = got[0], got[1]
    g_channels = dict(zip(names, got[2:]))
    src_filled = (g_alpha != 0) if cfg.transparent_pixels_can_move else None
    dst_ok = params.mask_dst
    if not cfg.pixels_can_move_to_empty_spot:
        dst_ok = dst_ok & filled
    if not cfg.pixels_can_move_to_filled_spot:
        dst_ok = dst_ok & ~filled
    is_target = moving & src_ok & dst_ok

    def sel(mask, a, b):
        if a.ndim == 3:
            mask = mask[..., None]
        return jnp.where(mask, a, b)

    out = {k: sel(is_target, g_channels[k], v) for k, v in channels.items()}
    new_alpha = jnp.where(is_target, g_alpha, alpha)
    if cfg.moving_pixels_leave_empty_spot:
        if halo is not None:
            # Vacate the row the value gather actually read: the bounded
            # gather clamps row reach to [-halo, halo] (then to the frame),
            # so the scatter must apply the same clamp or a |flow_y| > halo
            # pixel would be vacated at its true source while the
            # destination receives data from the clamped row.
            eff_i = jnp.clip(ii + jnp.clip(src_i - ii, -halo, halo), 0, h - 1)
        else:
            eff_i = src_i
        flat_src = (eff_i * w + src_j).ravel()
        is_source = scatter_any((h, w), flat_src, is_target.ravel())
        new_alpha = jnp.where(is_source, 0, new_alpha)
    if cfg.transparent_pixels_can_move:
        new_alpha = jnp.where(is_target & src_filled,
                              jnp.ones_like(new_alpha), new_alpha)
    else:
        new_alpha = jnp.where(is_target, jnp.ones_like(new_alpha), new_alpha)
    return out, new_alpha, (moving, src_i, src_j)


def _gather_pixmap_slices(params: LayerParams, pixmaps, gi, gj):
    """Per-source pixmap reads at shared indices.

    All sources concatenate into ONE wider-slice gather (ops/bytepack.py
    rationale — the indices are identical across sources); yields each
    source's (H, W, channel_counts[s]) slice in order."""
    if params.num_sources > 1:
        packed = jnp.concatenate(
            [pixmaps[s] for s in range(params.num_sources)], axis=-1)
        gathered_all = packed[gi, gj]
        offset = 0
        for s in range(params.num_sources):
            c = params.channel_counts[s]
            yield gathered_all[..., offset:offset + c]
            offset += c
    else:
        for s in range(params.num_sources):
            yield pixmaps[s][gi, gj]


# --------------------------------------------------------------------------
# Reference layer: reset modes + rgba regather
# --------------------------------------------------------------------------

def _reset(params: LayerParams, state: dict, key) -> dict:
    """Parity: transflow/compositor/layers/reference.py:58-91."""
    cfg = params.cfg
    mode = cfg.reset_mode
    if mode == "off":
        return state
    h, w = params.height, params.width
    ii, jj = _base_coords(h, w)
    pos_i, pos_j = state["pos_i"], state["pos_j"]
    if mode == "random":
        rand = jax.random.uniform(key, (h, w))
        reset = rand < cfg.reset_random_factor * params.reset_mask
        state = dict(state)
        state["pos_i"] = jnp.where(reset, ii.astype(pos_i.dtype), pos_i)
        state["pos_j"] = jnp.where(reset, jj.astype(pos_j.dtype), pos_j)
        state["alpha"] = jnp.where(reset, jnp.ones_like(state["alpha"]),
                                   state["alpha"])
        if cfg.reset_source:
            source = state["source"]
            for s, mask in enumerate(params.intro_masks):
                source = jnp.where(reset & mask,
                                   jnp.asarray(s, source.dtype), source)
            state["source"] = source
        return state
    d_i = (ii - pos_i).astype(jnp.float32)
    d_j = (jj - pos_j).astype(jnp.float32)
    if mode == "constant":
        norm_base = jnp.maximum(jnp.abs(d_i), jnp.abs(d_j))
        safe = jnp.where(norm_base > 0, norm_base, 1.0)
        step_i = jnp.where(norm_base > 0, d_i / safe, d_i)
        step_j = jnp.where(norm_base > 0, d_j / safe, d_j)
        factor = cfg.reset_constant_step * params.reset_mask
        step_i = step_i * factor
        step_j = step_j * factor
        norm_scaled = jnp.maximum(jnp.abs(step_i), jnp.abs(step_j))
        overshoot = norm_scaled > norm_base
        step_i = jnp.where(overshoot, d_i, step_i)
        step_j = jnp.where(overshoot, d_j, step_j)
    elif mode == "linear":
        step_i = params.reset_mask * cfg.reset_linear_factor * d_i
        step_j = params.reset_mask * cfg.reset_linear_factor * d_j
    else:
        raise ValueError(f"Unknown reset mode {mode}")
    state = dict(state)
    # int16 + int32 promotes to int32; cast back to the carry dtype (the
    # stepped position stays in-frame for moveref, so this never wraps)
    state["pos_i"] = (pos_i + jnp.round(step_i).astype(jnp.int32)) \
        .astype(pos_i.dtype)
    state["pos_j"] = (pos_j + jnp.round(step_j).astype(jnp.int32)) \
        .astype(pos_j.dtype)
    return state


def _reference_rgba(params: LayerParams, state: dict, pixmaps) -> dict:
    """Regather rgba from the coordinate mapping.

    Parity: transflow/compositor/layers/reference.py:93-105, including the
    reference's per-source sequential alpha handling for 3-channel pixmaps.
    """
    h, w = params.height, params.width
    rgba = state["rgba"]
    rgb = rgba[..., :3]
    a = rgba[..., 3]
    mi = jnp.clip(state["pos_i"], 0, h - 1)
    mj = jnp.clip(state["pos_j"], 0, w - 1)
    slices = _gather_pixmap_slices(params, pixmaps, mi, mj)
    for s, gathered in zip(range(params.num_sources), slices):
        channels = params.channel_counts[s]
        sel = (state["source"] == s) & (state["alpha"] != 0)
        rgb = jnp.where(sel[..., None], gathered[..., :3], rgb)
        if channels == 4:
            a = jnp.where(sel, gathered[..., 3], a)
        else:
            a = jnp.where(sel, jnp.uint8(1), jnp.uint8(0))
    state = dict(state)
    state["rgba"] = jnp.concatenate([rgb, a[..., None]], axis=-1)
    return state


# --------------------------------------------------------------------------
# Per-class updates
# --------------------------------------------------------------------------

def update_moveref(params: LayerParams, state: dict, flow, pixmaps,
                   key, halo: int | None = None, mesh=None) -> dict:
    """MoveReferenceLayer.update (move_reference.py:12-14)."""
    channels = {"pos_i": state["pos_i"], "pos_j": state["pos_j"],
                "source": state["source"]}
    channels, alpha, _ = _movement(params, channels, state["alpha"], flow,
                                   halo, mesh)
    state = dict(state, **channels, alpha=alpha)
    state = _reset(params, state, key)
    return _reference_rgba(params, state, pixmaps)


def update_sum(params: LayerParams, state: dict, flow, pixmaps, key,
               halo: int | None = None, mesh=None) -> dict:
    """SumLayer.update: additive displacement, then reset + regather.

    Parity: sum.py:9-14 with the component transposition fixed (dy -> i)."""
    state = dict(state)
    # sum positions are int32 (init_layer_state) — unbounded accumulation
    state["pos_i"] = (state["pos_i"]
                      + jnp.floor(flow[..., 1]).astype(jnp.int32))
    state["pos_j"] = (state["pos_j"]
                      + jnp.floor(flow[..., 0]).astype(jnp.int32))
    state = _reset(params, state, key)
    return _reference_rgba(params, state, pixmaps)


def update_static(params: LayerParams, state: dict, flow, pixmaps,
                  key, halo: int | None = None, mesh=None) -> dict:
    """StaticLayer.update (static.py:14-17): masked blit, flow ignored."""
    rgba = state["rgba"]
    rgb = rgba[..., :3]
    a = rgba[..., 3]
    for s in range(params.num_sources):
        mask = params.intro_masks[s]
        pixmap = pixmaps[s]
        rgb = jnp.where(mask[..., None], pixmap[..., :3], rgb)
        if params.channel_counts[s] == 4:
            a = jnp.where(mask, pixmap[..., 3], a)
    return {"rgba": jnp.concatenate([rgb, a[..., None]], axis=-1)}


def update_introduction(params: LayerParams, state: dict, flow, pixmaps,
                        key, frame_numbers, halo: int | None = None,
                        mesh=None) -> dict:
    """IntroductionLayer.update (introduction.py:16-67): move pixels carrying
    their RGB, then introduce new pixels from each source."""
    cfg = params.cfg
    channels = {"rgb": state["rgb"], "source": state["source"],
                "pos_i": state["pos_i"], "pos_j": state["pos_j"],
                "frame": state["frame"]}
    channels, alpha, (moving, src_i, src_j) = _movement(
        params, channels, state["alpha"], flow, halo, mesh)
    state = dict(state, **channels, alpha=alpha)

    # Introduction eligibility (intended semantics; see module docstring).
    h, w = params.height, params.width
    filled = state["alpha"] != 0
    mask = jnp.ones((h, w), dtype=jnp.bool_)
    if not cfg.introduce_pixels_on_empty_spots:
        mask = mask & filled
    if not cfg.introduce_pixels_on_filled_spots:
        mask = mask & ~filled
    if not cfg.introduce_moving_pixels:
        mask = mask & ~moving
    if not cfg.introduce_unmoving_pixels:
        mask = mask & moving
    consider_flow = not (cfg.introduce_on_all_filled_spots
                         or cfg.introduce_on_all_empty_spots)
    if cfg.introduce_on_all_filled_spots:
        mask = mask | filled
    if cfg.introduce_on_all_empty_spots:
        mask = mask | ~filled
    if cfg.introduce_once:
        mask = mask & ~state["introduced_once"]

    ii, jj = _base_coords(h, w)
    gi = src_i if consider_flow else ii
    gj = src_j if consider_flow else jj
    slices = _gather_pixmap_slices(params, pixmaps, gi, gj)
    for s, gathered in zip(range(params.num_sources), slices):
        tgt = mask & params.intro_masks[s]
        new_rgb = gathered[..., :3]
        if params.channel_counts[s] == 4:
            new_a = gathered[..., 3].astype(ALPHA_DTYPE)
        else:
            new_a = jnp.ones((h, w), dtype=ALPHA_DTYPE)
        state["rgb"] = jnp.where(tgt[..., None], new_rgb, state["rgb"])
        state["alpha"] = jnp.where(tgt, new_a, state["alpha"])
        state["source"] = jnp.where(tgt, jnp.asarray(s, SOURCE_DTYPE),
                                    state["source"])
        state["pos_i"] = jnp.where(tgt, gi.astype(POS_DTYPE),
                                   state["pos_i"])
        state["pos_j"] = jnp.where(tgt, gj.astype(POS_DTYPE),
                                   state["pos_j"])
        state["frame"] = jnp.where(
            tgt, jnp.asarray(frame_numbers[s], dtype=jnp.int32),
            state["frame"])
    state["introduced_once"] = jnp.ones((), dtype=jnp.bool_)
    return state


# --------------------------------------------------------------------------
# Rendering
# --------------------------------------------------------------------------

def render_layer(params: LayerParams, state: dict):
    """Layer.render (layer.py:32-34): alpha *= mask_alpha (persists in state).

    Returns (new_state, rgba uint8)."""
    if params.cfg.classname == "introduction":
        alpha = jnp.clip(params.mask_alpha
                         * state["alpha"].astype(jnp.float32),
                         0, 255).astype(ALPHA_DTYPE)
        state = dict(state, alpha=alpha)
        rgba = jnp.concatenate(
            [state["rgb"], alpha.astype(jnp.uint8)[..., None]], axis=-1)
        return state, rgba
    rgba = state["rgba"]
    alpha = (params.mask_alpha
             * rgba[..., 3].astype(jnp.float32)).astype(jnp.uint8)
    rgba = jnp.concatenate([rgba[..., :3], alpha[..., None]], axis=-1)
    state = dict(state, rgba=rgba)
    return state, rgba


_UPDATE_FNS = {
    "moveref": update_moveref,
    "sum": update_sum,
    "static": update_static,
}


# --------------------------------------------------------------------------
# Whole-compositor step builder
# --------------------------------------------------------------------------

def build_compositor(layer_params: Sequence[LayerParams], height: int,
                     width: int, background_color: str = "#ffffff",
                     halo: int | None = None, mesh=None):
    """Build the pure compositor functions.

    Returns (init_fn, step_fn) where
      init_fn() -> state (list of layer state dicts)
      step_fn(state, flow, pixmaps, key, frame_numbers, render=True)
          -> (state, rgb | None)
    ``pixmaps`` is a tuple (one per layer) of tuples (one per source) of
    (H, W, C) uint8 arrays; ``frame_numbers`` mirrors that structure with
    int32 scalars. step_fn is pure and jit/scan-compatible.

    ``halo``: bounded-displacement movement gather for H-sharded multi-chip
    runs (see _movement); None = plain gather (single-chip default).

    Parity: transflow/compositor/compositor.py:17-53.
    """
    # numpy, not jnp: closure-captured device buffers trigger a pathological
    # TPU slow path (~10,000x; see LayerParams docstring)
    bg_color = np.asarray(parse_color(background_color), dtype=np.uint8)
    default_params = list(layer_params)

    def init_fn():
        return [init_layer_state(p) for p in default_params]

    def update_fn(state, flow, pixmaps, key, frame_numbers, params_list=None):
        params_list = default_params if params_list is None else params_list
        if not params_list:
            return []
        keys = jax.random.split(key, len(params_list))
        new_state = []
        for idx, params in enumerate(params_list):
            classname = params.cfg.classname
            if classname == "introduction":
                st = update_introduction(
                    params, state[idx], flow, pixmaps[idx], keys[idx],
                    frame_numbers[idx], halo, mesh)
            else:
                st = _UPDATE_FNS[classname](
                    params, state[idx], flow, pixmaps[idx], keys[idx],
                    halo, mesh)
            new_state.append(st)
        return new_state

    def render_fn(state, params_list=None):
        params_list = default_params if params_list is None else params_list
        image = jnp.broadcast_to(bg_color, (height, width, 3))
        new_state = []
        for idx, params in enumerate(params_list):
            st, rgba = render_layer(params, state[idx])
            new_state.append(st)
            image = jnp.where((rgba[..., 3] != 0)[..., None],
                              rgba[..., :3], image)
        return new_state, image

    def step_fn(state, flow, pixmaps, key, frame_numbers, render=True,
                params_list=None):
        state = update_fn(state, flow, pixmaps, key, frame_numbers,
                          params_list)
        if not render:
            return state, None
        return render_fn(state, params_list)

    step_fn.init = init_fn
    step_fn.update = update_fn
    step_fn.render = render_fn
    return init_fn, step_fn


def make_layer_params(layer_cfgs: Sequence[LayerConfig], height: int,
                      width: int, sources_by_layer: dict,
                      ) -> list[LayerParams]:
    """Assemble LayerParams for each config.

    ``sources_by_layer`` maps layer index (cfg.index) to a list of
    (channel_count, introduction_mask ndarray | None) tuples."""
    out = []
    for cfg in layer_cfgs:
        specs = sources_by_layer.get(cfg.index, [])
        intro_masks = []
        channel_counts = []
        for channels, mask in specs:
            if mask is None:
                mask = np.ones((height, width), dtype=bool)
            intro_masks.append(mask)
            channel_counts.append(channels)
        out.append(LayerParams(cfg, height, width, intro_masks,
                               channel_counts))
    return out
