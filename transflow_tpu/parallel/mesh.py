"""Multi-chip scaling: device mesh + sharding layout for the pipeline step.

The reference's only parallelism is a single-host process pipeline
(transflow/pipeline.py:56-136, SURVEY §2.3) — there is nothing to port.
The TPU-native scale-out axes are:

* ``stream`` (data parallelism): independent video streams / frame batches —
  each device group runs a full pipeline replica; zero communication.
* ``space`` (spatial parallelism): the H dimension of every (H, W[, C])
  array in the recurrence is sharded across devices. Stencil ops (flow
  estimators, kernel convolutions) need halo exchange and the movement
  gathers may cross shard boundaries — XLA inserts the collectives (ICI
  halo collective-permutes / all-gathers) under jit with sharding
  constraints.

Temporal recurrence stays sequential (lax.scan); parallelism is within-frame
and across streams, exactly as SURVEY §2.3 prescribes.

MEASURED (8-device CPU mesh, stream=2 x space=4, H=256 W=512 chunk=4,
horn-schunck moveref, compiled-HLO audit): per scan step XLA emits
* 1-row halo ``collective-permute``s (f32[1,1,W]) for the estimator and
  reset stencils — the cheap, intended pattern;
* ``all-to-all``s for pyramid resizes (small);
* **full-H ``all-gather``s for the movement gather**: pos_i/pos_j/alpha/
  source as s32[1,H,W] (plus one pred[1,H,W] mask and the u8[H,W,3]
  pixmap) are gathered to every device each frame, because
  ``data[target] = data[source + flow]`` has unbounded cross-shard reach.
  Traffic ~ 17*H*W bytes/frame/stream (~35 MB at 1080p) over ICI, versus a
  halo-window ideal of K*W bytes (K = max |flow_y|).

Scaling consequence: the ``space`` axis is profitable for the estimator
(pure stencils) but the compositor's default permutation step is
all-gather-bound. THE FIX (implemented): build the model with
``halo=K`` + a ``clip=K`` flow filter — the movement gather then goes
through ops/halo_gather.bounded_row_gather (edge-pad once, 2K+1 row-slice
views + row-local W gathers), which GSPMD partitions into neighbor-row
collective-permutes. Re-measured on the same configuration with halo=6:
all-gathers 5 -> 0; total collective bytes per compiled scan 2.92 MB ->
1.73 MB at space=4 — and the remaining traffic scales with K*W per shard
instead of full H*W, so the advantage grows with the space axis. Bit-exact
vs the single-device plain gather whenever |flow| <= K
(tests/test_halo_gather.py). Pixmaps are replicated (pixmap_spec) because
the render gather's reach is unbounded; that removed a sixth all-gather.
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, stream_axis: int | None = None):
    """Build a ('stream', 'space') mesh over the available devices.

    ``stream_axis``: how many ways to split across independent streams
    (defaults to 2 when n_devices is an even number > 1, else 1); the
    remaining factor shards space."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if stream_axis is None:
        stream_axis = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    space_axis = n_devices // stream_axis
    grid = np.asarray(devices).reshape(stream_axis, space_axis)
    return Mesh(grid, axis_names=("stream", "space"))


def parse_mesh_spec(spec: str) -> tuple[int, int]:
    """'8' -> (1, 8); '2x4' -> (2, 4) as (stream, space)."""
    spec = spec.strip().lower()
    if "x" in spec:
        stream_str, space_str = spec.split("x", 1)
        return int(stream_str), int(space_str)
    return 1, int(spec)


def make_space_mesh(n_space: int):
    """1-axis ('space',) mesh for single-stream spatially-sharded runs (the
    CLI pipeline: one video, H split over chips)."""
    devices = jax.devices()
    if n_space > len(devices):
        raise ValueError(
            f"mesh wants {n_space} devices but only {len(devices)} are "
            "visible")
    return Mesh(np.asarray(devices[:n_space]), axis_names=("space",))


def space_state_spec(leaf_ndim: int) -> P:
    """Engine-state leaves are (H, W[, C]): shard H over 'space'."""
    if leaf_ndim < 2:
        return P()
    return P("space", *([None] * (leaf_ndim - 1)))


def space_chunk_spec(leaf_ndim: int) -> P:
    """Stacked chunks are (K, H, W[, C]): shard H over 'space'."""
    if leaf_ndim < 3:
        return P()
    return P(None, "space", *([None] * (leaf_ndim - 2)))


def state_spec(leaf_ndim: int) -> P:
    """State leaves carry a leading stream dim then H: (S, H, ...)."""
    if leaf_ndim < 2:
        return P("stream") if leaf_ndim == 1 else P()
    return P("stream", "space", *([None] * (leaf_ndim - 2)))


def frames_spec(leaf_ndim: int) -> P:
    """Frame chunks: (S, K, H, W)."""
    return P("stream", None, "space", *([None] * (leaf_ndim - 3)))


def pixmap_spec(leaf_ndim: int) -> P:
    """Pixmaps are REPLICATED across the whole mesh.

    Measured (see module docstring): pixmaps are read-only and gathered
    through the accumulated mapping (pos_i/pos_j), whose reach is unbounded
    — sharding them over H forces a full all-gather every frame. Replication
    costs a few MB of HBM per device and removes that collective; the
    render gather then has sharded indices into a replicated operand, which
    GSPMD partitions with zero communication."""
    return P(*([None] * leaf_ndim))


def shard_model_inputs(mesh: Mesh, state, grays, pixmaps, keys):
    """device_put the scan inputs with their canonical shardings."""
    put = jax.device_put
    state = jax.tree.map(
        lambda x: put(jnp.asarray(x),
                      NamedSharding(mesh, state_spec(jnp.asarray(x).ndim))),
        state)
    grays = put(jnp.asarray(grays),
                NamedSharding(mesh, frames_spec(grays.ndim)))
    pixmaps = jax.tree.map(
        lambda x: put(jnp.asarray(x),
                      NamedSharding(mesh, pixmap_spec(jnp.asarray(x).ndim))),
        pixmaps)
    keys = put(keys, NamedSharding(mesh, P("stream")))
    return state, grays, pixmaps, keys


def sharded_scan(model, mesh: Mesh, per_stream_pixmaps: bool = False):
    """Jit the model's chunk scan with stream + spatial sharding.

    Returns fn(state, grays, pixmaps, t0, keys) -> (state, rgbs) where
    state/grays carry a leading stream-batch dim; the body is
    vmap(model.scan) over streams with sharding constraints pinning the
    layout (stream over 'stream', H over 'space').

    ``per_stream_pixmaps``: pixmap leaves carry a leading stream dim and
    each stream advects its OWN pixmap (extra/batch_render.py); default is
    one pixmap set replicated to every stream."""

    def constrained(tree, spec_fn):
        return jax.tree.map(
            lambda leaf: jax.lax.with_sharding_constraint(
                leaf, NamedSharding(mesh, spec_fn(leaf.ndim))), tree)

    def params_spec(leaf_ndim: int) -> P:
        if leaf_ndim < 2:
            return P()
        return pixmap_spec(leaf_ndim)

    def stream_pixmap_spec(leaf_ndim: int) -> P:
        return P("stream", *([None] * (leaf_ndim - 1)))

    @jax.jit
    def run(state, grays, pixmaps, t0, keys, params_list, pp_mask,
            est_params):
        state = constrained(state, state_spec)
        grays = constrained(grays, frames_spec)
        pixmaps = constrained(
            pixmaps,
            stream_pixmap_spec if per_stream_pixmaps else pixmap_spec)
        params_list = constrained(params_list, params_spec)
        # estimator weights: replicated across the mesh (small per-leaf)
        est_params = constrained(est_params, lambda nd: P())
        # spmd_axis_name: the vmapped stream dim is declared as the mesh's
        # 'stream' axis so manual-SPMD regions inside the step (the
        # shard_map'd sharded Pallas correlation when the estimator is
        # built with corr_mesh) compose with the batching — a no-op for
        # steps without shard_map (pinned bit-exact by the mesh tests)
        if per_stream_pixmaps:
            new_state, rgbs = jax.vmap(
                lambda s, g, k, pm: model.scan(
                    s, g, pm, t0, k, params_list, pp_mask,
                    est_params=est_params),
                spmd_axis_name="stream",
            )(state, grays, keys, pixmaps)
        else:
            new_state, rgbs = jax.vmap(
                lambda s, g, k: model.scan(s, g, pixmaps, t0, k, params_list,
                                           pp_mask, est_params=est_params),
                spmd_axis_name="stream",
            )(state, grays, keys)
        new_state = constrained(new_state, state_spec)
        rgbs = constrained(rgbs, frames_spec)
        return new_state, rgbs

    def wrapped(state, grays, pixmaps, t0, keys):
        return run(state, grays, pixmaps, t0, keys, model.layer_params,
                   model.pp_mask, getattr(model, "est_params", ()))

    return wrapped
