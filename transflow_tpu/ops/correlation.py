"""Cost-volume correlation (FlowNet-style 7x7 window).

Parity reference: the raw CUDA kernels in
transflow/flow/methods/liteflownet.py:48-116 (kernel_Correlation_updateOutput:
49 displacement channels over a +-3 window, optional stride 2, output
normalized by the channel count). On TPU the cost volume is expressed as 49
statically-shifted elementwise products with channel-mean reductions — pure
VPU work that XLA fuses; the shifts are static slices of one padded buffer,
so no gather is involved.
"""
import jax
import jax.numpy as jnp

WINDOW = 7
MAX_DISP = 3


def correlation7x7(f1, f2, stride: int = 1):
    """(H, W, C) x (H, W, C) -> (H//stride, W//stride, 49) cost volume.

    out[y, x, (dy+3)*7+(dx+3)] =
        mean_c f1[y*s, x*s, c] * f2[y*s + dy*s, x*s + dx*s, c]
    with zero padding outside the frame (matching the CUDA kernel's padded
    rbot buffers)."""
    h, w, c = f1.shape
    pad = MAX_DISP * stride
    f2p = jnp.pad(f2, ((pad, pad), (pad, pad), (0, 0)))
    f1s = f1[::stride, ::stride] if stride > 1 else f1
    outs = []
    for dy in range(-MAX_DISP, MAX_DISP + 1):
        for dx in range(-MAX_DISP, MAX_DISP + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (pad + dy * stride, pad + dx * stride, 0), (h, w, c))
            if stride > 1:
                shifted = shifted[::stride, ::stride]
            outs.append(jnp.mean(f1s * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


def correlation(f1, f2, stride: int = 1, kernel: str | None = None,
                mesh=None):
    """Backend dispatcher: the Pallas band kernel on TPU (1,000-55,000x
    faster than the XLA shift formulation, measured on v5e), XLA elsewhere.

    ``kernel``: 'xla' forces the shift formulation, 'pallas' forces the
    band kernel, 'pallas_halo' runs the band kernel under GSPMD H-sharding
    via shard_map + boundary-row collective-permutes (``mesh`` required —
    a mesh with a 'space' axis; engine.mesh_safe_estimator_kwargs selects
    this for --mesh runs on the TPU backend). None dispatches on the
    backend. Plain 'pallas' under GSPMD fails to trace: the kernel is a
    tpu_custom_call with no SPMD partitioning rule.

    'pallas_halo' levels whose H doesn't split exactly over the mesh (or
    whose shards would be tiny) fall back to the XLA formulation — a
    trace-time, static-shape decision (the LiteFlowNet pyramid's top
    levels at high space-axis counts)."""
    if kernel not in (None, "xla", "pallas", "pallas_halo"):
        raise ValueError(
            "correlation kernel must be 'xla', 'pallas' or 'pallas_halo', "
            f"got {kernel!r}")
    if kernel == "pallas_halo":
        if mesh is None:
            raise ValueError("correlation kernel 'pallas_halo' needs a mesh")
        if "space" not in mesh.shape:
            raise ValueError(
                "correlation kernel 'pallas_halo' shards over a 'space' "
                f"mesh axis; got axes {tuple(mesh.shape)}")
        from .pallas_correlation import (sharded_ok,
                                         sharded_pallas_correlation7x7)
        if sharded_ok(f1.shape[0], mesh.shape["space"], stride):
            return sharded_pallas_correlation7x7(
                f1, f2, mesh, stride=stride,
                interpret=jax.default_backend() == "cpu")
        return correlation7x7(f1, f2, stride=stride)
    if kernel == "xla":
        return correlation7x7(f1, f2, stride=stride)
    if kernel == "pallas" or jax.default_backend() != "cpu":
        from .pallas_correlation import pallas_correlation7x7
        return pallas_correlation7x7(
            f1, f2, stride=stride,
            interpret=jax.default_backend() == "cpu")
    return correlation7x7(f1, f2, stride=stride)
