"""Multi-flow merging functions.

Parity reference: transflow/pipeline.py:149-158 (FLOW_MERGING_FUNCTIONS) and
transflow/utils.py:359-381 (multiply/binarize/absmax helpers). All merges are
elementwise jnp ops over a list of (H, W, 2) flows and fuse into the step.
"""
import jax.numpy as jnp

BINARIZE_THRESHOLD = 0.2  # px — parity: utils.py:368 (binarize_arrays)


def _product(flows):
    out = flows[0]
    for flow in flows[1:]:
        out = out * flow
    return out


def merge_first(flows):
    return flows[0]


def merge_sum(flows):
    return sum(flows[1:], flows[0])


def merge_average(flows):
    return merge_sum(flows) / len(flows)


def merge_difference(flows):
    return flows[0] - sum(flows[2:], flows[1]) if len(flows) > 1 else flows[0]


def merge_product(flows):
    return _product(flows)


def merge_maskbin(flows):
    masks = [jnp.where(jnp.abs(f) > BINARIZE_THRESHOLD, 1.0, 0.0)
             for f in flows[1:]]
    return _product([flows[0]] + masks)


def merge_masklin(flows):
    return _product([flows[0]] + [jnp.abs(f) for f in flows[1:]])


def merge_absmax(flows):
    """Per-element value with the largest magnitude across all flows."""
    stack = jnp.stack(flows)
    idx = jnp.argmax(jnp.abs(stack), axis=0, keepdims=True)
    return jnp.take_along_axis(stack, idx, axis=0)[0]


MERGE_FUNCTIONS = {
    "first": merge_first,
    "sum": merge_sum,
    "average": merge_average,
    "difference": merge_difference,
    "product": merge_product,
    "maskbin": merge_maskbin,
    "masklin": merge_masklin,
    "absmax": merge_absmax,
}


def get_merge_function(name: str):
    if name not in MERGE_FUNCTIONS:
        raise ValueError(f"Unknown flows merging function {name!r}")
    return MERGE_FUNCTIONS[name]
