"""One-command published-weights fidelity check for LiteFlowNet.

The reference's documented weights source is the torch.hub URL in
/root/reference/transflow/flow/methods/liteflownet.py:585-590
(network-default.pytorch from sniklaus/pytorch-liteflownet). This build
environment has no egress, so the repo's loaders and network wiring are
proven against synthetic checkpoints and the reference net under
deterministic random weights (tests/test_liteflownet_parity.py); THIS
tool closes the remaining gap the moment any environment provides the
real file:

    python tools/verify_weights.py /path/to/network-default.pytorch

It then:
  1. computes the file's SHA-256 and compares it against the pinned value
     in docs/WEIGHTS.md (first verified run records it there);
  2. loads the checkpoint through the torch-free restricted unpickler
     (transflow_tpu/flow/estimators/torch_zip.py — zip container and
     legacy sequential formats share one entry point that dispatches on
     the container magic, so whichever format the file is in exercises
     its real production path);
  3. checks the converted parameter tree leaf-by-leaf (names, shapes,
     dtypes) against the Flax LiteFlowNet module's own init shapes;
  4. runs one forward pass on two bundled deterministic frames and prints
     a flow golden digest (mean |u|, mean |v|, sha256 of the rounded
     field) that can be diffed against the reference net's output for
     the same frames (tools/verify_weights.py --reference, runnable where
     torch + the reference package are importable).

Exit code 0 = every check passed.
"""
import argparse
import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

DOCS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "WEIGHTS.md")


def bundled_frames(height=256, width=448):
    """Two deterministic moving-texture frames (same recipe as bench.py's
    make_frames, fixed small shape so the golden is environment-stable)."""
    import scipy.ndimage
    rng = np.random.default_rng(7)
    base = scipy.ndimage.gaussian_filter(
        rng.integers(0, 256, (height + 32, width + 32)).astype(np.float32), 2)
    base = (255 * (base - base.min()) / np.ptp(base)).astype(np.uint8)
    f0 = base[16:16 + height, 16:16 + width]
    f1 = base[13:13 + height, 18:18 + width]  # dy=-3, dx=+2
    return (np.repeat(f0[..., None], 3, axis=2),
            np.repeat(f1[..., None], 3, axis=2))


def sha256_of(path: str) -> str:
    digest = hashlib.sha256()
    with open(path, "rb") as file:
        for block in iter(lambda: file.read(1 << 20), b""):
            digest.update(block)
    return digest.hexdigest()


def pinned_sha() -> str | None:
    try:
        text = open(DOCS).read()
    except OSError:
        return None
    match = re.search(r"sha256:\s*`([0-9a-f]{64})`", text)
    return match.group(1) if match else None


def flow_digest(flow: np.ndarray) -> dict:
    rounded = np.round(np.asarray(flow, np.float64), 3)
    return {
        "shape": list(flow.shape),
        "mean_abs_u": round(float(np.mean(np.abs(rounded[..., 0]))), 4),
        "mean_abs_v": round(float(np.mean(np.abs(rounded[..., 1]))), 4),
        "sha256_rounded_mm": hashlib.sha256(
            rounded.astype("<f8").tobytes()).hexdigest(),
    }


def verify(path: str) -> dict:
    import jax
    from transflow_tpu.flow.estimators.liteflownet import (
        LiteFlowNet, load_torch_weights)

    out: dict = {"file": path, "sha256": sha256_of(path)}
    pin = pinned_sha()
    out["sha256_pinned"] = pin
    out["sha256_match"] = (pin == out["sha256"]) if pin else "unpinned"

    variables = load_torch_weights(path)

    model = LiteFlowNet()
    dummy = np.zeros((64, 64, 3), np.float32)
    expected = jax.eval_shape(
        lambda: model.init(jax.random.key(0), dummy, dummy))
    exp_leaves = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_flatten_with_path(expected)[0]}
    got_leaves = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_flatten_with_path(variables)[0]}
    problems = []
    for name, spec in exp_leaves.items():
        if name not in got_leaves:
            problems.append(f"missing: {name}")
            continue
        leaf = got_leaves[name]
        if tuple(leaf.shape) != tuple(spec.shape):
            problems.append(f"shape {name}: {leaf.shape} != {spec.shape}")
        if np.dtype(leaf.dtype) != np.dtype(spec.dtype):
            problems.append(f"dtype {name}: {leaf.dtype} != {spec.dtype}")
    for name in got_leaves:
        if name not in exp_leaves:
            problems.append(f"unexpected: {name}")
    out["tree_leaves"] = len(exp_leaves)
    out["tree_problems"] = problems

    if not problems:
        from transflow_tpu.flow.estimators.liteflownet import liteflownet
        f0, f1 = bundled_frames()
        flow = np.asarray(liteflownet(f0, f1, params=jax.tree.map(
            lambda x: jax.numpy.asarray(x), variables)))
        out["flow_golden"] = flow_digest(flow)
    out["ok"] = not problems
    return out


def verify_reference(path: str) -> dict:
    """Same two frames through the reference torch net (runnable only
    where torch-cuda + the reference package import); prints the digest
    to diff against verify()'s flow_golden."""
    sys.path.insert(0, "/root/reference")
    import torch
    from transflow.flow.methods import liteflownet as ref

    f0, f1 = bundled_frames()
    # reference Network() takes no path — it pulls from torch.hub
    # (liteflownet.py:585-590); route that loader at the local file
    torch.hub.load_state_dict_from_url = (
        lambda *a, **k: torch.load(path, map_location="cpu",
                                   weights_only=True))
    net = ref.Network().eval()
    t0 = torch.from_numpy(f0.transpose(2, 0, 1)[None].astype(np.float32)
                          / 255.0)
    t1 = torch.from_numpy(f1.transpose(2, 0, 1)[None].astype(np.float32)
                          / 255.0)
    flow = ref.estimate(net, t0[0], t1[0]).numpy().transpose(1, 2, 0)
    return {"flow_golden": flow_digest(flow)}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("path", help="network-default.pytorch")
    parser.add_argument("--reference", action="store_true",
                        help="digest the reference torch net instead")
    args = parser.parse_args()
    result = (verify_reference if args.reference else verify)(args.path)
    print(json.dumps(result, indent=2))
    sys.exit(0 if result.get("ok", True) else 1)


if __name__ == "__main__":
    main()
