"""Generate the standard flow-convolution kernel assets (``--kernel``).

Parity reference: assets/kernels/kernels.py in ychalier/transflow — the
kernel names and values below are that script's output spec (standard
image-processing stencils), so archives/configs referencing e.g.
``3x3/blur-gaussian.npy`` behave identically here. The flow convolution
itself runs on device (ops/image.conv2d_same via FlowSource's
``kernel_path``); USAGE.md documents that it impacts performance.

Usage: python extra/make_kernels.py [folder]
"""
import argparse
import os

import numpy as np

_K = {
    "3x3/identity": [[0, 0, 0], [0, 1, 0], [0, 0, 0]],
    "3x3/gradx": [[-1, 0, 1]] * 3,
    "3x3/grady": [[-1, -1, -1], [0, 0, 0], [1, 1, 1]],
    "3x3/gradxy": [[-2, -1, 0], [-1, 0, 1], [0, 1, 2]],
    "3x3/edge-cross": [[0, -1, 0], [-1, 4, -1], [0, -1, 0]],
    "3x3/edge-box": [[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]],
    "3x3/edge-corners": [[1, 0, -1], [0, 0, 0], [-1, 0, 1]],
    "3x3/sharpen": [[0, -1, 0], [-1, 5, -1], [0, -1, 0]],
    "3x3/blur-box": (np.ones((3, 3)) / 9).tolist(),
}

_GAUSS5 = np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]).astype(np.float64)


def kernels() -> dict:
    """name -> 2-D float array for every standard kernel."""
    out = {name: np.asarray(values, dtype=np.float64)
           for name, values in _K.items()}
    out["3x3/blur-gaussian"] = (
        np.outer([1, 2, 1], [1, 2, 1]).astype(np.float64) / 16)
    out["5x5/blur-gaussian"] = _GAUSS5 / 256
    unsharp = -_GAUSS5 / 256
    unsharp[2, 2] = 476 / 256
    out["5x5/unsharp"] = unsharp
    return out


def create_kernels(folder: str = ".") -> list[str]:
    paths = []
    for name, kernel in kernels().items():
        path = os.path.join(folder, name + ".npy")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.save(path, kernel)
        paths.append(path)
    return paths


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("folder", type=str, default=".", nargs="?",
                        help="destination kernel folder")
    created = create_kernels(parser.parse_args().folder)
    print(f"wrote {len(created)} kernels")


if __name__ == "__main__":
    main()
