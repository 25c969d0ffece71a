"""Array type aliases shared across the framework.

Parity reference: transflow/types.py:6-14 (numpy aliases). Here the aliases
cover both host (numpy) and device (jax.Array) arrays: the host I/O ring deals
in numpy uint8 frames, everything past `device_put` is a jax.Array.
"""
from typing import Union

import numpy as np
import jax

Array = Union[np.ndarray, jax.Array]

# (H, W) uint8 luminance frame
Grey = Array
# (H, W, 3) uint8
Rgb = Array
# (H, W, 4) uint8
Rgba = Array
# (H, W, 2) float32 optical flow, [..., 0] = dx (x/j component), [..., 1] = dy (y/i component)
Flow = Array
Pixmap = Array  # Rgb | Rgba
# (H, W) bool
BoolMask = Array
# (H, W) float32 in [0, 1]
FloatMask = Array
