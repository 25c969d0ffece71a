"""Optical-flow estimators, all device-native.

Parity reference: transflow/flow/methods/ (horn_schunck.py, lukas_kanade.py,
liteflownet.py) and the cv2 Farneback call in flow/sources/cv.py:478-490.
"""
from .farneback import farneback
from .horn_schunck import horn_schunck
from .lucas_kanade import lucas_kanade

__all__ = ["farneback", "horn_schunck", "lucas_kanade", "get_estimator"]


def get_estimator(method: str):
    if method == "farneback":
        return farneback
    if method == "horn-schunck":
        return horn_schunck
    if method == "lukas-kanade":
        return lucas_kanade
    if method == "liteflownet":
        from .liteflownet import liteflownet
        return liteflownet
    raise ValueError(f"Unknown flow method {method!r}")
