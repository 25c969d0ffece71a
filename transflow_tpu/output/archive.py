"""Zip/numpy archive outputs: .flow.zip writer and checkpoint container.

Parity reference: transflow/output/zip.py:6-28 and numpy.py:6-15. The
checkpoint container stores arrays as .npy members instead of the
reference's pickled object graph (pickle-free by design, SURVEY §5).
"""
import io
import json
import zipfile
import zlib

import numpy as np

from ..utils import find_unique_path


class ZipOutput:
    """Deflated zip with a meta.json and named array members."""

    def __init__(self, path: str, replace: bool = False):
        self.path = path if replace else find_unique_path(path)
        self.zipfile = zipfile.ZipFile(self.path, "w",
                                       zipfile.ZIP_DEFLATED)

    def write_meta(self, meta: dict):
        self.zipfile.writestr("meta.json", json.dumps(meta))

    def write_array(self, name: str, array: np.ndarray):
        """Adaptive compression: dense float mantissas are near-
        incompressible (deflate gains ~8% on real f32 flows while costing
        ~4x the write and ~6x the read throughput — measured 1080p:
        stored 2.7/26.7 fps write/read vs deflated 0.7/4.1), but NOT all
        float members are dense — a motion-vector export of static
        footage yields exact-zero flows that deflate ~1000x. A 64 KiB
        level-1 probe decides per member: <50% ratio -> DEFLATED, else
        STORED (float only; integer arrays, e.g. ``--round-flow``
        exports, always deflate — 33x measured). Both are standard zip
        members — every reader (ours and the reference's) handles either
        transparently."""
        array = np.asarray(array)
        buffer = io.BytesIO()
        np.save(buffer, array)
        payload = buffer.getvalue()
        compress = zipfile.ZIP_DEFLATED
        if array.dtype.kind == "f":
            probe = payload[:65536]
            if len(zlib.compress(probe, 1)) >= len(probe) // 2:
                compress = zipfile.ZIP_STORED
        self.zipfile.writestr(name, payload, compress_type=compress)

    def write_arrays(self, name: str, arrays: dict):
        """Store a dict of arrays as one .npz member."""
        buffer = io.BytesIO()
        np.savez(buffer, **{k: np.asarray(v) for k, v in arrays.items()})
        self.zipfile.writestr(name, buffer.getvalue())

    def close(self):
        self.zipfile.close()


class NumpyArchiveOutput:
    """The .flow.zip writer: meta.json + one %09d.npy per frame."""

    def __init__(self, path: str, meta: dict, replace: bool = False):
        self.zip_output = ZipOutput(path, replace)
        self.zip_output.write_meta(meta)
        self.counter = 0

    @property
    def path(self):
        return self.zip_output.path

    def write_array(self, array: np.ndarray):
        self.zip_output.write_array(f"{self.counter:09d}.npy", array)
        self.counter += 1

    def close(self):
        self.zip_output.close()
