"""Pure-numpy reader for the torch zip serialization format.

The published LiteFlowNet checkpoint (network-default.pytorch) is a torch
state_dict saved in torch's zipfile format; this environment may not ship
torch, so the weights must load without it. The format is simple: a zip
archive holding ``<name>/data.pkl`` (a pickle whose tensors are persistent-id
references) plus one raw little-endian buffer per storage under
``<name>/data/<key>``. Security: a RESTRICTED unpickler — only the handful of
globals a torch state_dict legitimately contains are resolvable
(tensor/parameter rebuilders, OrderedDict, storage type tags); anything else
raises. This is strictly safer than ``torch.load`` without
``weights_only=True`` (the reference loads its checkpoint through torch.hub,
transflow/flow/methods/liteflownet.py:585-590).
"""
import collections
import pickle
import zipfile

import numpy as np

__all__ = ["load_torch_zip"]

# torch storage class name -> numpy dtype ("bfloat16" handled specially:
# numpy has no bf16, so buffers widen to float32 through a bit shift)
_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
    "BFloat16Storage": None,
}


class _StorageTag:
    """Stand-in for a torch storage class inside the pickle stream."""

    def __init__(self, name: str):
        self.name = name


_STORAGE_TAGS = {name: _StorageTag(name) for name in _STORAGE_DTYPES}


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_unused):
    """numpy equivalent of torch._utils._rebuild_tensor_v2: view the flat
    storage through (size, stride) starting at storage_offset."""
    itemsize = storage.dtype.itemsize
    strides = tuple(s * itemsize for s in stride)
    flat = storage[storage_offset:]
    return np.lib.stride_tricks.as_strided(
        flat, shape=tuple(size), strides=strides).copy()


def _rebuild_parameter(tensor, _requires_grad=True, *_unused):
    return tensor


_ALLOWED_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): collections.OrderedDict,
    **{("torch", name): tag for name, tag in _STORAGE_TAGS.items()},
}


class _RestrictedUnpickler(pickle.Unpickler):

    def __init__(self, file, read_storage):
        super().__init__(file)
        self._read_storage = read_storage

    def find_class(self, module, name):
        try:
            return _ALLOWED_GLOBALS[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"torch_zip: global {module}.{name} is not allowed in a "
                "weights checkpoint") from None

    def persistent_load(self, pid):
        kind, storage_tag, key, _location, numel = pid
        if kind != "storage" or not isinstance(storage_tag, _StorageTag):
            raise pickle.UnpicklingError(
                f"torch_zip: unsupported persistent id {pid!r}")
        return self._read_storage(storage_tag.name, key, numel)


def load_torch_zip(path: str) -> dict:
    """Load a torch-format checkpoint into {name: np.ndarray} without torch.

    Big-endian hosts/checkpoints are not supported (the ``byteorder`` entry,
    when present, must say "little" — true for every published checkpoint).
    """
    if not zipfile.is_zipfile(path):
        raise ValueError(
            f"torch_zip: {path!r} is not a torch zip-format checkpoint "
            "(legacy tar-format checkpoints from torch < 1.6 are not "
            "supported — re-save with a modern torch.save)")
    with zipfile.ZipFile(path) as archive:
        names = archive.namelist()
        pkl_name = next((n for n in names if n.endswith("/data.pkl")), None)
        if pkl_name is None:
            raise ValueError(
                f"torch_zip: {path!r} has no data.pkl entry — not a torch "
                "checkpoint archive")
        prefix = pkl_name[: -len("data.pkl")]
        byteorder_name = prefix + "byteorder"
        if byteorder_name in names:
            order = archive.read(byteorder_name).decode("ascii").strip()
            if order != "little":
                raise ValueError(f"torch_zip: {order}-endian checkpoints "
                                 "are not supported")

        def read_storage(type_name, key, numel):
            raw = archive.read(f"{prefix}data/{key}")
            if type_name == "BFloat16Storage":
                bits = np.frombuffer(raw, dtype="<u2", count=numel)
                return (bits.astype(np.uint32) << 16).view(np.float32)
            dtype = _STORAGE_DTYPES[type_name]
            return np.frombuffer(raw, dtype=dtype, count=numel)

        with archive.open(pkl_name) as file:
            state = _RestrictedUnpickler(file, read_storage).load()
    if not isinstance(state, (dict, collections.OrderedDict)):
        raise ValueError("torch_zip: checkpoint did not contain a state dict")
    return dict(state)
