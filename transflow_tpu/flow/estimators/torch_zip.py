"""Pure-numpy reader for torch checkpoint serialization formats.

The published LiteFlowNet checkpoint (network-default.pytorch) is a torch
state_dict; this environment may not ship torch, so the weights must load
without it. Two on-disk formats exist and both are supported:

- **zip format** (torch >= 1.6): a zip archive holding ``<name>/data.pkl``
  (a pickle whose tensors are persistent-id references) plus one raw
  little-endian buffer per storage under ``<name>/data/<key>``.
- **legacy format** (torch < 1.6 — the 2019 network-default.pytorch
  vintage): a flat stream of four pickles (magic number, protocol version,
  sys_info, the state dict) followed by a pickle listing storage keys and
  then, per key, an int64 element count + the raw buffer. Because the raw
  buffers come *after* the state-dict pickle, loading is two-pass: pass 1
  walks the pickle with stub rebuilders to find where the data section
  starts, pass 2 re-reads it with the real storages in hand.

Security: a RESTRICTED unpickler — only the handful of globals a torch
state_dict legitimately contains are resolvable (tensor/parameter
rebuilders, OrderedDict, storage type tags); anything else raises. Tensor
views are bounds-checked against their storage before ``as_strided`` (a
crafted shape/stride/offset would otherwise read out-of-bounds process
memory — the same check torch's ``weights_only`` loader performs). This is
strictly safer than ``torch.load`` without ``weights_only=True`` (the
reference loads its checkpoint through torch.hub,
transflow/flow/methods/liteflownet.py:585-590).
"""
import collections
import io
import pickle
import struct
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

# Serialized element size per storage type (bf16 is 2 bytes on disk even
# though it widens to float32 in memory).
_STORAGE_ITEMSIZES = {
    name: (2 if dtype is None else dtype.itemsize)
    for name, dtype in _STORAGE_DTYPES.items()
}

_LEGACY_MAGIC = 0x1950A86A20F9469CFC6C
_LEGACY_PROTOCOL = 1001


class _StorageTag:
    """Stand-in for a torch storage class inside the pickle stream."""

    def __init__(self, name: str):
        self.name = name


_STORAGE_TAGS = {name: _StorageTag(name) for name in _STORAGE_DTYPES}


def _widen_buffer(type_name: str, raw: bytes, numel: int) -> np.ndarray:
    if type_name == "BFloat16Storage":
        bits = np.frombuffer(raw, dtype="<u2", count=numel)
        return (bits.astype(np.uint32) << 16).view(np.float32)
    return np.frombuffer(raw, dtype=_STORAGE_DTYPES[type_name], count=numel)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_unused):
    """numpy equivalent of torch._utils._rebuild_tensor_v2: view the flat
    storage through (size, stride) starting at storage_offset.

    The (shape, stride, offset) triple comes from the pickle stream, i.e.
    is attacker-controlled; validate it addresses only bytes inside the
    storage before as_strided (torch's weights_only loader performs the
    equivalent check)."""
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    storage_offset = int(storage_offset)
    if len(size) != len(stride):
        raise pickle.UnpicklingError(
            f"torch_zip: tensor rank mismatch (size {size}, stride {stride})")
    if storage_offset < 0 or any(s < 0 for s in size + stride):
        raise pickle.UnpicklingError(
            "torch_zip: negative tensor size/stride/offset in checkpoint")
    if 0 in size:
        return np.zeros(size, dtype=storage.dtype)
    span = storage_offset + sum((s - 1) * st for s, st in zip(size, stride)) + 1
    if span > storage.size:
        raise pickle.UnpicklingError(
            f"torch_zip: tensor view (offset {storage_offset}, size {size}, "
            f"stride {stride}) addresses {span} elements but its storage "
            f"holds only {storage.size}")
    itemsize = storage.dtype.itemsize
    strides = tuple(s * itemsize for s in stride)
    flat = storage[storage_offset:]
    return np.lib.stride_tricks.as_strided(
        flat, shape=size, strides=strides).copy()


def _rebuild_parameter(tensor, _requires_grad=True, *_unused):
    return tensor


_ALLOWED_GLOBALS = {
    ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
    ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    ("collections", "OrderedDict"): collections.OrderedDict,
    **{("torch", name): tag for name, tag in _STORAGE_TAGS.items()},
}


class _RestrictedUnpickler(pickle.Unpickler):

    def __init__(self, file, persistent_load=None, stub_rebuild=False):
        super().__init__(file)
        self._persistent_load = persistent_load
        self._stub_rebuild = stub_rebuild

    def find_class(self, module, name):
        try:
            resolved = _ALLOWED_GLOBALS[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"torch_zip: global {module}.{name} is not allowed in a "
                "weights checkpoint") from None
        if self._stub_rebuild and resolved in (_rebuild_tensor_v2,
                                               _rebuild_parameter):
            return lambda *args: None
        return resolved

    def persistent_load(self, pid):
        if self._persistent_load is None:
            raise pickle.UnpicklingError(
                f"torch_zip: unexpected persistent id {pid!r}")
        return self._persistent_load(pid)


def _load_zip_format(path: str) -> dict:
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

        def persistent_load(pid):
            kind, storage_tag, key, _location, numel = pid
            if kind != "storage" or not isinstance(storage_tag, _StorageTag):
                raise pickle.UnpicklingError(
                    f"torch_zip: unsupported persistent id {pid!r}")
            raw = archive.read(f"{prefix}data/{key}")
            return _widen_buffer(storage_tag.name, raw, numel)

        with archive.open(pkl_name) as file:
            return _RestrictedUnpickler(
                file, persistent_load=persistent_load).load()


def _load_legacy_format(path: str) -> dict:
    """Read the pre-1.6 sequential format (torch serialization.py
    _legacy_load): magic, protocol, sys_info and state-dict pickles, then a
    storage-key list pickle, then per key ``<int64 numel><raw bytes>``."""
    with open(path, "rb") as f:
        blob = f.read()
    buf = io.BytesIO(blob)

    def plain_pickle():
        return _RestrictedUnpickler(buf).load()

    try:
        magic = plain_pickle()
        protocol = plain_pickle()
        sys_info = plain_pickle()  # {protocol_version, little_endian, ...}
    except Exception as exc:
        raise ValueError(
            f"torch_zip: {path!r} is neither a torch zip-format nor a "
            f"legacy-format checkpoint ({exc})") from exc
    if magic != _LEGACY_MAGIC or protocol != _LEGACY_PROTOCOL:
        raise ValueError(
            f"torch_zip: {path!r} is not a torch checkpoint (bad legacy "
            "magic/protocol)")
    if isinstance(sys_info, dict) and not sys_info.get("little_endian", True):
        raise ValueError(
            "torch_zip: big-endian legacy checkpoints are not supported")

    # Pass 1: walk the state-dict pickle with stub rebuilders to learn each
    # storage's dtype/numel and find where the data section starts.
    storage_meta = {}

    def record_pid(pid):
        kind, storage_tag, key, _location, numel, view_metadata = (
            pid if len(pid) == 6 else tuple(pid) + (None,))
        if kind != "storage" or not isinstance(storage_tag, _StorageTag):
            raise pickle.UnpicklingError(
                f"torch_zip: unsupported persistent id {pid!r}")
        storage_meta[key] = (storage_tag.name, int(numel))
        return None

    dict_start = buf.tell()
    _RestrictedUnpickler(buf, persistent_load=record_pid,
                         stub_rebuild=True).load()
    dict_end = buf.tell()

    keys = _RestrictedUnpickler(buf).load()
    if not isinstance(keys, list):
        raise ValueError("torch_zip: legacy checkpoint key list is malformed")

    storages = {}
    for key in keys:
        if key not in storage_meta:
            raise ValueError(
                f"torch_zip: legacy data section names unknown storage {key!r}")
        type_name, numel = storage_meta[key]
        (count,) = struct.unpack("<q", buf.read(8))
        if count != numel:
            raise ValueError(
                f"torch_zip: storage {key!r} element count mismatch "
                f"({count} on disk vs {numel} in pickle)")
        raw = buf.read(numel * _STORAGE_ITEMSIZES[type_name])
        storages[key] = _widen_buffer(type_name, raw, numel)

    # Pass 2: re-read the state-dict pickle with the storages resolved.
    def resolve_pid(pid):
        key = pid[2]
        storage = storages[key]
        view_metadata = pid[5] if len(pid) == 6 else None
        if view_metadata is not None:
            _view_key, offset, view_size = view_metadata
            offset, view_size = int(offset), int(view_size)
            if offset < 0 or view_size < 0 or offset + view_size > storage.size:
                raise pickle.UnpicklingError(
                    f"torch_zip: storage view {view_metadata!r} out of bounds")
            return storage[offset:offset + view_size]
        return storage

    return _RestrictedUnpickler(
        io.BytesIO(blob[dict_start:dict_end]),
        persistent_load=resolve_pid).load()


def load_torch_zip(path: str) -> dict:
    """Load a torch-format checkpoint into {name: np.ndarray} without torch.

    Handles both the zip format (torch >= 1.6) and the legacy sequential
    format (torch < 1.6 — the published 2019 network-default.pytorch).
    Big-endian hosts/checkpoints are not supported (legacy sys_info and the
    zip ``byteorder`` entry must say little-endian — true for every
    published checkpoint).
    """
    if zipfile.is_zipfile(path):
        state = _load_zip_format(path)
    else:
        state = _load_legacy_format(path)
    if not isinstance(state, (dict, collections.OrderedDict)):
        raise ValueError("torch_zip: checkpoint did not contain a state dict")
    return dict(state)
