"""webdataset-compatible tar shard IO (no webdataset dependency).

Shard format follows the reference spec (reference: doc/dataset_format.md):
  - image shards: ``<key>.image`` members holding npy uint8 HWC arrays;
  - feature shards: ``<key>.<model_name>.safetensors`` members holding
    {"embedding": [C,H,W] bf16, "cls_token": [C], ...};
  - 1000 samples/shard, ``splits.json`` per dataset.

The webdataset convention splits member names at the FIRST dot: everything
before is the sample key, everything after is the field name.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Any, Callable, Iterator, Optional

import numpy as np


def encode_image_npy(image: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, image)
    return buf.getvalue()


def decode_npy_view(data) -> np.ndarray:
    """npy bytes/memoryview -> array VIEW into the buffer (zero copy).

    Hand-parses the npy v1/v2 header so mmap'd shard members decode without
    np.load's BytesIO copy; falls back to np.load for exotic headers."""
    buf = memoryview(data)
    if bytes(buf[:6]) != b"\x93NUMPY":
        raise ValueError("not an npy buffer")
    major = buf[6]
    if major == 1:
        hlen = int.from_bytes(bytes(buf[8:10]), "little")
        start = 10 + hlen
        header = bytes(buf[10:start])
    else:
        hlen = int.from_bytes(bytes(buf[8:12]), "little")
        start = 12 + hlen
        header = bytes(buf[12:start])
    import ast

    meta = ast.literal_eval(header.decode("latin1"))
    if meta.get("fortran_order"):
        return np.load(io.BytesIO(bytes(buf)))
    dtype = np.dtype(meta["descr"])
    return np.frombuffer(buf, dtype, offset=start).reshape(meta["shape"])


def decode_image_npy(data) -> np.ndarray:
    """npy bytes/view -> RGB uint8 HWC (gray/RGBA converted like reference
    decode_sample; src/theia/dataset/data_utils.py:162-168)."""
    image = decode_npy_view(data)
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    elif image.ndim == 3 and image.shape[-1] == 4:
        # RGBA -> RGB (cv2.COLOR_RGBA2RGB drops alpha)
        image = image[..., :3]
    return image


def _safetensors_dtypes() -> tuple[dict, dict]:
    """(name->np.dtype, np.dtype->name) incl. bfloat16 via ml_dtypes — the
    stock safetensors.numpy codec has no BF16 support, but the reference
    stores features in bf16 (feature_extraction_core/models.py:56)."""
    table: dict[str, Any] = {
        "F64": np.float64, "F32": np.float32, "F16": np.float16,
        "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
        "U8": np.uint8, "BOOL": np.bool_,
    }
    try:
        import ml_dtypes

        table["BF16"] = ml_dtypes.bfloat16
    except Exception:  # pragma: no cover
        pass
    fwd = {k: np.dtype(v) for k, v in table.items()}
    return fwd, {v: k for k, v in fwd.items()}


_ST_FROM_NAME, _ST_TO_NAME = _safetensors_dtypes()


def save_safetensors_np(tensors: dict[str, np.ndarray]) -> bytes:
    """Serialize to safetensors format (8-byte LE header length + JSON header
    + packed buffers); bit-compatible with the official library."""
    header: dict[str, Any] = {}
    buffers: list[bytes] = []
    offset = 0
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        raw = arr.tobytes()
        header[name] = {
            "dtype": _ST_TO_NAME[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        buffers.append(raw)
        offset += len(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode()
    return len(hjson).to_bytes(8, "little") + hjson + b"".join(buffers)


def load_safetensors_np(data) -> dict[str, np.ndarray]:
    """bytes/memoryview -> dict of array VIEWS into the buffer (zero copy)."""
    hlen = int.from_bytes(bytes(data[:8]), "little")
    header = json.loads(bytes(data[8 : 8 + hlen]))
    base = 8 + hlen
    out: dict[str, np.ndarray] = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        lo, hi = meta["data_offsets"]
        dtype = _ST_FROM_NAME[meta["dtype"]]
        count = (hi - lo) // dtype.itemsize
        arr = np.frombuffer(data, dtype=dtype, count=count, offset=base + lo)
        out[name] = arr.reshape(meta["shape"])
    return out


class ShardWriter:
    """Write one tar shard of (key, field) -> bytes members."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._tar = tarfile.open(path, "w")

    def write(self, name: str, data: bytes) -> None:
        info = tarfile.TarInfo(name=name)
        info.size = len(data)
        self._tar.addfile(info, io.BytesIO(data))

    def write_sample(self, key: str, fields: dict[str, bytes]) -> None:
        for field, data in fields.items():
            self.write(f"{key}.{field}", data)

    def close(self) -> None:
        self._tar.close()

    def __enter__(self) -> "ShardWriter":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.close()


def split_member_name(name: str) -> tuple[str, str]:
    """webdataset convention: split at the first dot of the basename."""
    base = os.path.basename(name)
    key, _, field = base.partition(".")
    return key, field


def iter_members(path: str) -> Iterator[tuple[str, bytes]]:
    """Stream (member_name, bytes) in archive order."""
    with tarfile.open(path, "r") as tar:
        for member in tar:
            if not member.isfile():
                continue
            f = tar.extractfile(member)
            if f is not None:
                yield member.name, f.read()


class ShardIndex:
    """mmap-backed zero-copy shard access.

    The streaming reader (iter_members) pays a Python-level read + bytes
    copy per member; here the shard is mmap'd once, headers are walked by
    the native tar indexer (theia_tpu/data/fastpack.py; tarfile fallback),
    and members are memoryview slices — decoded arrays are views into the
    OS page cache, so the only copy left in the load path is the final
    batch collation. Views keep the mmap alive; nothing to close manually.
    """

    def __init__(self, path: str) -> None:
        import mmap as _mmap

        self.path = path
        with open(path, "rb") as f:
            self._mm = _mmap.mmap(f.fileno(), 0, access=_mmap.ACCESS_READ)
        self.members: list[tuple[str, int, int]] = []  # (name, data_off, size)

        from theia_tpu.data.fastpack import tar_index

        idx = tar_index(self._mm)
        if idx is not None:
            for hdr_off, data_off, size in idx:
                raw = self._mm[hdr_off : hdr_off + 100]
                name = raw.split(b"\x00", 1)[0].decode("utf-8")
                if len(name) >= 100:  # pax/GNU long name: needs tarfile
                    self.members.clear()
                    idx = None
                    break
                self.members.append((name, int(data_off), int(size)))
        if idx is None:  # no native lib / long names: tarfile header walk
            with tarfile.open(path, "r") as tar:
                for m in tar:
                    if m.isfile():
                        self.members.append((m.name, m.offset_data, m.size))

    def view(self, data_off: int, size: int) -> memoryview:
        return memoryview(self._mm)[data_off : data_off + size]

    def samples(self) -> Iterator[tuple[str, dict[str, memoryview]]]:
        """Group consecutive members by sample key (webdataset convention)."""
        current_key: Optional[str] = None
        fields: dict[str, memoryview] = {}
        for name, off, size in self.members:
            key, field = split_member_name(name)
            if current_key is not None and key != current_key:
                yield current_key, fields
                fields = {}
            current_key = key
            fields[field] = self.view(off, size)
        if current_key is not None and fields:
            yield current_key, fields


def iter_samples(
    path: str, decode: Optional[Callable[[str, bytes], Any]] = None
) -> Iterator[tuple[str, dict[str, Any]]]:
    """Group consecutive members by sample key: yields (key, {field: value})."""
    current_key: Optional[str] = None
    fields: dict[str, Any] = {}
    for name, data in iter_members(path):
        key, field = split_member_name(name)
        if current_key is not None and key != current_key:
            yield current_key, fields
            fields = {}
        current_key = key
        fields[field] = decode(field, data) if decode is not None else data
    if current_key is not None and fields:
        yield current_key, fields


def check_existing_shard(path: str, keys: list[str]) -> tuple[int, dict[str, int]]:
    """Shard-integrity probe used for resumable extraction
    (reference: preprocessing/feature_extraction_core/webdataset_utils.py:12-35).

    Returns (ok, per-key member counts); ok=0 if the tar is missing/corrupt.
    """
    count_per_key = {k: 0 for k in keys}
    if not os.path.exists(path):
        return 0, count_per_key
    try:
        with tarfile.open(path, "r") as tar:
            for member in tar.getmembers():
                for k in keys:
                    if k in member.name:
                        count_per_key[k] += 1
        return 1, count_per_key
    except tarfile.TarError:
        return 0, count_per_key


def read_splits(dataset_dir: str) -> dict[str, int]:
    with open(os.path.join(dataset_dir, "splits.json")) as f:
        return json.load(f)


def write_splits(dataset_dir: str, splits: dict[str, int]) -> None:
    os.makedirs(dataset_dir, exist_ok=True)
    with open(os.path.join(dataset_dir, "splits.json"), "w") as f:
        json.dump(splits, f)
