"""Minimal safetensors reader/writer (no torch, no safetensors package).

The reference has no checkpoint story at all (SURVEY.md §5: stateless
kernel library); real serving needs to load an on-disk HF checkpoint
without materializing a second full copy through torch. The safetensors
format is simple enough to parse directly:

    [8 bytes LE header length][JSON header][raw tensor bytes]

where the JSON header maps tensor name -> {dtype, shape, data_offsets}
(offsets relative to the end of the header). `LazyStateDict` exposes one
or many shard files as a Mapping that reads each tensor lazily on access
— models/convert.py:from_hf consumes tensors one at a time, so peak host
memory is one tensor, not the model (VERDICT r2 missing #4).
"""

from __future__ import annotations

import json
import os
from collections.abc import Mapping
from typing import Union

import ml_dtypes
import numpy as np

__all__ = ["LazyStateDict", "read_safetensors", "write_safetensors",
           "shard_files"]

_ST_TO_NP = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "F8_E4M3": ml_dtypes.float8_e4m3fn,
    "F8_E5M2": ml_dtypes.float8_e5m2,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}
_NP_TO_ST = {np.dtype(v): k for k, v in _ST_TO_NP.items()}


def _read_header(path: str):
    """-> (header dict, data_start byte offset)."""
    with open(path, "rb") as f:
        hlen = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(hlen))
    header.pop("__metadata__", None)
    return header, 8 + hlen


class LazyStateDict(Mapping):
    """Mapping over one or more safetensors shards; tensors are read from
    disk on access (one seek+read each), never all at once."""

    def __init__(self, files):
        self._index = {}  # name -> (path, np dtype, shape, start, nbytes)
        for path in files:
            header, data_start = _read_header(path)
            for name, info in header.items():
                st_dtype = info["dtype"]
                if st_dtype not in _ST_TO_NP:
                    raise NotImplementedError(
                        f"safetensors dtype {st_dtype!r} ({name})")
                lo, hi = info["data_offsets"]
                self._index[name] = (
                    path, np.dtype(_ST_TO_NP[st_dtype]),
                    tuple(info["shape"]), data_start + lo, hi - lo,
                )

    def __getitem__(self, name: str) -> np.ndarray:
        path, dtype, shape, start, nbytes = self._index[name]
        with open(path, "rb") as f:
            f.seek(start)
            buf = f.read(nbytes)
        return np.frombuffer(buf, dtype=dtype).reshape(shape)

    def __iter__(self):
        return iter(self._index)

    def __len__(self):
        return len(self._index)


def shard_files(path: str) -> list[str]:
    """Resolve a checkpoint path to its safetensors shard file list.

    Accepts: a single .safetensors file, a directory containing either
    `model.safetensors`, a `*.safetensors.index.json` shard index (the HF
    multi-shard layout), or any set of .safetensors files."""
    if os.path.isfile(path):
        return [path]
    index = [f for f in os.listdir(path)
             if f.endswith(".safetensors.index.json")]
    if index:
        with open(os.path.join(path, index[0])) as f:
            weight_map = json.load(f)["weight_map"]
        return [os.path.join(path, f) for f in sorted(set(weight_map.values()))]
    shards = sorted(f for f in os.listdir(path)
                    if f.endswith(".safetensors"))
    if not shards:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return [os.path.join(path, f) for f in shards]


def read_safetensors(path: str) -> LazyStateDict:
    """Open a checkpoint (file or HF-layout directory) as a lazy Mapping."""
    return LazyStateDict(shard_files(path))


def write_safetensors(path: str, tensors: dict) -> None:
    """Write {name: array} to one safetensors file (test/export helper)."""
    header = {}
    blobs = []
    offset = 0
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        st = _NP_TO_ST.get(arr.dtype)
        if st is None:
            raise NotImplementedError(f"dtype {arr.dtype} ({name})")
        nbytes = arr.nbytes
        header[name] = {
            "dtype": st,
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + nbytes],
        }
        blobs.append(arr.tobytes())
        offset += nbytes
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(len(hjson).to_bytes(8, "little"))
        f.write(hjson)
        for b in blobs:
            f.write(b)
