"""Native safetensors read/write — the SD ecosystem's standard weight format.

The reference consumes/produces torch pickle checkpoints only
(VAE/test/test.py:29-64, vqvae/test/test.py:3-21), but every modern SD
weight distribution ships `.safetensors`. The format is deliberately
trivial — an 8-byte little-endian u64 header length, a JSON header mapping
tensor names to {"dtype", "shape", "data_offsets"} (plus an optional
"__metadata__" string map), then the raw little-endian tensor bytes — so it
is implemented here natively on numpy with zero runtime dependency; the
test suite cross-validates both directions against the official
`safetensors` library when it is importable.

bf16 round-trips via ml_dtypes (a JAX dependency, always present).
"""

from __future__ import annotations

import json
import struct
from typing import Mapping

import numpy as np

import ml_dtypes

# spec dtype tag <-> numpy dtype (little-endian on disk; numpy native order
# is LE on every supported platform)
_DTYPES = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "U16": np.dtype(np.uint16),
    "U32": np.dtype(np.uint32),
    "U64": np.dtype(np.uint64),
    "BOOL": np.dtype(np.bool_),
}
_TAGS = {v: k for k, v in _DTYPES.items()}


def save_safetensors(
    path: str,
    tensors: Mapping[str, np.ndarray],
    metadata: Mapping[str, str] | None = None,
) -> None:
    """Write `tensors` (name -> array) to `path` in safetensors layout.

    Arrays are converted to C-contiguous numpy; jax arrays are accepted
    (np.asarray works on them). Keys are written in sorted order so the
    byte output is deterministic for a given tree.
    """
    arrays: dict[str, np.ndarray] = {}
    for name in sorted(tensors):
        a = np.asarray(tensors[name])
        # ascontiguousarray promotes 0-d to 1-d; 0-d is always contiguous
        a = np.ascontiguousarray(a) if a.ndim else a
        if a.dtype not in _TAGS:
            raise ValueError(f"{name}: unsupported dtype {a.dtype}")
        arrays[name] = a

    header: dict[str, object] = {}
    if metadata:
        header["__metadata__"] = {str(k): str(v) for k, v in metadata.items()}
    offset = 0
    for name, a in arrays.items():
        end = offset + a.nbytes
        header[name] = {
            "dtype": _TAGS[a.dtype],
            "shape": list(a.shape),
            "data_offsets": [offset, end],
        }
        offset = end

    hjson = json.dumps(header, separators=(",", ":")).encode("utf-8")
    # pad the header to 8-byte alignment with spaces (what the reference
    # implementation does), so tensor data starts aligned
    pad = (8 - len(hjson) % 8) % 8
    hjson += b" " * pad

    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for a in arrays.values():
            f.write(a.tobytes())


def load_safetensors(
    path: str, return_metadata: bool = False
) -> dict[str, np.ndarray] | tuple[dict[str, np.ndarray], dict[str, str]]:
    """Read a safetensors file into {name: numpy array}.

    The file is read once into memory and each tensor is a zero-copy view
    reshaped from the buffer (writable copies only where a consumer needs
    one — `np.frombuffer` views are read-only, which every loader in this
    package tolerates because values are converted to jax arrays anyway).
    """
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        if hlen > 100_000_000:
            raise ValueError(f"implausible safetensors header length {hlen}")
        header = json.loads(f.read(hlen).decode("utf-8"))
        data = f.read()

    metadata = header.pop("__metadata__", {}) or {}
    out: dict[str, np.ndarray] = {}
    for name, info in header.items():
        dt = _DTYPES.get(info["dtype"])
        if dt is None:
            raise ValueError(f"{name}: unsupported dtype tag {info['dtype']}")
        start, end = info["data_offsets"]
        shape = tuple(info["shape"])
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        if end - start != n * dt.itemsize:
            raise ValueError(
                f"{name}: data_offsets span {end - start} bytes, "
                f"expected {n * dt.itemsize} for shape {shape} {info['dtype']}")
        out[name] = np.frombuffer(data[start:end], dtype=dt).reshape(shape)
    if return_metadata:
        return out, {str(k): str(v) for k, v in metadata.items()}
    return out
