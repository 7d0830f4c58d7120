"""Weight blob I/O: the "DNNw" interchange format + param checkpointing.

Binary-compatible with the reference's weight files (format: nnet.h:41-61
WeightHead; writer write_lpcnet_weights.c:47-67; parser
parse_lpcnet_weights.c:36-77), so models can move between this framework
and the reference C runtime. Uses the native mmap parser when available
(native/weights_io.cpp via ctypes), else pure numpy.

Also provides save_params/load_params for our own pytrees (names are
'/'-joined paths; shapes stored in a sidecar record), and sparse_to_dense
for the reference's 8x4 block-sparse export format (dump_lpcnet.py:85-121).
"""
import ctypes
import io
import json
import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

BLOCK = 64
TYPE_FLOAT, TYPE_INT, TYPE_QWEIGHT = 0, 1, 2
_DTYPES = {TYPE_FLOAT: np.float32, TYPE_INT: np.int32, TYPE_QWEIGHT: np.int8}
_TYPE_OF = {np.dtype(np.float32): TYPE_FLOAT, np.dtype(np.int32): TYPE_INT,
            np.dtype(np.int8): TYPE_QWEIGHT}


def write_blob(path: str, arrays: Dict[str, np.ndarray]) -> None:
    """Write named arrays as DNNw records (names truncated to 43 chars)."""
    from . import native
    lib = native.get_lib()
    items = [(name, np.ascontiguousarray(a)) for name, a in arrays.items()]
    if lib is not None:
        w = lib.lpcnet_blob_writer_open(path.encode())
        assert w, f"cannot open {path}"
        for name, a in items:
            t = _TYPE_OF[a.dtype]
            r = lib.lpcnet_blob_writer_add(
                w, name.encode()[:43], t,
                a.ctypes.data_as(ctypes.c_void_p), a.nbytes)
            assert r == 0, name
        assert lib.lpcnet_blob_writer_close(w) == 0
        return
    with open(path, "wb") as f:
        for name, a in items:
            size = a.nbytes
            bsize = (size + BLOCK - 1) // BLOCK * BLOCK
            nm = name.encode()[:43]
            f.write(struct.pack("<4siiii44s", b"DNNw", 0, _TYPE_OF[a.dtype],
                                size, bsize, nm))
            f.write(a.tobytes())
            f.write(b"\x00" * (bsize - size))


def read_blob(path: str) -> Dict[str, np.ndarray]:
    """Read all DNNw records -> {name: flat array} (validated)."""
    from . import native
    lib = native.get_lib()
    if lib is not None:
        h = lib.lpcnet_blob_open(path.encode())
        if not h:
            raise ValueError(f"invalid weight blob: {path}")
        out = {}
        try:
            for i in range(lib.lpcnet_blob_count(h)):
                name = lib.lpcnet_blob_name(h, i).decode()
                t = lib.lpcnet_blob_type(h, i)
                size = lib.lpcnet_blob_size(h, i)
                ptr = lib.lpcnet_blob_data(h, i)
                dt = _DTYPES[t]
                n = size // np.dtype(dt).itemsize
                buf = ctypes.string_at(ptr, size)
                out[name] = np.frombuffer(buf, dtype=dt, count=n).copy()
        finally:
            lib.lpcnet_blob_close(h)
        return out
    out = {}
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off + BLOCK <= len(data):
        head, ver, t, size, bsize, nm = struct.unpack_from(
            "<4siiii44s", data, off)
        if head != b"DNNw" or ver != 0 or size < 0 or bsize < size \
                or bsize > len(data) - off - BLOCK:
            raise ValueError(f"corrupt record at offset {off}")
        name = nm.split(b"\x00")[0].decode()
        dt = _DTYPES[t]
        out[name] = np.frombuffer(
            data, dtype=dt, count=size // np.dtype(dt).itemsize,
            offset=off + BLOCK).copy()
        off += BLOCK + bsize
    return out


# ------------------------------------------------------- pytree checkpoints

def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = np.asarray(v)
    return out


def save_params(path: str, params: Dict[str, Any]) -> None:
    """Checkpoint a params pytree as a DNNw blob + JSON shape manifest."""
    flat = _flatten(params)
    arrays = {}
    manifest = {}
    for i, (name, a) in enumerate(sorted(flat.items())):
        rec = f"a{i:04d}"   # record names are limited to 43 bytes
        arrays[rec] = a.astype(np.float32) if a.dtype == np.float64 else a
        manifest[rec] = {"name": name, "shape": list(a.shape),
                         "dtype": str(arrays[rec].dtype)}
    mjson = json.dumps(manifest).encode()
    arrays["__manifest__"] = np.frombuffer(mjson, dtype=np.int8).copy()
    write_blob(path, arrays)


def load_params(path: str) -> Dict[str, Any]:
    """Load a checkpoint written by save_params back into a nested dict."""
    raw = read_blob(path)
    mjson = raw.pop("__manifest__").tobytes().decode()
    manifest = json.loads(mjson)
    out: Dict[str, Any] = {}
    for rec, meta in manifest.items():
        a = raw[rec].astype(meta["dtype"]).reshape(meta["shape"])
        node = out
        parts = meta["name"].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = a
    return out


# -------------------------------------------- reference sparse block format

def sparse_to_dense(idx: np.ndarray, weights: np.ndarray, rows: int,
                    cols: int, block_rows: int = 8,
                    block_cols: int = 4) -> np.ndarray:
    """Expand the reference's block-sparse layout to a dense (rows, cols)
    matrix (layout: sparse_sgemv_accum8x4, vec.h:306-339; exporter
    dump_lpcnet.py:85-121). idx: per 8-row band [nblocks, col0, col1, ...];
    weights: concatenated 8x4 blocks in band order, row-major within a
    block (the kernel reads w[r*4 + c])."""
    dense = np.zeros((rows, cols), dtype=np.float32)
    wpos = 0
    p = 0
    for r0 in range(0, rows, block_rows):
        nb = int(idx[p]); p += 1
        for _ in range(nb):
            c0 = int(idx[p]); p += 1
            blk = weights[wpos:wpos + block_rows * block_cols]
            wpos += block_rows * block_cols
            blk = np.asarray(blk, np.float32).reshape(block_rows, block_cols)
            dense[r0:r0 + block_rows, c0:c0 + block_cols] = blk
    return dense
