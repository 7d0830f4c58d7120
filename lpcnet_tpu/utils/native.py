"""ctypes bindings for the native runtime (native/liblpcnet_native.so).

The library is built from native/*.cpp (make -C native). If it is missing
we try to build it once; callers fall back to pure-Python paths when
unavailable (see weights_io.py / data.py).
"""
import ctypes
import os
import subprocess
from typing import Optional

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liblpcnet_native.so"))

_lib = None
_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    # weights blob API
    lib.lpcnet_blob_open.restype = ctypes.c_void_p
    lib.lpcnet_blob_open.argtypes = [ctypes.c_char_p]
    lib.lpcnet_blob_count.restype = ctypes.c_int
    lib.lpcnet_blob_count.argtypes = [ctypes.c_void_p]
    lib.lpcnet_blob_name.restype = ctypes.c_char_p
    lib.lpcnet_blob_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lpcnet_blob_type.restype = ctypes.c_int
    lib.lpcnet_blob_type.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lpcnet_blob_size.restype = ctypes.c_int
    lib.lpcnet_blob_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lpcnet_blob_data.restype = ctypes.c_void_p
    lib.lpcnet_blob_data.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.lpcnet_blob_close.argtypes = [ctypes.c_void_p]
    lib.lpcnet_blob_writer_open.restype = ctypes.c_void_p
    lib.lpcnet_blob_writer_open.argtypes = [ctypes.c_char_p]
    lib.lpcnet_blob_writer_add.restype = ctypes.c_int
    lib.lpcnet_blob_writer_add.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_int]
    lib.lpcnet_blob_writer_close.restype = ctypes.c_int
    lib.lpcnet_blob_writer_close.argtypes = [ctypes.c_void_p]
    # data prep API
    lib.dp_augment_create.restype = ctypes.c_void_p
    lib.dp_augment_create.argtypes = [ctypes.c_uint64]
    lib.dp_augment_destroy.argtypes = [ctypes.c_void_p]
    lib.dp_augment_frames.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.dp_build_pairs.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return _lib
