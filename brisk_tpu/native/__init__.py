"""Native (C++) host-side components, loaded via ctypes.

Build with brisk_tpu/native/build.sh (or let `load()` build lazily on
first use). Python fallbacks exist for every native component, so the
package works without a toolchain — just slower on the host path.
"""

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))


def _so_path() -> str:
    """Build target for the lazily-compiled native library. The package
    dir may be read-only (system site-packages), so prefer a user-writable
    cache dir (ADVICE r2: silent degradation on read-only installs);
    a pre-built .so shipped next to the sources still wins."""
    packaged = os.path.join(_DIR, "libbrisk_native.so")
    src = os.path.join(_DIR, "fasta_codec.cpp")
    if (os.path.exists(packaged)
            and os.path.getmtime(packaged) >= os.path.getmtime(src)):
        return packaged
    cache = os.environ.get(
        "BRISK_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "brisk_tpu_jax"))
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libbrisk_native.so")


_SO = _so_path()
_lib = None
_load_failed = False


def load() -> Optional[ctypes.CDLL]:
    """Returns the native library, building it on first use; None if the
    build fails (callers fall back to Python)."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    src = os.path.join(_DIR, "fasta_codec.cpp")
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", src, "-lz", "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.brisk_fasta_parse.restype = ctypes.c_void_p
        lib.brisk_fasta_parse.argtypes = [ctypes.c_char_p]
        lib.brisk_fasta_n_chunks.restype = ctypes.c_uint64
        lib.brisk_fasta_n_chunks.argtypes = [ctypes.c_void_p]
        lib.brisk_fasta_n_codes.restype = ctypes.c_uint64
        lib.brisk_fasta_n_codes.argtypes = [ctypes.c_void_p]
        lib.brisk_fasta_codes.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.brisk_fasta_codes.argtypes = [ctypes.c_void_p]
        lib.brisk_fasta_offsets.restype = ctypes.POINTER(ctypes.c_uint64)
        lib.brisk_fasta_offsets.argtypes = [ctypes.c_void_p]
        lib.brisk_fasta_free.restype = None
        lib.brisk_fasta_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _load_failed = True
    return _lib


def parse_fasta_codes(path: str):
    """Parse a FASTA file natively: returns a list of numpy uint8 code
    arrays (one per cleaned chunk), or None if the native lib is
    unavailable."""
    import numpy as np

    lib = load()
    if lib is None:
        return None
    h = lib.brisk_fasta_parse(path.encode())
    if not h:
        raise IOError(f"native FASTA parse failed: {path}")
    try:
        n_codes = lib.brisk_fasta_n_codes(h)
        n_chunks = lib.brisk_fasta_n_chunks(h)
        codes = np.ctypeslib.as_array(lib.brisk_fasta_codes(h),
                                      shape=(n_codes,)).copy()
        offsets = np.ctypeslib.as_array(lib.brisk_fasta_offsets(h),
                                        shape=(n_chunks + 1,)).copy()
    finally:
        lib.brisk_fasta_free(h)
    return [codes[offsets[i]:offsets[i + 1]] for i in range(n_chunks)]
