"""ctypes bridge to the native C++ ingest module (cpp/ingest.cpp).

Builds the shared library on first use (cached next to the source) and
falls back to the pure-Python reader when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB = None
_BUILD_FAILED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "cpp", "ingest.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libgphocs_ingest.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    if _LIB is not None:
        return _LIB
    if _BUILD_FAILED:
        return None
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
        except Exception:
            _BUILD_FAILED = True
            return None
    lib = ctypes.CDLL(_SO)
    lib.gphocs_ingest.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_int, ctypes.c_int]
    lib.gphocs_ingest.restype = ctypes.c_int
    lib.gphocs_ingest_error.restype = ctypes.c_char_p
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def read_seq_file_native(path: str, sample_names: List[str],
                         num_loci_limit: int = -1):
    """Native twin of io.sequences.read_seq_file.  Returns
    (patterns [list of str], profile lists per locus) or None if the
    native module is unavailable."""
    lib = _load()
    if lib is None:
        return None
    names_blob = b"\0".join(n.encode() for n in sample_names) + b"\0"
    rc = lib.gphocs_ingest(path.encode(), names_blob,
                           len(sample_names), num_loci_limit)
    if rc != 0:
        raise ValueError(
            f"native ingest failed: "
            f"{lib.gphocs_ingest_error().decode()}")
    num_loci = lib.gphocs_ingest_num_loci()
    num_patterns = lib.gphocs_ingest_num_patterns()
    prof_size = lib.gphocs_ingest_profile_size()
    S = len(sample_names)

    pat_buf = ctypes.create_string_buffer(num_patterns * S)
    lib.gphocs_ingest_patterns(pat_buf)
    patterns = [
        pat_buf.raw[i * S:(i + 1) * S].decode()
        for i in range(num_patterns)
    ]
    offsets = np.zeros(num_loci + 1, np.int32)
    ids = np.zeros(prof_size, np.int32)
    counts = np.zeros(prof_size, np.int32)
    lib.gphocs_ingest_profiles(
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    lib.gphocs_ingest_free()

    profiles = []
    for l in range(num_loci):
        lo, hi = offsets[l], offsets[l + 1]
        profiles.append(list(zip(ids[lo:hi].tolist(),
                                 counts[lo:hi].tolist())))
    return patterns, profiles
