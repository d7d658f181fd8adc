"""Build the native scheduler library on demand (g++, no external deps).

Replaces the reference's cmake/pybind11 build of `laia_cache`
(`laia/CMakeLists.txt`); this image has no pybind11, so the library exposes
a C ABI consumed via ctypes.
"""

from __future__ import annotations

import os
import subprocess
import threading

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_DIR = os.path.dirname(os.path.abspath(__file__))
_lock = threading.Lock()


def _build(src_name: str, lib_name: str, rebuild: bool) -> str:
    src = os.path.join(_CSRC, src_name)
    lib = os.path.join(_LIB_DIR, lib_name)
    deps = [src, os.path.join(_CSRC, "herald_common.h")]
    with _lock:
        if rebuild or not os.path.exists(lib) or any(
                os.path.exists(d)
                and os.path.getmtime(d) > os.path.getmtime(lib)
                for d in deps):
            # -mcx16/-latomic: the planner's 128-bit residency words (64
            # workers) use 16-byte atomic RMW (cmpxchg16b)
            cmd = ["g++", "-O3", "-std=c++17", "-mcx16", "-shared",
                   "-fPIC", "-o", lib, src, "-lpthread", "-latomic"]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        return lib


def lib_path(rebuild: bool = False) -> str:
    """Compile (if needed) and return the scheduler shared library."""
    return _build("herald_sched.cc", "libherald_sched.so", rebuild)


def planner_lib_path(rebuild: bool = False) -> str:
    """Compile (if needed) and return the cache-planner shared library."""
    return _build("herald_cache_planner.cc", "libherald_planner.so", rebuild)


def preproc_lib_path(rebuild: bool = False) -> str:
    """Compile (if needed) and return the raw-data preprocessor library."""
    return _build("herald_preproc.cc", "libherald_preproc.so", rebuild)
