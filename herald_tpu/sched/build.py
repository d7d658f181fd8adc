"""Build the native scheduler library on demand (g++, no external deps).

Replaces the reference's cmake/pybind11 build of `laia_cache`
(`laia/CMakeLists.txt`); this image has no pybind11, so the library exposes
a C ABI consumed via ctypes.
"""

from __future__ import annotations

import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "herald_sched.cc")
_LIB_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_LIB_DIR, "libherald_sched.so")
_lock = threading.Lock()


def lib_path(rebuild: bool = False) -> str:
    """Compile (if needed) and return the shared-library path."""
    with _lock:
        if rebuild or not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                   "-o", _LIB, _SRC, "-lpthread"]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _LIB
