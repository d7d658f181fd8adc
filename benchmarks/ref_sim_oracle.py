"""Oracle loader for the reference's header-only MiniLRUCache.

Compiles a thin C shim that #includes the reference header IN PLACE
(`/root/reference/laia/include/mini_lru_cache.h` — never copied into
this repo) so exact-parity harnesses can replay identical op streams
through the reference simulator and ours (csrc/herald_sched.cc hsim_*).
Returns None when the reference tree or g++ is unavailable; callers
must skip gracefully (the repo stands alone without it).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess

REF_HEADER = "/root/reference/laia/include/mini_lru_cache.h"

_SHIM = r"""
#include "%s"
extern "C" {
void *ref_create(long emb_size, long cap) {
    auto *c = new laia_cache::MiniLRUCache((size_t)emb_size);
    c->set_cap((int)cap);
    return c;
}
int ref_get(void *h, long k) {
    return static_cast<laia_cache::MiniLRUCache *>(h)->get((int)k);
}
void ref_outdate(void *h, long k) {
    static_cast<laia_cache::MiniLRUCache *>(h)->outdate((int)k);
}
int ref_check(void *h, long k) {
    return static_cast<laia_cache::MiniLRUCache *>(h)->check((int)k) ? 1 : 0;
}
long ref_valid_keys(void *h, long *out) {
    auto keys = static_cast<laia_cache::MiniLRUCache *>(h)->get_keys();
    if (out)
        for (size_t i = 0; i < keys.size(); i++) out[i] = keys[i];
    return (long)keys.size();
}
void ref_destroy(void *h) {
    delete static_cast<laia_cache::MiniLRUCache *>(h);
}
}
""" % REF_HEADER


def load_ref_oracle():
    """Build (once) and load the reference-simulator shim, or None."""
    if not os.path.exists(REF_HEADER) or shutil.which("g++") is None:
        return None
    src = "/tmp/herald_ref_sim_shim.cc"
    lib = "/tmp/libherald_ref_sim.so"
    if (not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(REF_HEADER)):
        with open(src, "w") as f:
            f.write(_SHIM)
        subprocess.run(["g++", "-O2", "-std=c++17", "-shared", "-fPIC",
                        "-o", lib, src], check=True, capture_output=True)
    ref = ctypes.CDLL(lib)
    ref.ref_create.restype = ctypes.c_void_p
    ref.ref_create.argtypes = [ctypes.c_long, ctypes.c_long]
    ref.ref_get.restype = ctypes.c_int
    ref.ref_get.argtypes = [ctypes.c_void_p, ctypes.c_long]
    ref.ref_check.restype = ctypes.c_int
    ref.ref_check.argtypes = [ctypes.c_void_p, ctypes.c_long]
    ref.ref_outdate.argtypes = [ctypes.c_void_p, ctypes.c_long]
    ref.ref_valid_keys.restype = ctypes.c_long
    ref.ref_valid_keys.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_long)]
    ref.ref_destroy.argtypes = [ctypes.c_void_p]
    return ref


def load_our_sim():
    """ctypes handle to our standalone LruSim (csrc/herald_sched.cc)."""
    from herald_tpu.sched.build import lib_path
    ours = ctypes.CDLL(lib_path())
    ours.hsim_create.restype = ctypes.c_void_p
    ours.hsim_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
    ours.hsim_get.restype = ctypes.c_int
    ours.hsim_get.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    ours.hsim_outdate.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    ours.hsim_check.restype = ctypes.c_int
    ours.hsim_check.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    ours.hsim_valid_keys.restype = ctypes.c_int64
    ours.hsim_valid_keys.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int64)]
    ours.hsim_destroy.argtypes = [ctypes.c_void_p]
    return ours
