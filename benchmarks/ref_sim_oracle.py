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


def replay_counters(ref, ours, *, batches, nrank, mbs, T, keys_space,
                    cap, zipf_a, seed):
    """The reference's counter replay discipline
    (`topk_scheduler.cc:306-344`), applied to BOTH simulators on one
    identical multi-worker stream: per batch, worker z's comm plan =
    keys other workers read that z currently caches (computed with the
    ORACLE's check() for both sides so the plan never depends on the
    system under test) -> outdate them, book update_push; then per
    unique key a get() books miss_pull (>= 0) / miss_push (> 0, evicted
    fresh) / update_pull (-2, resident-but-outdated).

    Shared by tests/test_golden_sim_parity.py and
    benchmarks/golden_counters.py so the discipline cannot drift
    between the test and the committed artifact.

    Returns (cnt_ref, cnt_ours, mismatches, rhs, ohs): [nrank, 4]
    counter matrices (miss_pull, miss_push, update_pull, update_push),
    the list of per-op return-code mismatches (batch, worker, key,
    rc_ref, rc_ours), and the LIVE handles — callers inspect valid-key
    sets if they want, then destroy.
    """
    import numpy as np
    rng = np.random.default_rng(seed)
    rhs = [ref.ref_create(keys_space, cap) for _ in range(nrank)]
    ohs = [ours.hsim_create(cap, keys_space) for _ in range(nrank)]
    cnt_ref = np.zeros((nrank, 4), np.int64)
    cnt_ours = np.zeros((nrank, 4), np.int64)
    mismatches = []
    for b in range(batches):
        batch = rng.zipf(zipf_a, size=(nrank, mbs, T)) % keys_space
        uniq = [np.unique(batch[z]) for z in range(nrank)]
        for z in range(nrank):
            others = np.unique(np.concatenate(
                [uniq[w] for w in range(nrank) if w != z]))
            cplan = [int(k) for k in others
                     if ref.ref_check(rhs[z], int(k))]
            for k in cplan:
                ref.ref_outdate(rhs[z], k)
                ours.hsim_outdate(ohs[z], k)
            cnt_ref[z, 3] += len(cplan)
            cnt_ours[z, 3] += len(cplan)
            for k in uniq[z]:
                k = int(k)
                rc_r = ref.ref_get(rhs[z], k)
                rc_o = ours.hsim_get(ohs[z], k)
                if rc_r != rc_o:
                    mismatches.append((b, z, k, rc_r, rc_o))
                for cnt, rc in ((cnt_ref[z], rc_r), (cnt_ours[z], rc_o)):
                    if rc == -2:
                        cnt[2] += 1
                    elif rc >= 0:
                        cnt[0] += 1
                        if rc > 0:
                            cnt[1] += 1
    return cnt_ref, cnt_ours, mismatches, rhs, ohs
