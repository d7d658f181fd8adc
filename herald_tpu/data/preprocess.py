"""Raw-dataset preprocessing: reference `load_data.py` semantics, no pandas.

Converts the raw Criteo / Avazu / CriteoSearch files into the processed
`.npy` layout consumed by `load_dataset` (the same six files the reference
writes: train/test x dense/sparse/labels — `examples/ctr/models/
load_data.py:151-175`):

- dense features: missing -> 0.0, then `log(x+1) if x > -1 else -1`
  (Criteo/Avazu, `load_data.py:179-184`) or `... else 0.0` (CriteoSearch,
  `load_data.py:186-191`);
- sparse features: missing -> "-1", per-column label encoding in sorted
  class order (sklearn LabelEncoder semantics, `load_data.py:193-206`),
  then cumulative per-column offsets so every column owns a disjoint
  global ID range;
- 90/10 random-permutation train/test split (`load_data.py:160-170`).

Downloading is the user's job (the reference's download URLs are dead,
`load_data.py:131-140`, and this environment has no egress); these
functions take the already-downloaded raw file.
"""

from __future__ import annotations

import csv
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["preprocess_criteo", "preprocess_avazu",
           "preprocess_criteo_search", "preprocess_table",
           "fast_preprocess_table"]


def _encode_sparse(columns: List[np.ndarray]) -> np.ndarray:
    """Per-column sorted-order label encoding + cumulative offsets."""
    out = []
    offset = 0
    for col in columns:
        uniq, codes = np.unique(col, return_inverse=True)
        out.append(codes.astype(np.int64) + offset)
        offset += len(uniq)
    return np.stack(out, axis=1)


def _dense_transform(columns: List[np.ndarray], *, search: bool
                     ) -> np.ndarray:
    out = []
    for col in columns:
        x = col.astype(np.float64)
        fallback = 0.0 if search else -1.0
        y = np.where(x > -1, np.log(np.maximum(x, -1) + 1 + 1e-300),
                     fallback)
        out.append(y.astype(np.float32))
    return np.stack(out, axis=1)


def preprocess_table(rows: Sequence[Sequence[str]], label_col: int,
                     dense_cols: Sequence[int], sparse_cols: Sequence[int],
                     out_dir: str, *, search_dense: bool = False,
                     seed: Optional[int] = None,
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared core: encode + transform + split + save the six .npy files.

    Returns the TRAIN (dense, sparse, labels) arrays."""
    ncols = max([label_col, *dense_cols, *sparse_cols]) + 1
    table = [[""] * ncols for _ in range(len(rows))]
    for i, r in enumerate(rows):
        for j in range(min(len(r), ncols)):
            table[i][j] = r[j]
    col = lambda j: np.array([t[j] for t in table])

    def numeric(j):
        c = col(j)
        c = np.where(c == "", "0.0", c)     # fillna(0.0)
        return c.astype(np.float64)

    labels = numeric(label_col).astype(np.float32)
    dense = _dense_transform([numeric(j) for j in dense_cols],
                             search=search_dense)
    sparse_raw = []
    for j in sparse_cols:
        c = col(j)
        sparse_raw.append(np.where(c == "", "-1", c))   # fillna("-1")
    sparse = _encode_sparse(sparse_raw)

    n = len(labels)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    test_num = max(n // 10, 1)
    tr, te = perm[:-test_num], perm[-test_num:]

    os.makedirs(out_dir, exist_ok=True)
    names = ["train_dense_feats.npy", "train_sparse_feats.npy",
             "train_labels.npy", "test_dense_feats.npy",
             "test_sparse_feats.npy", "test_labels.npy"]
    arrays = [dense[tr], sparse[tr], labels[tr],
              dense[te], sparse[te], labels[te]]
    for name, arr in zip(names, arrays):
        np.save(os.path.join(out_dir, name), arr)
    return dense[tr], sparse[tr], labels[tr]


def _read_delim(path: str, delim: str, skip_header: bool):
    with open(path, newline="") as f:
        reader = csv.reader(f, delimiter=delim)
        rows = list(reader)
    return rows[1:] if skip_header else rows


# files above this size route through the native parser (the Python path
# materializes every cell as a str — hours at Criteo's 11 GB / 45M rows)
_FAST_THRESHOLD_BYTES = 64 * 1024 * 1024


def fast_preprocess_table(raw_path: str, delim: str, skip_header: bool,
                          label_col: int, dense_cols: Sequence[int],
                          sparse_cols: Sequence[int], out_dir: str, *,
                          search_dense: bool = False,
                          seed: Optional[int] = None
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native-parser twin of the csv.reader + preprocess_table path,
    producing BIT-IDENTICAL outputs (tests/test_preprocess.py pins it):
    the C++ side (csrc/herald_preproc.cc) streams the file once and
    emits raw numeric columns + per-column categorical codes in
    np.unique's sorted order; the numpy side applies the dense log
    transform, cumulative ID offsets, and the seeded 90/10 split.

    The only intentional difference from the slow path: quoted CSV
    fields are not un-quoted (the reference datasets never quote)."""
    import ctypes
    import tempfile

    from herald_tpu.sched.build import preproc_lib_path
    lib = ctypes.CDLL(preproc_lib_path())
    lib.hprep_table.restype = ctypes.c_int64
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.hprep_table.argtypes = [
        ctypes.c_char_p, ctypes.c_char, ctypes.c_int, ctypes.c_int,
        i32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64)]

    dc = np.ascontiguousarray(dense_cols, np.int32)
    sc = np.ascontiguousarray(sparse_cols, np.int32)
    uniq = np.zeros(len(sparse_cols), np.int64)
    with tempfile.TemporaryDirectory(dir=out_dir
                                     if os.path.isdir(out_dir) else None
                                     ) as tmp:
        os.makedirs(out_dir, exist_ok=True)
        paths = [os.path.join(tmp, x)
                 for x in ("dense.f64", "sparse.i64", "labels.f32")]
        n = lib.hprep_table(
            raw_path.encode(), delim.encode(), int(skip_header),
            label_col, dc.ctypes.data_as(i32p), len(dense_cols),
            sc.ctypes.data_as(i32p), len(sparse_cols),
            paths[0].encode(), paths[1].encode(), paths[2].encode(),
            uniq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if n < 0:
            raise RuntimeError(f"native preprocess failed on {raw_path}")
        n = int(n)
        dense_raw = np.fromfile(paths[0], np.float64).reshape(
            n, len(dense_cols))
        sparse = np.fromfile(paths[1], np.int64).reshape(
            n, len(sparse_cols))
        labels = np.fromfile(paths[2], np.float32)

    # cumulative per-column offsets (same as _encode_sparse)
    offsets = np.concatenate([[0], np.cumsum(uniq[:-1])])
    sparse += offsets[None, :]
    # dense transform (same formula as _dense_transform, vectorized)
    fallback = 0.0 if search_dense else -1.0
    dense = np.where(dense_raw > -1,
                     np.log(np.maximum(dense_raw, -1) + 1 + 1e-300),
                     fallback).astype(np.float32)

    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    test_num = max(n // 10, 1)
    tr, te = perm[:-test_num], perm[-test_num:]
    os.makedirs(out_dir, exist_ok=True)
    names = ["train_dense_feats.npy", "train_sparse_feats.npy",
             "train_labels.npy", "test_dense_feats.npy",
             "test_sparse_feats.npy", "test_labels.npy"]
    arrays = [dense[tr], sparse[tr], labels[tr],
              dense[te], sparse[te], labels[te]]
    for name, arr in zip(names, arrays):
        np.save(os.path.join(out_dir, name), arr)
    return dense[tr], sparse[tr], labels[tr]


def _route(raw_path: str, delim: str, skip_header: bool, label_col: int,
           dense_cols, sparse_cols, out_dir: str, *,
           search_dense: bool = False, seed: Optional[int] = None):
    """Pick the native parser for production-size files (bit-identical
    outputs; see fast_preprocess_table), the pure-Python path for small
    ones (no compile dependency in tiny/test runs)."""
    if os.path.getsize(raw_path) >= _FAST_THRESHOLD_BYTES:
        return fast_preprocess_table(
            raw_path, delim, skip_header, label_col, dense_cols,
            sparse_cols, out_dir, search_dense=search_dense, seed=seed)
    rows = _read_delim(raw_path, delim, skip_header)
    return preprocess_table(rows, label_col=label_col,
                            dense_cols=list(dense_cols),
                            sparse_cols=list(sparse_cols),
                            out_dir=out_dir, search_dense=search_dense,
                            seed=seed)


def preprocess_criteo(raw_path: str, out_dir: str,
                      seed: Optional[int] = None):
    """Criteo Kaggle `train.txt`: TSV, no header; label + I1..I13 + C14..C39
    (reference `download_criteo`, `load_data.py:124-175`)."""
    return _route(raw_path, "\t", False, 0,
                  list(range(1, 14)), list(range(14, 40)),
                  out_dir, seed=seed)


def preprocess_avazu(raw_path: str, out_dir: str,
                     seed: Optional[int] = None):
    """Avazu `train.csv`: CSV with header; columns id,click,I1,C1,I2,
    C2..C10,I3,I4,C11..C18 (reference `download_avazu`,
    `load_data.py:7-60`). 4 dense + 18 sparse; label = click."""
    dense_cols = [2, 4, 14, 15]                      # I1, I2, I3, I4
    sparse_cols = [3] + list(range(5, 14)) + list(range(16, 24))
    return _route(raw_path, ",", True, 1, dense_cols, sparse_cols,
                  out_dir, seed=seed)


def preprocess_criteo_search(raw_path: str, out_dir: str,
                             seed: Optional[int] = None):
    """CriteoSearchData: TSV, no header; sale, salesamount, timedelay,
    I1..I3, C4..C20 (reference `download_criteo_search`,
    `load_data.py:65-117`). label = sale; dense transform uses the
    `process_dense_feats_search` variant (missing -> 0.0)."""
    return _route(raw_path, "\t", False, 0, [3, 4, 5],
                  list(range(6, 23)), out_dir, search_dense=True,
                  seed=seed)
