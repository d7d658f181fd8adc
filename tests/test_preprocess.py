"""Raw-dataset preprocessing tests: tiny synthetic files in the reference
raw layouts -> processed .npy -> load_dataset round trip.

Reference semantics under test: examples/ctr/models/load_data.py
(process_dense_feats / process_sparse_feats / 90-10 split / .npy layout).
"""

import os

import numpy as np
import pytest

from herald_tpu.data import DATASETS, load_dataset
from herald_tpu.data.preprocess import (preprocess_avazu, preprocess_criteo,
                                        preprocess_criteo_search)


def _write(path, rows, delim):
    with open(path, "w") as f:
        for r in rows:
            f.write(delim.join(str(x) for x in r) + "\n")


def test_criteo_preprocess_semantics(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    rows = []
    for i in range(n):
        label = int(rng.integers(0, 2))
        dense = [("" if rng.random() < 0.2 else round(float(rng.integers(-2, 100)), 1))
                 for _ in range(13)]
        sparse = [("" if rng.random() < 0.2 else f"v{rng.integers(0, 5)}")
                  for _ in range(26)]
        rows.append([label] + dense + sparse)
    raw = tmp_path / "train.txt"
    _write(raw, rows, "\t")
    out = tmp_path / "processed"
    dense, sparse, labels = preprocess_criteo(str(raw), str(out), seed=0)

    # 90/10 split + all six files exist
    assert len(labels) == n - n // 10
    for name in ("train_dense_feats.npy", "train_sparse_feats.npy",
                 "train_labels.npy", "test_dense_feats.npy",
                 "test_sparse_feats.npy", "test_labels.npy"):
        assert (out / name).exists()

    # dense transform: log(x+1) for x > -1, else -1; missing -> 0 -> log(1)=0
    assert dense.shape[1] == 13
    assert np.isfinite(dense).all()
    raw_dense = np.array([[0.0 if r[1 + j] == "" else float(r[1 + j])
                           for j in range(13)] for r in rows])
    lo = np.where(raw_dense > -1, np.log(np.maximum(raw_dense, -0.999) + 1),
                  -1.0)
    # spot-check via the global min/max (order differs by the split perm)
    assert dense.min() >= lo.min() - 1e-5 and dense.max() <= lo.max() + 1e-5

    # sparse: per-column disjoint contiguous ID ranges, cumulative offsets
    assert sparse.shape[1] == 26
    te_sparse = np.load(out / "test_sparse_feats.npy")
    all_sparse = np.concatenate([sparse, te_sparse])
    offset = 0
    for f in range(26):
        col = all_sparse[:, f]
        uniq = np.unique(col)
        assert uniq.min() == offset, (f, uniq.min(), offset)
        assert np.array_equal(uniq, np.arange(offset, offset + len(uniq)))
        offset += len(uniq)

    # load_dataset consumes the processed layout
    d2, s2, y2 = load_dataset(DATASETS["criteo"], str(out))
    assert d2.shape == dense.shape and s2.shape == sparse.shape
    np.testing.assert_array_equal(s2, sparse)


def test_avazu_and_criteosearch_layouts(tmp_path):
    rng = np.random.default_rng(1)
    n = 40
    # avazu: header + id,click,I1,C1,I2,C2..C10,I3,I4,C11..C18
    header = (["id", "click", "I1", "C1", "I2"]
              + [f"C{i}" for i in range(2, 11)] + ["I3", "I4"]
              + [f"C{i}" for i in range(11, 19)])
    rows = [header]
    for i in range(n):
        r = [i, int(rng.integers(0, 2)), rng.integers(0, 9), f"a{rng.integers(0,4)}",
             rng.integers(0, 9)]
        r += [f"b{rng.integers(0, 4)}" for _ in range(9)]
        r += [rng.integers(0, 9), rng.integers(0, 9)]
        r += [f"c{rng.integers(0, 4)}" for _ in range(8)]
        rows.append(r)
    raw = tmp_path / "train.csv"
    _write(raw, rows, ",")
    dense, sparse, labels = preprocess_avazu(str(raw), str(tmp_path / "av"),
                                             seed=0)
    assert dense.shape[1] == DATASETS["avazu"].num_dense == 4
    assert sparse.shape[1] == DATASETS["avazu"].num_sparse == 18
    assert set(np.unique(labels)) <= {0.0, 1.0}

    # criteosearch: sale, salesamount, timedelay, I1..I3, C4..C20
    rows = []
    for i in range(n):
        r = [int(rng.integers(0, 2)), round(float(rng.random()), 3),
             rng.integers(0, 99)]
        r += [rng.integers(-2, 99) for _ in range(3)]
        r += [f"h{rng.integers(0, 6)}" for _ in range(17)]
        rows.append(r)
    raw2 = tmp_path / "CriteoSearchData"
    _write(raw2, rows, "\t")
    dense, sparse, labels = preprocess_criteo_search(
        str(raw2), str(tmp_path / "cs"), seed=0)
    assert dense.shape[1] == DATASETS["criteosearch"].num_dense == 3
    assert sparse.shape[1] == DATASETS["criteosearch"].num_sparse == 17
    # search variant maps x <= -1 to 0.0 (never -1)
    assert (dense >= 0).all() or dense.min() > -1


def test_movie_npz_layout(tmp_path):
    """MovieLens ingestion: the reference train.npz layout
    (load_data.py:321-341, user_input/item_input/labels)."""
    rng = np.random.default_rng(3)
    n = 64
    users = rng.integers(0, 100, n)
    items = 100 + rng.integers(0, 50, n)   # items offset past users
    labels = rng.integers(0, 2, n).astype(np.float32)
    np.savez(tmp_path / "train.npz", user_input=users, item_input=items,
             labels=labels)
    d, s, y = load_dataset(DATASETS["movie"], str(tmp_path))
    assert s.shape == (n, 2)
    np.testing.assert_array_equal(s[:, 0], users)
    np.testing.assert_array_equal(s[:, 1], items)
    np.testing.assert_array_equal(y.reshape(-1), labels)


def test_fast_preprocessor_bit_identical(tmp_path):
    """The native parser (csrc/herald_preproc.cc, used automatically for
    production-size files) produces BIT-IDENTICAL .npy outputs to the
    pure-Python path: same sorted-unique label encoding, same dense
    transform bits (both sides strtod-parse), same seeded split."""
    from herald_tpu.data.preprocess import (fast_preprocess_table,
                                            preprocess_table, _read_delim)
    rng = np.random.default_rng(11)
    rows = []
    for _ in range(400):
        r = [str(int(rng.integers(0, 2)))]
        # ints, floats, negatives, and missing dense cells
        r += ["" if rng.random() < 0.2
              else str(round(float(rng.normal()) * 10, 3))
              for _ in range(13)]
        r += ["" if rng.random() < 0.15
              else f"{int(rng.integers(0, 40)):08x}" for _ in range(26)]
        rows.append(r)
    raw = tmp_path / "train.txt"
    raw.write_text("\n".join("\t".join(r) for r in rows) + "\n")

    slow_dir, fast_dir = tmp_path / "slow", tmp_path / "fast"
    preprocess_table(_read_delim(str(raw), "\t", False), label_col=0,
                     dense_cols=list(range(1, 14)),
                     sparse_cols=list(range(14, 40)),
                     out_dir=str(slow_dir), seed=9)
    fast_preprocess_table(str(raw), "\t", False, 0, list(range(1, 14)),
                          list(range(14, 40)), str(fast_dir), seed=9)
    for name in ("train_dense_feats.npy", "train_sparse_feats.npy",
                 "train_labels.npy", "test_dense_feats.npy",
                 "test_sparse_feats.npy", "test_labels.npy"):
        a = np.load(slow_dir / name)
        b = np.load(fast_dir / name)
        assert a.dtype == b.dtype and a.shape == b.shape, name
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_preprocess_adult_semantics(tmp_path):
    """Census-income pipeline (reference load_adult_data semantics):
    label rule, age-group bins, per-field disjoint sparse ids, train-fit
    standardization, one-hot wide block (9 wide + 2 crossed -> each row
    sums to 11), reference-style file split."""
    import numpy as np
    from herald_tpu.data.preprocess import preprocess_adult

    rng = np.random.default_rng(3)
    n = 120
    wc = rng.choice(["Private", "Self-emp", "Gov"], n)
    edu = rng.choice(["HS", "College", "PhD"], n)
    mar = rng.choice(["Married", "Single"], n)
    occ = rng.choice(["Tech", "Sales", "Farm"], n)
    rel = rng.choice(["Husband", "Wife"], n)
    race = rng.choice(["White", "Black"], n)
    gen = rng.choice(["Male", "Female"], n)
    nc = rng.choice(["US", "MX"], n)
    age = rng.integers(18, 80, n)
    inc = rng.choice(["<=50K", ">50K", ">50K."], n)

    def write(path, rows):
        with open(path, "w") as f:
            for i in rows:
                f.write(f"{age[i]}, {wc[i]}, {rng.integers(1e4)}, {edu[i]},"
                        f" 9, {mar[i]}, {occ[i]}, {rel[i]}, {race[i]},"
                        f" {gen[i]}, {rng.integers(5000)}, 0,"
                        f" {rng.integers(20, 60)}, {nc[i]}, {inc[i]}\n")

    train_csv, test_csv = tmp_path / "tr.csv", tmp_path / "te.csv"
    write(train_csv, range(100))
    write(test_csv, range(100, n))
    out = tmp_path / "out"
    dense, sparse, labels = preprocess_adult(str(train_csv), str(out),
                                             test_csv=str(test_csv))
    assert len(labels) == 100                     # file split kept
    np.testing.assert_array_equal(
        labels, np.array([">50K" in v for v in inc[:100]], np.float32))
    assert sparse.shape == (100, 8)
    # per-field disjoint cumulative ranges, in field order
    lo = -1
    for j in range(8):
        col = sparse[:, j]
        assert col.min() > lo
        lo = col.max()
    # dense = 4 standardized continuous + one-hot block
    assert dense.shape[1] > 4
    np.testing.assert_allclose(dense[:, :4].mean(axis=0), 0, atol=1e-5)
    wide = dense[:, 4:]
    np.testing.assert_array_equal(wide.sum(axis=1),
                                  np.full(100, 11, np.float32))
    assert set(np.unique(wide)) == {0.0, 1.0}
    te_d = np.load(out / "test_dense_feats.npy")
    assert te_d.shape == (20, dense.shape[1])


def test_preprocess_movielens_npz(tmp_path):
    """NCF stream conversion: items offset by num_users into the shared
    table (ml-25m layout), standard six-file output."""
    import numpy as np
    from herald_tpu.data.preprocess import preprocess_movielens

    rng = np.random.default_rng(5)
    n = 200
    users = rng.integers(0, 50, n)
    items = rng.integers(0, 30, n)
    labels = rng.integers(0, 2, n).astype(np.float32)
    npz = tmp_path / "train.npz"
    np.savez(npz, user_input=users, item_input=items, labels=labels)
    out = tmp_path / "out"
    dense, sparse, lab = preprocess_movielens(str(npz), str(out),
                                              num_users=50, seed=0)
    assert dense.shape == (180, 0) and sparse.shape == (180, 2)
    assert sparse[:, 0].max() < 50 and sparse[:, 1].min() >= 50
    assert sparse[:, 1].max() < 80
    tr_s = np.load(out / "train_sparse_feats.npy")
    te_s = np.load(out / "test_sparse_feats.npy")
    assert len(tr_s) + len(te_s) == n
