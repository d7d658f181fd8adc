"""DevicePrefetcher tests."""

import numpy as np

from herald_tpu.data.prefetch import DevicePrefetcher


def test_prefetcher_covers_dataset_in_order():
    n, K, gb = 64, 4, 4
    x = np.arange(n, dtype=np.int32)
    pf = DevicePrefetcher([x], steps_per_chunk=K, global_batch=gb,
                          dtypes=[np.int32])
    chunks = list(pf(epochs=1))
    assert len(chunks) == n // (K * gb)
    got = np.concatenate([np.asarray(c[0]).reshape(-1) for c in chunks])
    np.testing.assert_array_equal(got, x)


def test_prefetcher_epochs_and_wrap():
    n, K, gb = 20, 2, 4     # 20 samples, chunk = 8 -> 2 chunks + drop
    x = np.arange(n, dtype=np.float32)
    pf = DevicePrefetcher([x], steps_per_chunk=K, global_batch=gb,
                          dtypes=[np.float32], drop_last=False)
    chunks = list(pf(epochs=2))
    assert len(chunks) == 2 * pf.num_chunks
    # wrapped tail chunk pads from the head
    tail = np.asarray(chunks[pf.num_chunks - 1][0]).reshape(-1)
    np.testing.assert_array_equal(tail[-4:], [0, 1, 2, 3])
