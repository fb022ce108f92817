"""Native radix sort of the minimizer stream (index.c:225-266 analog).

build_index sorts all (key, packed-position) pairs once with a C LSD
radix pass; these tests pin it to np.lexsort order and pin the whole
CSR build against the pure-numpy fallback path.
"""

import numpy as np
import pytest

from gdiet_tpu import native
from gdiet_tpu.config import IndexOptions
from gdiet_tpu.index.build import build_index

needs_native = pytest.mark.skipif(
    native.lib is None, reason="no C compiler for the native library"
)


@needs_native
@pytest.mark.parametrize("n", [1, 2, 63, 4096, 100_000])
def test_radix_matches_lexsort(n):
    rng = np.random.default_rng(n)
    # narrow ranges force duplicate keys and duplicate (key, val) pairs
    keys = rng.integers(0, max(2, n // 8), n, dtype=np.uint64)
    vals = rng.integers(0, max(2, n // 4), n, dtype=np.uint64)
    k2, v2 = keys.copy(), vals.copy()
    assert native.radix_sort_kv(k2, v2)
    order = np.lexsort((vals, keys))
    np.testing.assert_array_equal(k2, keys[order])
    np.testing.assert_array_equal(v2, vals[order])


@needs_native
def test_radix_wide_bits():
    rng = np.random.default_rng(7)
    n = 50_000
    keys = rng.integers(0, 1 << 56, n, dtype=np.uint64)  # 56-bit hash keys
    vals = rng.integers(0, 1 << 41, n, dtype=np.uint64)  # rid<<32|pos<<1|strand
    k2, v2 = keys.copy(), vals.copy()
    assert native.radix_sort_kv(k2, v2)
    order = np.lexsort((vals, keys))
    np.testing.assert_array_equal(k2, keys[order])
    np.testing.assert_array_equal(v2, vals[order])


@needs_native
def test_radix_presorted_vals_skips_val_passes():
    """vals_presorted=True must reproduce full (key, val) order when the
    input vals are ascending: key-pass stability carries the val order
    (the index build's fast path — emission streams are position-sorted)."""
    rng = np.random.default_rng(11)
    n = 100_000
    keys = rng.integers(0, 512, n, dtype=np.uint64)  # heavy duplication
    vals = np.sort(rng.integers(0, 1 << 41, n, dtype=np.uint64))
    k2, v2 = keys.copy(), vals.copy()
    assert native.radix_sort_kv(k2, v2, vals_presorted=True)
    order = np.lexsort((vals, keys))
    np.testing.assert_array_equal(k2, keys[order])
    np.testing.assert_array_equal(v2, vals[order])


@needs_native
def test_build_index_native_matches_numpy(monkeypatch):
    rng = np.random.default_rng(3)
    seqs = [
        (f"c{i}", "".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04], size=3000)))
        for i in range(4)
    ]
    io = IndexOptions(k=15, w=10, pattern="10")
    mi_c = build_index(seqs, io)
    monkeypatch.setattr(native, "radix_sort_kv", lambda *a, **k: False)
    mi_np = build_index(seqs, io)
    np.testing.assert_array_equal(mi_c.keys, mi_np.keys)
    np.testing.assert_array_equal(mi_c.starts, mi_np.starts)
    np.testing.assert_array_equal(mi_c.positions, mi_np.positions)
