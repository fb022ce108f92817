"""Folded Pallas DP kernel: bit parity with the unfolded kernel (which is
itself parity-locked to ops/dp.py by test_dp_pallas) in interpreter mode.

The fold time-shares each kernel row between two candidates' half-diamonds
(dp_pallas._dp_kernel_fold); these tests assert identical scores and
identical backtracked op streams (hole-stripped) plus fin_i/fin_j across
random shapes, bands, N bases and degenerate rows.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gdiet_tpu.ops.dp_pallas import extd2_batch_pallas  # noqa: E402
from gdiet_tpu.pipeline.device_step import _backtrack_antidiag  # noqa: E402

PARAMS = (2, 8, 12, 2, 24, 1)


def _run(Q, T, lens, band, Lmax, fold, tlens=None, Lt=None, unroll=4):
    score, dirs, offs, offe = extd2_batch_pallas(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(lens), jnp.asarray(band),
        PARAMS, Lmax, tlens=None if tlens is None else jnp.asarray(tlens),
        Lt=Lt, interpret=True, fold=fold, unroll=unroll,
    )
    ops, fin_i, fin_j = _backtrack_antidiag(
        dirs, jnp.asarray(lens), jnp.asarray(band), Lmax,
        tlens=None if tlens is None else jnp.asarray(tlens), Lt=Lt,
        fold=fold, unroll=unroll,
    )
    return (np.asarray(score), np.asarray(ops), np.asarray(fin_i),
            np.asarray(fin_j))


def _strip(ops_row):
    return [int(o) for o in ops_row if o != 255]


def _check_parity(Q, T, lens, band, Lmax, tlens=None, Lt=None):
    s0, o0, fi0, fj0 = _run(Q, T, lens, band, Lmax, False, tlens, Lt)
    s1, o1, fi1, fj1 = _run(Q, T, lens, band, Lmax, True, tlens, Lt)
    np.testing.assert_array_equal(s0, s1)
    np.testing.assert_array_equal(fi0, fi1)
    np.testing.assert_array_equal(fj0, fj1)
    for n in range(len(lens)):
        assert _strip(o0[n]) == _strip(o1[n]), f"ops differ at row {n}"


def test_fold_parity_random():
    rng = np.random.default_rng(7)
    N, Lmax = 37, 40
    Q = rng.integers(0, 4, (N, Lmax), dtype=np.uint8)
    T = rng.integers(0, 4, (N, Lmax), dtype=np.uint8)
    # mix of equal sequences, mutated copies, and unrelated pairs
    for n in range(0, N, 3):
        T[n] = Q[n]
    for n in range(1, N, 3):
        T[n] = Q[n].copy()
        for _ in range(3):
            p = rng.integers(0, Lmax)
            T[n][p] = (T[n][p] + 1) % 4
    lens = rng.integers(1, Lmax + 1, N).astype(np.int32)
    lens[5] = 0  # dead row
    band = rng.integers(5, 60, N).astype(np.int32)
    _check_parity(Q, T, lens, band, Lmax)


def test_fold_parity_n_bases_and_bands():
    rng = np.random.default_rng(11)
    N, Lmax = 16, 33
    Q = rng.integers(0, 5, (N, Lmax), dtype=np.uint8)  # incl. N codes
    T = rng.integers(0, 5, (N, Lmax), dtype=np.uint8)
    lens = rng.integers(1, Lmax + 1, N).astype(np.int32)
    band = rng.integers(1, 12, N).astype(np.int32)  # narrow bands
    _check_parity(Q, T, lens, band, Lmax)


def test_fold_parity_unequal_tlens():
    rng = np.random.default_rng(13)
    N, Lmax, Lt = 12, 24, 48
    Q = rng.integers(0, 4, (N, Lmax), dtype=np.uint8)
    T = rng.integers(0, 4, (N, Lt), dtype=np.uint8)
    lens = rng.integers(1, Lmax + 1, N).astype(np.int32)
    tlens = rng.integers(1, Lt + 1, N).astype(np.int32)
    band = rng.integers(4, 64, N).astype(np.int32)
    _check_parity(Q, T, lens, band, Lmax, tlens=tlens, Lt=Lt)


def test_fold_matches_xla_scores():
    """Fold scores also match the XLA reference kernel directly."""
    from gdiet_tpu.ops import dp as dpk

    rng = np.random.default_rng(17)
    N, Lmax = 20, 30
    Q = rng.integers(0, 4, (N, Lmax), dtype=np.uint8)
    T = rng.integers(0, 4, (N, Lmax), dtype=np.uint8)
    for n in range(0, N, 2):
        T[n] = Q[n]
    lens = rng.integers(1, Lmax + 1, N).astype(np.int32)
    band = rng.integers(5, 40, N).astype(np.int32)
    s1, _, _, _ = _run(Q, T, lens, band, Lmax, True)
    s_ref, _, _, _ = dpk.extd2_batch(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(lens), jnp.asarray(band),
        jnp.asarray(np.array(PARAMS, np.int32)), Lmax,
    )
    np.testing.assert_array_equal(s1, np.asarray(s_ref))
