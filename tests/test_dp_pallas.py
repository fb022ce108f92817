"""Pallas DP kernel vs the XLA scan implementation (interpreter mode)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gdiet_tpu.ops.dp import backtrack_batch, extd2_batch
from gdiet_tpu.ops.dp_pallas import extd2_batch_pallas

LMAX = 64


pytestmark = pytest.mark.slow


def test_pallas_matches_xla():
    prm = (2, 8, 12, 2, 24, 1)
    seed = 99
    random.seed(seed)
    rng = np.random.default_rng(seed)
    N = 20
    Q = np.zeros((N, LMAX), np.uint8)
    T = np.zeros((N, LMAX), np.uint8)
    lens = np.zeros(N, np.int32)
    band = np.zeros(N, np.int32)
    for i in range(N):
        L = random.randrange(2, LMAX)
        q = rng.integers(0, 5 if i % 4 == 0 else 4, L).astype(np.uint8)
        tgt = q.copy()
        for _ in range(random.randrange(0, 6)):
            j = random.randrange(0, max(1, len(tgt) - 1))
            op = random.random()
            if op < 0.5:
                tgt[j] = random.randrange(4)
            elif op < 0.75:
                tgt = np.insert(tgt, j, random.randrange(4))[:L]
            else:
                tgt = np.delete(tgt, j)
        if len(tgt) < L:
            tgt = np.concatenate([tgt, rng.integers(0, 4, L - len(tgt)).astype(np.uint8)])
        Q[i, :L], T[i, :L] = q, tgt[:L]
        lens[i] = L
        band[i] = random.choice([3, 17, 64])
    lens[0] = 0  # dead candidate

    s_x, d_x, o_x, e_x = extd2_batch(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(lens), jnp.asarray(band),
        jnp.asarray(np.array(prm, np.int32)), LMAX,
    )
    s_p, d_p, o_p, e_p = extd2_batch_pallas(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(lens), jnp.asarray(band),
        prm, LMAX, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
    cig_x = backtrack_batch(np.asarray(d_x), np.asarray(o_x), np.asarray(e_x), lens)
    cig_p = backtrack_batch(np.asarray(d_p), np.asarray(o_p), np.asarray(e_p), lens)
    assert cig_x == cig_p


def test_pallas_general_lengths():
    """qlen != tlen windows (the long-read call shape, LR map.c:1798-1805)."""
    from gdiet_tpu.oracle import align as oal

    prm = (1, 4, 6, 2, 26, 1)  # map-hifi scoring
    rng = np.random.default_rng(7)
    random.seed(7)
    N, LQ, LT = 12, 96, 160
    Q = np.zeros((N, LQ), np.uint8)
    T = np.zeros((N, LT), np.uint8)
    qlens = np.zeros(N, np.int32)
    tlens = np.zeros(N, np.int32)
    band = np.zeros(N, np.int32)
    for i in range(N):
        lq = random.randrange(10, LQ)
        lt = random.randrange(10, LT)
        q = rng.integers(0, 4, lq).astype(np.uint8)
        t = rng.integers(0, 4, lt).astype(np.uint8)
        m = min(lq, lt)
        t[:m] = q[:m]  # shared prefix with a few mutations
        for _ in range(random.randrange(0, 5)):
            t[random.randrange(lt)] = random.randrange(4)
        Q[i, :lq], T[i, :lt] = q, t
        qlens[i], tlens[i] = lq, lt
        band[i] = random.choice([11, 40, 200])
    s_p, d_p, o_p, e_p = extd2_batch_pallas(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(qlens), jnp.asarray(band),
        prm, LQ, tlens=jnp.asarray(tlens), Lt=LT, interpret=True,
    )
    s_x, d_x, o_x, e_x = extd2_batch(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(qlens), jnp.asarray(band),
        jnp.asarray(np.array(prm, np.int32)), LQ,
        tlens=jnp.asarray(tlens), Lt=LT,
    )
    np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_p))
    cig_x = backtrack_batch(np.asarray(d_x), np.asarray(o_x), np.asarray(e_x),
                            qlens, tlens)
    cig_p = backtrack_batch(np.asarray(d_p), np.asarray(o_p), np.asarray(e_p),
                            qlens, tlens)
    assert cig_x == cig_p
    # vs the scalar oracle; when the band cannot reach the terminal corner
    # the score is NEG_INF and callers discard the candidate (LR map.c:1812)
    # — the CIGAR is unspecified there
    for i in range(N):
        ez = oal.extd2(Q[i, :qlens[i]], T[i, :tlens[i]], *prm, int(band[i]),
                       200, -1, oal.KSW_EZ_APPROX_MAX)
        assert ez.score == int(s_x[i]), f"case {i}"
        if ez.score != oal.NEG_INF:
            assert ez.cigar == cig_x[i], f"case {i}"


def test_pallas_banded_window():
    """Banded lane window (band_budget) matches the full-width kernel."""
    import jax.numpy as jnp
    from gdiet_tpu.ops.dp import cigars_from_ops
    from gdiet_tpu.pipeline.device_step import _backtrack_device

    prm = (1, 4, 6, 2, 26, 1)
    rng = np.random.default_rng(17)
    random.seed(17)
    N, LQ, LT = 8, 768, 1024
    Q = np.zeros((N, LQ), np.uint8)
    T = np.zeros((N, LT), np.uint8)
    qlens = np.zeros(N, np.int32)
    tlens = np.zeros(N, np.int32)
    for i in range(N):
        lq = random.randrange(200, LQ)
        lt = lq + random.randrange(0, 100)
        q = rng.integers(0, 4, lq).astype(np.uint8)
        t = np.concatenate([q, rng.integers(0, 4, lt - lq).astype(np.uint8)])
        for _ in range(random.randrange(0, 12)):
            t[random.randrange(lt)] = random.randrange(4)
        Q[i, :lq], T[i, :lt] = q, t
        qlens[i], tlens[i] = lq, lt
    band = np.full(N, 100, np.int32)
    s_w, d_w, o_w, e_w = extd2_batch_pallas(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(qlens), jnp.asarray(band),
        prm, LQ, tlens=jnp.asarray(tlens), Lt=LT, band_budget=100,
        interpret=True,
    )
    assert d_w.shape[2] < 1024, "window must be narrower than the lane range"
    # int16 lane state must be bit-identical through the banded window too
    s_h, d_h, o_h, e_h = extd2_batch_pallas(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(qlens), jnp.asarray(band),
        prm, LQ, tlens=jnp.asarray(tlens), Lt=LT, band_budget=100,
        interpret=True, state_dtype="int16",
    )
    np.testing.assert_array_equal(np.asarray(s_w), np.asarray(s_h))
    np.testing.assert_array_equal(np.asarray(d_w), np.asarray(d_h))
    s_x, d_x, o_x, e_x = extd2_batch(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(qlens), jnp.asarray(band),
        jnp.asarray(np.array(prm, np.int32)), LQ,
        tlens=jnp.asarray(tlens), Lt=LT,
    )
    np.testing.assert_array_equal(np.asarray(s_x), np.asarray(s_w))
    ops, fin_i, fin_j = _backtrack_device(
        d_w, jnp.asarray(qlens), jnp.asarray(band), LQ,
        tlens=jnp.asarray(tlens), Lt=LT, band_budget=100,
    )
    cig_w = cigars_from_ops(np.asarray(ops), np.asarray(fin_i),
                            np.asarray(fin_j), qlens)
    # antidiagonal-synchronous backtrack must agree (the LR bucket DP and
    # the SR fused step both use it)
    from gdiet_tpu.pipeline.device_step import _backtrack_antidiag

    ops_a, fin_ia, fin_ja = _backtrack_antidiag(
        d_w, jnp.asarray(qlens), jnp.asarray(band), LQ,
        tlens=jnp.asarray(tlens), Lt=LT, band_budget=100,
    )
    cig_a = cigars_from_ops(np.asarray(ops_a), np.asarray(fin_ia),
                            np.asarray(fin_ja), qlens)
    assert cig_a == cig_w
    np.testing.assert_array_equal(np.asarray(fin_ia), np.asarray(fin_i))
    np.testing.assert_array_equal(np.asarray(fin_ja), np.asarray(fin_j))
    cig_x = backtrack_batch(np.asarray(d_x), np.asarray(o_x), np.asarray(e_x),
                            qlens, tlens)
    for i in range(N):
        if int(s_x[i]) != -0x40000000:
            assert cig_w[i] == cig_x[i], f"case {i}"


def test_pallas_int16_state():
    """int16 lane state is exact: the difference formulation bounds every
    lane value by a few gap costs (the reference's 8-bit SIMD lanes exploit
    the same bound, ksw2_extd2_sse.c:34) — scores, dirs and window offsets
    must be bit-identical to the int32 kernel on the SR bench scoring."""
    prm = (2, 8, 12, 2, 24, 1)
    rng = np.random.default_rng(23)
    random.seed(23)
    N = 16
    Q = np.zeros((N, LMAX), np.uint8)
    T = np.zeros((N, LMAX), np.uint8)
    lens = np.zeros(N, np.int32)
    band = np.zeros(N, np.int32)
    for i in range(N):
        L = random.randrange(8, LMAX)
        q = rng.integers(0, 5 if i % 5 == 0 else 4, L).astype(np.uint8)
        t = q.copy()
        for _ in range(random.randrange(0, 5)):
            t[random.randrange(L)] = random.randrange(4)
        Q[i, :L], T[i, :L] = q, t
        lens[i] = L
        band[i] = random.choice([7, 21, LMAX])
    outs = {}
    for sd in ("int32", "int16"):
        outs[sd] = [np.asarray(x) for x in extd2_batch_pallas(
            jnp.asarray(Q), jnp.asarray(T), jnp.asarray(lens),
            jnp.asarray(band), prm, LMAX, interpret=True, state_dtype=sd,
        )]
    for a, b in zip(outs["int32"], outs["int16"]):
        np.testing.assert_array_equal(a, b)
