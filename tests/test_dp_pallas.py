"""Pallas DP kernel vs the XLA scan implementation (interpreter mode)."""

import random

import jax.numpy as jnp
import numpy as np

from gdiet_tpu.ops.dp import backtrack_batch, extd2_batch
from gdiet_tpu.ops.dp_pallas import extd2_batch_pallas

LMAX = 64


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
