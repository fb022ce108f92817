"""Batched device DP vs the difference-recurrence oracle: scores + CIGARs."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gdiet_tpu.oracle import align as oal
from gdiet_tpu.ops.dp import backtrack_batch, extd2_batch

LMAX = 120


@pytest.mark.parametrize("prm", [(2, 8, 12, 2, 24, 1), (1, 4, 6, 2, 26, 1)])
def test_dp_fuzz(prm):
    seed = sum(prm)
    random.seed(seed)
    rng = np.random.default_rng(seed)
    cases = []
    for t in range(48):
        L = random.randrange(2, LMAX)
        q = rng.integers(0, 5 if t % 4 == 0 else 4, L).astype(np.uint8)
        if t % 5 == 0:
            tgt = rng.integers(0, 4, L).astype(np.uint8)
        else:
            tgt = q.copy()
            for _ in range(random.randrange(0, 10)):
                op = random.random()
                j = random.randrange(0, max(1, len(tgt) - 1))
                if op < 0.5:
                    tgt[j] = random.randrange(4)
                elif op < 0.75:
                    tgt = np.insert(tgt, j, random.randrange(4))[:L]
                else:
                    tgt = np.delete(tgt, j)
            if len(tgt) < L:
                tgt = np.concatenate([tgt, rng.integers(0, 4, L - len(tgt)).astype(np.uint8)])
            tgt = tgt[:L].astype(np.uint8)
        bw = random.choice([3, 10, 37, 150])
        cases.append((q, tgt, L, bw))
    N = len(cases)
    Q = np.zeros((N, LMAX), np.uint8)
    T = np.zeros((N, LMAX), np.uint8)
    lens = np.zeros(N, np.int32)
    band = np.zeros(N, np.int32)
    for i, (q, tgt, L, bw) in enumerate(cases):
        Q[i, :L], T[i, :L], lens[i], band[i] = q, tgt, L, bw
    score, dirs, offs, off_ends = extd2_batch(
        jnp.asarray(Q), jnp.asarray(T), jnp.asarray(lens), jnp.asarray(band),
        jnp.asarray(np.array(prm, np.int32)), LMAX,
    )
    cigs = backtrack_batch(np.asarray(dirs), np.asarray(offs), np.asarray(off_ends), lens)
    for i, (q, tgt, L, bw) in enumerate(cases):
        ez = oal.extd2(q, tgt, *prm, bw, 100, 10, oal.KSW_EZ_APPROX_MAX)
        assert ez.score == int(score[i]), f"case {i}"
        assert ez.cigar == cigs[i], f"case {i}"
