"""C scalar extd2 (native/gdiet_native.c) vs the Python oracle kernel.

The oracle fallback path routes through the C port; any divergence would
silently break SAM parity, so fuzz them against each other (random,
related-with-indels, and N-containing sequences; several scoring sets and
band widths including unbounded)."""

import random

import numpy as np
import pytest

import gdiet_tpu.native as native
from gdiet_tpu.oracle import align as oal


@pytest.mark.skipif(native.lib is None, reason="no native library")
def test_extd2_c_matches_python_oracle():
    rng = np.random.default_rng(3)
    random.seed(3)
    for case in range(120):
        lq = random.randrange(5, 200)
        lt = random.randrange(5, 200)
        if case % 3 == 0:
            q = rng.integers(0, 4, lq).astype(np.uint8)
            t = rng.integers(0, 4, lt).astype(np.uint8)
        else:
            base = rng.integers(0, 5, max(lq, lt)).astype(np.uint8)
            q = base[:lq].copy()
            t = base[:lt].copy()
            for _ in range(random.randrange(0, 10)):
                t[random.randrange(lt)] = random.randrange(5)
        w = random.choice([10, 50, 150, 500, -1])
        prm = random.choice(
            [(2, 8, 12, 2, 24, 1), (1, 4, 6, 2, 26, 1), (2, 4, 4, 2, 24, 1)]
        )
        res_c = native.extd2_approx(q, t, *prm, w)
        lib = native.lib
        native.lib = None  # force the pure-Python path
        try:
            ez = oal.extd2(q, t, *prm, w, 200, -1, oal.KSW_EZ_APPROX_MAX)
        finally:
            native.lib = lib
        assert res_c is not None
        assert res_c[0] == ez.score, (case, lq, lt, w, prm)
        assert res_c[1] == ez.cigar, (case, lq, lt, w, prm)
