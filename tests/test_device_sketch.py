"""Device sketch vs scalar oracle: emission content, order, and caps."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from gdiet_tpu import pattern as pat
from gdiet_tpu.oracle import sketch as osk
from gdiet_tpu.ops.sketch import sketch_emit

DPAD = 320
U32 = (1 << 32) - 1


def _device_emit(codes, gm, k, w, final_flush_ge):
    D = len(gm)
    dc = np.full((1, DPAD), 255, np.uint8)
    dc[0, :D] = codes[gm]
    rp = np.zeros((1, DPAD), np.int64)
    rp[0, :D] = gm
    xs, ys, valid, n = sketch_emit(
        jnp.array(dc), jnp.array([D]), jnp.array(rp), jnp.array([0]),
        k, w, DPAD, final_flush_ge=final_flush_ge,
    )
    n = int(n[0])
    return [(int(xs[0, i]), int(ys[0, i])) for i in range(min(n, DPAD))]


@pytest.mark.parametrize("kw", [(5, 3), (13, 7)])
def test_sketch_fuzz(kw):
    k, w = kw
    rng = random.Random(1234 + k)
    for trial in range(60):
        L = rng.randrange(30, 300)
        alphabet = "ACGT" if trial % 3 else "ACGTN"
        seq = "".join(rng.choices(alphabet, k=L))
        pattern = rng.choice(["11", "10", "110", "1110", "100"])
        mode = rng.choice(["index", "query"])
        shift = 0 if mode == "index" else rng.randrange(0, len(pattern))
        codes = osk.seq_to_code(seq)
        gm = pat.gather_map(L, pattern, shift)
        if len(gm) == 0:
            continue
        if mode == "index":
            out = osk.sketch_index(codes, w, k, 0, pattern)
        else:
            out, _ = osk.sketch_query(codes, w, k, pattern, shift, 0)
        dev = _device_emit(codes, gm, k, w, final_flush_ge=(mode != "index"))
        assert out == dev, f"trial={trial} k={k} w={w} Z={pattern} s={shift} {mode}"
        # mm_sketch3 cap semantics: capped output is a prefix; the returned
        # extracted_len is the real position of the last capped seed
        if mode == "query" and len(dev) > 3:
            cap = rng.randrange(1, len(dev))
            o_cap, o_ext = osk.sketch_query(codes, w, k, pattern, shift, cap)
            assert o_cap == dev[:cap]
            assert o_ext == (dev[cap - 1][1] >> 1) & U32
