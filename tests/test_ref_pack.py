"""2-bit reference pack (pipeline.device_step.pack_ref_codes): the device
analog of the reference's 4-bit mi->S pack (index.c:350-357) at 4x HBM cut.

Checks the packed window gather reproduces the uint8 gather exactly —
including N (code 4) restoration through the 1-bit mask — at every sub-byte
alignment, and that an N-free genome packs with no mask at all.
"""

import numpy as np
import jax.numpy as jnp

from gdiet_tpu.pipeline.device_step import (
    _window_rows, _window_rows_packed, pack_ref_codes,
)


def test_pack_no_n():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, 1003, dtype=np.uint8)
    packed, nmask = pack_ref_codes(codes)
    assert nmask is None
    assert len(packed) == (1003 + 3) // 4
    # unpack round-trip
    un = np.stack([(packed >> (2 * t)) & 3 for t in range(4)], 1).ravel()
    np.testing.assert_array_equal(un[:1003], codes)


def test_packed_window_gather_matches_uint8():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, 2048, dtype=np.uint8)
    # sprinkle N runs (code 4) to exercise the bitmask path
    codes[100:130] = 4
    codes[1037] = 4
    codes[2000:2048] = 4
    packed, nmask = pack_ref_codes(codes)
    assert nmask is not None

    L = 96
    # every sub-byte and sub-bit alignment, plus edges
    fstart = np.array(
        [0, 1, 2, 3, 4, 5, 6, 7, 63, 64, 65, 97, 99, 1030, 1950, 2040],
        np.int64,
    )
    got = np.asarray(_window_rows_packed(
        jnp.asarray(packed), jnp.asarray(fstart), L, nmask=jnp.asarray(nmask)
    ))
    want = np.asarray(_window_rows(
        jnp.asarray(codes), jnp.asarray(fstart), L
    ))
    # compare only in-range positions (both paths return garbage past the
    # end of flat; callers mask by window length)
    for n, s in enumerate(fstart):
        m = min(L, 2048 - int(s))
        np.testing.assert_array_equal(got[n, :m], want[n, :m], err_msg=str(s))
