"""Single fused u8 D2H tensor (device_step.fuse_out_device/unfuse_out):
bit-exact round trip of the meta layout + packed ops, incl. negative
int16 fields and the dp_score NEG_INF clamp."""

import jax.numpy as jnp
import numpy as np

from gdiet_tpu.ops.dp import NEG_INF
from gdiet_tpu.pipeline.device_step import (
    PACK_B, PACK_BK, fuse_out_device, unfuse_out,
)


def test_fused_roundtrip_bit_exact():
    rng = np.random.default_rng(4)
    B, K, OB = 37, 3, 44
    F = 3 + 12 * K
    meta = rng.integers(-3000, 30000, (B, F), dtype=np.int32)
    # i32-only fields may exceed i16: chrom(3), ts(5), opsrow(11)
    for f in (3, 5, 11):
        meta[:, 3 + f * K: 3 + (f + 1) * K] = rng.integers(
            -1, 3_000_000_000 // 2, (B, K), dtype=np.int32)
    # dp_score(8): include NEG_INF sentinels -> clamped to -32768
    dp = slice(3 + 8 * K, 3 + 9 * K)
    meta[::5, dp] = NEG_INF
    ops = rng.integers(0, 256, (37 * 2, OB), dtype=np.uint8)

    out = np.asarray(fuse_out_device(jnp.asarray(meta), jnp.asarray(ops), K))
    m2, o2 = unfuse_out(out, B, K, OB)
    want = meta.copy()
    want[:, dp] = np.maximum(want[:, dp], -32768)
    np.testing.assert_array_equal(m2, want)
    np.testing.assert_array_equal(np.asarray(o2), ops)


def test_field_split_covers_layout():
    from gdiet_tpu.pipeline.device_step import FUSE_I16, FUSE_I32

    assert sorted(FUSE_I16 + FUSE_I32) == list(range(len(PACK_BK)))
    assert len(PACK_B) == 3
