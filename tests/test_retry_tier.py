"""Overflow-retry device tier (SURVEY.md §7 bucketing-with-retry).

Force a tiny primary hit budget on a repetitive genome so reads overflow
the first fused envelope, and assert that the wider retry tier (not the
scalar oracle) catches them with results identical to a generously-budgeted
mapper."""

import numpy as np

from gdiet_tpu import native
from gdiet_tpu.config import options_for
from gdiet_tpu.index.build import build_index
from gdiet_tpu.io.fastx import SeqRecord
from gdiet_tpu.pipeline.shortread import ShortReadMapper


def _mk_repetitive(seed=9, glen=60_000):
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    g = rng.integers(0, 4, glen)
    unit = rng.integers(0, 4, 400)
    for i in range(24):  # 24 diverged copies of one element
        c = unit.copy()
        idx = rng.integers(0, 400, 12)
        c[idx] = (c[idx] + rng.integers(1, 4, 12)) % 4
        st = int(rng.integers(0, glen - 400))
        g[st : st + 400] = c
    seq = "".join(bases[c] for c in g)
    io_, mo = options_for(
        "sr", pattern="10", max_seeds=2.0, best_n=1, bw_frac=0.05,
        bw_min=150, bw_max=200, min_cnt=0.95, rec_threshold_frac=0.3,
        min_dp_max=100, AF_max_loc=2,
    )
    mi = build_index([("chrR", seq)], io_)
    reads = []
    for j in range(48):
        st = int(rng.integers(0, glen - 150))
        r = g[st : st + 150].copy()
        r[int(rng.integers(0, 150))] ^= 1
        reads.append(SeqRecord(f"q{j}", "".join(bases[c] for c in r)))
    return mi, mo, reads


def test_retry_tier_catches_overflow():
    mi, mo, reads = _mk_repetitive()
    tight = ShortReadMapper(mi, mo, max_read_len=160, seed_budget=32,
                            shift_seed_budget=16, hit_budget=16,
                            dp_frac=0.25, retry_hit_budget=512,
                            retry_batch=64)
    wide = ShortReadMapper(mi, mo, max_read_len=160, seed_budget=32,
                           shift_seed_budget=16, hit_budget=512,
                           dp_frac=1.0, retry_hit_budget=0)
    sam_tight = b"".join(tight.map_stream_sam(iter([reads])))
    sam_wide = b"".join(wide.map_stream_sam(iter([reads])))
    assert sam_tight == sam_wide
    # the tiny primary budget must actually have overflowed, and the retry
    # tier (not the oracle) must have absorbed it
    assert tight.stats.get("retried_reads", 0) > 0, tight.stats
    assert tight.stats["fallback_reads"] == 0, tight.stats


def test_retry_regs_path():
    mi, mo, reads = _mk_repetitive(seed=10)
    tight = ShortReadMapper(mi, mo, max_read_len=160, seed_budget=32,
                            shift_seed_budget=16, hit_budget=16,
                            dp_frac=0.25, retry_hit_budget=512,
                            retry_batch=64)
    wide = ShortReadMapper(mi, mo, max_read_len=160, seed_budget=32,
                           shift_seed_budget=16, hit_budget=512,
                           dp_frac=1.0, retry_hit_budget=0)
    rt = tight.map_batch(reads)
    rw = wide.map_batch(reads)
    for a, b in zip(rt, rw):
        assert len(a or []) == len(b or [])
        for x, y in zip(a or [], b or []):
            assert (x.rid, x.rs, x.re, x.qs, x.qe, x.rev, x.cigar,
                    x.mapq) == (y.rid, y.rs, y.re, y.qs, y.qe, y.rev,
                                y.cigar, y.mapq)
