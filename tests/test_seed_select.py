"""Device mm_seed_select (seed.c:66-106): high-occurrence streak selection
runs ON DEVICE and matches the scalar oracle byte-for-byte — the old path
sent every long read with a high-occ seed to the oracle.
"""

import numpy as np
import pytest

from gdiet_tpu.config import options_for
from gdiet_tpu.index import build_index
from gdiet_tpu.io.fastx import SeqRecord
from gdiet_tpu.oracle.index import build_index as oracle_build
from gdiet_tpu.oracle.pipeline import map_read
from gdiet_tpu.pipeline.shortread import ShortReadMapper


def _mk_genome(rng):
    """300 kb: unique flanks around a 171-bp-monomer tandem array (high-occ
    minimizers) and a dispersed 800-bp repeat at 30+ copies."""
    g = rng.integers(0, 4, 300_000, dtype=np.int8)
    mono = rng.integers(0, 4, 171, dtype=np.int8)
    arr = np.tile(mono, 300)[: 40_000]
    g[120_000:160_000] = arr
    rep = rng.integers(0, 4, 800, dtype=np.int8)
    for i in range(30):
        st = 5_000 + i * 9_000
        g[st : st + 800] = rep
    return "".join("ACGT"[c] for c in g)


def _reads(genome, rng, n, rlen):
    reads = []
    hot = [(118_000, 162_000), (4_500, 276_000)]
    for i in range(n):
        lo, hi = hot[i % 2]
        st = int(rng.integers(lo, hi - rlen))
        s = list(genome[st : st + rlen])
        for _ in range(2):
            p = int(rng.integers(0, rlen))
            s[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append(SeqRecord(f"r{i}_{st}", "".join(s)))
    return reads


@pytest.mark.slow
def test_device_seed_select_matches_oracle():
    rng = np.random.default_rng(17)
    genome = _mk_genome(rng)
    # occ_dist 100 with 280-bp reads -> max_high_occ 2-3 per full-read
    # streak: the selection actively keeps some high-occ seeds
    io_, mo = options_for(
        "sr", pattern="10", max_seeds=2.0, best_n=1, bw_frac=0.05,
        bw_min=150, bw_max=280, min_cnt=0.95, rec_threshold_frac=0.3,
        min_dp_max=50, AF_max_loc=2,
    )
    mo.mid_occ = 6  # force plenty of high-occurrence seeds
    mo.max_max_occ = 400
    mo.occ_dist = 100
    mi = build_index([("chr1", genome)], io_)
    omi = oracle_build([("chr1", genome)], io_.w, io_.k, mo.pattern)

    reads = _reads(genome, rng, 64, 280)
    mapper = ShortReadMapper(mi, mo, max_read_len=288, seed_budget=64,
                             shift_seed_budget=32, hit_budget=2048)
    results = mapper.map_batch(reads)

    # ground truth: the scalar oracle (bit-parity-proven vs the reference
    # binary elsewhere); its seed_select is the literal heap port
    from gdiet_tpu.config import MM_F_NO_PRINT_2ND
    from gdiet_tpu.io import sam as samio

    n_sel_active = 0
    for rec, regs in zip(reads, results):
        oregs = map_read(omi, rec.seq, mo, mo.mid_occ, rec.name)
        mine = [samio.sam_record(rec.name, rec.seq, rec.qual, r, regs,
                                 mi.names, mo.flag, 0)
                for r in regs or [None]]
        want = [samio.sam_record(rec.name, rec.seq, rec.qual, r, oregs,
                                 mi.names, mo.flag, 0)
                for r in oregs or [None]]
        assert mine == want, rec.name
        if oregs:
            n_sel_active += 1
    assert n_sel_active >= 20  # the workload really maps
