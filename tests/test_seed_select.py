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


def test_seed_select_fuzz_vs_oracle_heap():
    """Property fuzz: _seed_select_device's kept mask equals the literal
    oracle heap (oracle/seed.seed_select) over random occurrence/position
    patterns, including all-low, all-high, singleton, streak-boundary and
    max_max_occ cases."""
    import jax.numpy as jnp
    from dataclasses import replace as dc_replace

    from gdiet_tpu.oracle.seed import Seed, seed_select
    from gdiet_tpu.pipeline.device_step import (
        StepConfig, _seed_select_device,
    )
    from gdiet_tpu.config import options_for
    from gdiet_tpu.index.build import DietIndex

    rng = np.random.default_rng(99)
    io_, mo = options_for("sr", pattern="10")
    mi = DietIndex(k=21, w=11, pattern="10", names=["c"],
                   lengths=np.array([1000]), seq_offsets=np.array([0]),
                   codes=np.zeros(1000, np.uint8),
                   keys=np.zeros(0, np.uint64), starts=np.zeros(1, np.int64),
                   positions=np.zeros(0, np.uint64))
    B, S = 64, 48
    for trial in range(8):
        mid_occ = int(rng.integers(1, 12))
        max_max = mid_occ + int(rng.integers(1, 60))
        dist = int(rng.integers(20, 400))
        qlen = int(rng.integers(60, 2000))
        cfg = StepConfig.from_options(mi, mo, mid_occ, 256, S, 16, 256)
        cfg = dc_replace(cfg, occ_dist=dist, max_max_occ=max_max)

        # random seeds: mix of missing (cnt 0), low, high, very high
        cnts = rng.choice(
            [0, 1, mid_occ, mid_occ + 1, mid_occ + 5, max_max, max_max + 9],
            size=(B, S),
        ).astype(np.int64)
        qpos = np.sort(rng.integers(0, qlen, (B, S)), axis=1).astype(np.int32)
        n_seed = rng.integers(0, S + 1, B)
        seed_ok = np.arange(S)[None, :] < n_seed[:, None]
        lens = np.full(B, qlen, np.int64)

        kept_dev = np.asarray(_seed_select_device(
            jnp.asarray(cnts), jnp.asarray(qpos), jnp.asarray(seed_ok),
            jnp.asarray(lens), cfg,
        ))

        for b in range(B):
            collected = [
                (j, Seed(q_pos=int(qpos[b, j]) << 1, q_span=21,
                         hits=np.zeros(int(cnts[b, j]), np.uint64),
                         n=int(cnts[b, j])))
                for j in range(S) if seed_ok[b, j] and cnts[b, j] > 0
            ]
            a = [s for _, s in collected]
            seed_select(a, qlen, mid_occ, max_max, dist)
            want = np.zeros(S, bool)
            for (j, _), s in zip(collected, a):
                want[j] = not s.flt
            np.testing.assert_array_equal(
                kept_dev[b], want,
                err_msg=f"trial {trial} row {b} mid={mid_occ} "
                        f"mmax={max_max} dist={dist}",
            )
