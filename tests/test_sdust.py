"""SDUST masking behavior (validated byte-exactly against the reference
binary with -T 20 during development; unit checks here)."""

from gdiet_tpu.ops.sdust import dust_minimizers, sdust_core


def test_sdust_masks_low_complexity():
    seq = "ACGTAGCTTAGCAA" + "AT" * 60 + "GCGTACGATCAGCT"
    regs = sdust_core(seq, 20, 64)
    assert regs, "poly-AT run must be masked"
    s, e = regs[0]
    assert s <= 16 and e >= len(seq) - 16


def test_sdust_clean_sequence_unmasked():
    seq = "ACGTTGCATGGATCCTAGGCATCGATCGGCTAGCTTACGGAT" * 3
    assert sdust_core(seq, 20, 64) == []


def test_dust_minimizers_drop():
    seq = "AT" * 100
    # one fake minimizer with span 21 at position 50 (fully inside the LCR)
    seeds = [((123 << 8) | 21, (50 << 1))]
    assert dust_minimizers(seeds, seq, 20) == []
    # with masking off everything is kept
    assert dust_minimizers(seeds, seq, 0) == seeds


def test_native_sdust_flags_fuzz():
    """C sdust_flags_batch agrees with the Python sdust_core on 'has any
    masked interval' across random and adversarial reads."""
    import numpy as np
    import pytest

    from gdiet_tpu import native

    if native.lib is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    bases = "ACGT"
    reads = []
    for i in range(200):
        L = int(rng.integers(30, 300))
        r = [bases[int(b)] for b in rng.integers(0, 4, L)]
        if i % 4 == 1:  # inject a low-complexity run
            run_at = int(rng.integers(0, max(1, L - 40)))
            rl = int(rng.integers(20, 40))
            pat = ["A", "AT", "CAG"][i % 3]
            ins = (pat * rl)[:rl]
            r[run_at : run_at + rl] = list(ins)
        if i % 7 == 3:  # Ns reset the window
            r[int(rng.integers(0, L))] = "N"
        reads.append("".join(r))
    reads.append("")  # empty read
    reads.append("AT" * 100)  # pure dust
    from gdiet_tpu.ops.sdust import sdust_core

    flags = native.sdust_flags(reads, 20)
    for i, seq in enumerate(reads):
        expect = 1 if sdust_core(seq, 20, 64) else 0
        assert flags[i] == expect, (i, seq[:50])


def test_sdust_per_read_routing_parity():
    """-T 20 through the mapper: per-read routing (clean reads on the
    device path, dusty reads on the exact oracle) produces exactly the
    all-oracle result, and clean reads really do stay on device."""
    import numpy as np
    import pytest

    from gdiet_tpu import native
    from gdiet_tpu.config import options_for
    from gdiet_tpu.index import build_index
    from gdiet_tpu.io.fastx import read_fastx
    from gdiet_tpu.oracle.index import build_index as obuild
    from gdiet_tpu.oracle.index import derive_mid_occ
    from gdiet_tpu.oracle.pipeline import map_read
    from gdiet_tpu.pipeline import ShortReadMapper
    import pathlib

    if native.lib is None:
        pytest.skip("native library unavailable")
    data = pathlib.Path(__file__).parent / "data"
    io_, mo = options_for(
        "sr", pattern="10", max_seeds=2.0, best_n=1, bw_frac=0.05,
        bw_min=150, bw_max=200, min_cnt=0.95, rec_threshold_frac=0.3,
        min_dp_max=100, AF_max_loc=2, sdust_thres=20,
    )
    refs = [(r.name, r.seq) for r in read_fastx(str(data / "ref.fa"))]
    mi = build_index(refs, io_)
    reads = list(read_fastx(str(data / "reads.fq")))[:12]
    # splice a dusty read in (poly-AT core maps nowhere, but must route
    # through the oracle and still produce the oracle's record)
    dusty = reads[0].__class__(
        name="dusty", seq=reads[0].seq[:40] + "AT" * 40 + reads[0].seq[-30:],
        qual=None)
    reads.insert(3, dusty)
    mapper = ShortReadMapper(mi, mo, max_read_len=256)
    state = mapper._prepare_and_dispatch(reads)
    host_only = state[3]
    assert host_only[3], "dusty read must take the host path"
    assert not host_only[:3].all(), "clean reads must stay on device"
    got = mapper.map_batch(reads)
    omi = obuild(refs, io_.w, io_.k, mo.pattern)
    mid = derive_mid_occ(omi, mo)
    for rec, regs in zip(reads, got):
        want = map_read(omi, rec.seq, mo, mid, rec.name)
        a = [(r.rid, r.rs, r.re, r.qs, r.qe, r.score, r.rev)
             for r in (regs or [])]
        b = [(r.rid, r.rs, r.re, r.qs, r.qe, r.score, r.rev)
             for r in (want or [])]
        assert a == b, rec.name
