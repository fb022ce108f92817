"""mappy-compatible API smoke tests."""

from gdiet_tpu.api import Aligner, fastx_read, revcomp


def test_aligner_map_and_seq(data_dir):
    a = Aligner(
        str(data_dir / "ref.fa"), preset="sr", pattern="10", max_seeds=2.0,
        best_n=1, bw_frac=0.05, bw_min=150, bw_max=200, min_cnt=0.95,
        rec_threshold_frac=0.3, min_dp_max=100, AF_max_loc=2,
    )
    assert a and a.n_seq == 1 and a.k == 21 and a.w == 11
    reads = list(fastx_read(str(data_dir / "reads.fq")))
    name, seq, qual = reads[0]
    hits = list(a.map(seq, cs=True, MD=True))
    assert hits, "read should map"
    h = hits[0]
    assert h.ctg in a.seq_names
    assert h.is_primary and h.r_en > h.r_st and h.q_en > h.q_st
    assert h.cigar_str.endswith("M") or "M" in h.cigar_str
    assert h.cs and h.MD
    # reference subsequence round-trip
    sub = a.seq(h.ctg, h.r_st, h.r_en)
    assert sub is not None and len(sub) == h.r_en - h.r_st
    # mapping the reverse complement flips the strand
    rc_hits = list(a.map(revcomp(seq)))
    assert rc_hits and rc_hits[0].strand == -hits[0].strand


def test_aligner_from_seq():
    genome = "ACGTTGCA" * 4000
    a = Aligner(seq=genome, preset="sr", pattern="10")
    assert a.n_seq == 1 and a.seq_names == ["N/A"]
