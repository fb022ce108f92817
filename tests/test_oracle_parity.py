"""Byte-level SAM parity of the Python oracle against the reference binary's
golden outputs (tests/data/README.md)."""

import pytest

from gdiet_tpu.config import MM_F_NO_PRINT_2ND, options_for
from gdiet_tpu.io import sam as samio
from gdiet_tpu.io.fastx import read_fastx
from gdiet_tpu.oracle.index import build_index, derive_mid_occ
from gdiet_tpu.oracle.pipeline import map_read


def _options(pattern: str):
    # matches the reference's Illumina benchmark command (README.md:41)
    return options_for(
        "sr",
        pattern=pattern,
        max_seeds=2.0,
        best_n=1,
        bw_frac=0.05,
        bw_min=150,
        bw_max=200,
        min_cnt=0.95,
        rec_threshold_frac=0.3,
        min_dp_max=100,
        AF_max_loc=2,
    )


def _run_parity(data_dir, ref_fa, reads_fq, golden_sam, pattern):
    io_, mo = _options(pattern)
    refs = list(read_fastx(str(data_dir / ref_fa)))
    mi = build_index([(r.name, r.seq) for r in refs], io_.w, io_.k, mo.pattern)
    mid_occ = derive_mid_occ(mi, mo)
    golden = [
        l.rstrip("\n")
        for l in open(data_dir / golden_sam)
        if not l.startswith("@")
    ]
    produced = []
    for rec in read_fastx(str(data_dir / reads_fq)):
        regs = map_read(mi, rec.seq, mo, mid_occ, rec.name)
        if regs:
            for r in regs:
                if (mo.flag & MM_F_NO_PRINT_2ND) and r.id != r.parent:
                    continue
                produced.append(
                    samio.sam_record(rec.name, rec.seq, rec.qual, r, regs, mi.names, mo.flag, 0)
                )
        else:
            produced.append(
                samio.sam_record(rec.name, rec.seq, rec.qual, None, [], mi.names, mo.flag, 0)
            )
    assert len(produced) == len(golden)
    for mine, gold in zip(produced, golden):
        assert mine == gold


def test_parity_simple(data_dir):
    _run_parity(data_dir, "ref.fa", "reads.fq", "golden.sam", "10")


@pytest.mark.parametrize("pattern", ["10", "110", "1110", "11"])
def test_parity_hard(data_dir, pattern):
    _run_parity(data_dir, "ref2.fa", "reads2.fq", f"golden2_{pattern}.sam", pattern)
