"""Device short-read pipeline vs the reference binary's golden SAM."""

import pytest

from gdiet_tpu.config import MM_F_NO_PRINT_2ND, options_for
from gdiet_tpu.index import build_index
from gdiet_tpu.io import sam as samio
from gdiet_tpu.io.fastx import read_fastx
from gdiet_tpu.pipeline import ShortReadMapper


def _options(pattern):
    return options_for(
        "sr", pattern=pattern, max_seeds=2.0, best_n=1, bw_frac=0.05,
        bw_min=150, bw_max=200, min_cnt=0.95, rec_threshold_frac=0.3,
        min_dp_max=100, AF_max_loc=2,
    )


def _run(data_dir, ref_fa, reads_fq, golden_sam, pattern, max_read_len):
    io_, mo = _options(pattern)
    refs = [(r.name, r.seq) for r in read_fastx(str(data_dir / ref_fa))]
    mi = build_index(refs, io_)
    mapper = ShortReadMapper(mi, mo, max_read_len=max_read_len)
    reads = list(read_fastx(str(data_dir / reads_fq)))
    golden = [
        l.rstrip("\n") for l in open(data_dir / golden_sam) if not l.startswith("@")
    ]
    produced = []
    for rec, regs in zip(reads, mapper.map_batch(reads)):
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


def test_device_pipeline_simple(data_dir):
    _run(data_dir, "ref.fa", "reads.fq", "golden.sam", "10", 256)


@pytest.mark.parametrize("pattern", ["10", "1110"])
def test_device_pipeline_hard(data_dir, pattern):
    _run(data_dir, "ref2.fa", "reads2.fq", f"golden2_{pattern}.sam", pattern, 512)
