"""Byte-level SAM parity of the long-read oracle against the reference
LongReads binary's golden outputs (tests/data/make_lr_fixtures.py)."""

import pytest

from gdiet_tpu.config import MM_F_NO_PRINT_2ND, options_for
from gdiet_tpu.io import sam as samio
from gdiet_tpu.io.fastx import read_fastx
from gdiet_tpu.oracle.index import build_index, derive_mid_occ
from gdiet_tpu.oracle.longread import map_read_lr

CONFIGS = {
    # mirrors tests/data/make_lr_fixtures.py HIFI_ARGS / ONT_ARGS
    "hifi": dict(
        preset="map-hifi", k=19, w=19, max_seeds=0.2, bw=200, vt_dis=650,
        vt_nb_loc=5, vt_df1=0.0106, vt_df2=0.2, min_dp_max=100, vt_cov=0.04,
        vt_f=0.04,
    ),
    "ont": dict(
        preset="map-ont", k=15, w=10, bw=300, vt_dis=1000, vt_nb_loc=3,
        vt_df1=0.007, vt_df2=0.007, min_dp_max=100, vt_cov=0.1,
    ),
}


@pytest.mark.parametrize("tag", ["hifi", "ont"])
def test_lr_oracle_parity(data_dir, tag):
    cfg = dict(CONFIGS[tag])
    preset = cfg.pop("preset")
    io_, mo = options_for(preset, variant="lr", pattern="10", **cfg)
    refs = list(read_fastx(str(data_dir / "ref_lr.fa")))
    mi = build_index([(r.name, r.seq) for r in refs], io_.w, io_.k, mo.pattern)
    mid_occ = derive_mid_occ(mi, mo)
    golden = [
        l.rstrip("\n")
        for l in open(data_dir / f"golden_lr_{tag}.sam")
        if not l.startswith("@")
    ]
    produced = []
    for rec in read_fastx(str(data_dir / "reads_lr.fq")):
        regs = map_read_lr(mi, rec.seq, mo, mid_occ, rec.name)
        if regs:
            for r in regs:
                if (mo.flag & MM_F_NO_PRINT_2ND) and r.id != r.parent:
                    continue
                produced.append(
                    samio.sam_record(rec.name, rec.seq, rec.qual, r, regs,
                                     mi.names, mo.flag, 0)
                )
        else:
            produced.append(
                samio.sam_record(rec.name, rec.seq, rec.qual, None, [],
                                 mi.names, mo.flag, 0)
            )
    assert len(produced) == len(golden)
    for i, (mine, gold) in enumerate(zip(produced, golden)):
        assert mine == gold, f"record {i}"
