"""Device index vs oracle index: keys, per-key positions, serialization,
chunked construction."""

import numpy as np

import gdiet_tpu.index.build as ib
from gdiet_tpu.config import options_for
from gdiet_tpu.index import DietIndex, build_index
from gdiet_tpu.io.fastx import read_fastx
from gdiet_tpu.oracle.index import build_index as oracle_build


def _check(refs, io_):
    omi = oracle_build(refs, io_.w, io_.k, io_.pattern)
    dmi = build_index(refs, io_)
    okeys = sorted(omi.table.keys())
    assert [int(k) for k in okeys] == dmi.keys.tolist()
    for i, kk in enumerate(okeys):
        assert np.array_equal(omi.table[kk], dmi.positions[dmi.starts[i] : dmi.starts[i + 1]])
    assert omi.cal_max_occ(2e-4) == dmi.cal_max_occ(2e-4)
    return dmi


def test_index_parity_multichrom(data_dir):
    refs = [(r.name, r.seq) for r in read_fastx(str(data_dir / "ref2.fa"))]
    io_, _ = options_for("sr", pattern="110")
    dmi = _check(refs, io_)
    # getseq parity incl. reverse complement
    codes = dmi.getseq(1, 100, 160)
    rcodes = dmi.getseq(1, 100, 160, rev=True)
    ln = int(dmi.lengths[1])
    manual = dmi.codes[dmi.seq_offsets[1] + ln - 160 : dmi.seq_offsets[1] + ln - 100][::-1]
    manual = np.where(manual < 4, 3 - manual, manual)
    assert np.array_equal(rcodes, manual)
    assert len(codes) == 60


def test_index_chunked_and_roundtrip(data_dir, tmp_path):
    refs = [(r.name, r.seq) for r in read_fastx(str(data_dir / "ref2.fa"))]
    io_, _ = options_for("sr", pattern="10")
    full = build_index(refs, io_)
    old = ib.CHUNK
    try:
        ib.CHUNK = 1000
        chunked = build_index(refs, io_)
    finally:
        ib.CHUNK = old
    assert np.array_equal(full.keys, chunked.keys)
    assert np.array_equal(full.positions, chunked.positions)
    assert np.array_equal(full.starts, chunked.starts)

    p = str(tmp_path / "test.gdi.npz")
    full.save(p)
    ld = DietIndex.load(p)
    assert ld.k == full.k and ld.pattern == full.pattern
    assert np.array_equal(ld.keys, full.keys)
    assert np.array_equal(ld.positions, full.positions)
    assert DietIndex.is_index(p)
    assert not DietIndex.is_index(str(data_dir / "ref.fa"))


def test_batched_lookup(data_dir):
    import jax.numpy as jnp

    refs = [(r.name, r.seq) for r in read_fastx(str(data_dir / "ref.fa"))]
    io_, _ = options_for("sr", pattern="10")
    dmi = build_index(refs, io_)
    qs = jnp.asarray(np.concatenate([dmi.keys[:5], np.array([12345], np.uint64)]))
    starts, counts = dmi.lookup(qs)
    expect = dmi.starts[1:6] - dmi.starts[:5]
    assert np.array_equal(np.asarray(counts)[:5], expect)
    assert int(counts[5]) == 0
