"""Long-read mapper front-end.

The exact long-read semantics live in oracle/longread.py (two-round voting,
segment concatenation — byte-parity tested against the LongReads reference
binary). This wrapper gives it the same batch interface as ShortReadMapper;
device acceleration of the LR stages (shift/sketch/lookup run on device,
vote + concatenation host-side) hangs off the same FusedMapper machinery in
a later milestone.
"""

from __future__ import annotations

import numpy as np

from gdiet_tpu.config import MapOptions
from gdiet_tpu.index.build import DietIndex
from gdiet_tpu.io.fastx import SeqRecord
from gdiet_tpu.oracle import align as oal
from gdiet_tpu.oracle.longread import map_read_lr


class LongReadMapper:
    def __init__(self, index: DietIndex, mo: MapOptions):
        self.mi = index
        self.mo = mo
        self.mid_occ = index.derive_mid_occ(mo)
        self._oracle_index = None

    def _oracle_mi(self):
        if self._oracle_index is None:
            mi = self.mi

            class _Wrap:
                w, k, pattern = mi.w, mi.k, mi.pattern
                names, lengths = mi.names, [int(x) for x in mi.lengths]

                @staticmethod
                def get(minier):
                    return mi.get(minier)

                @staticmethod
                def getseq(rid, st, en, rev=False):
                    return mi.getseq(rid, st, en, rev)

            self._oracle_index = _Wrap()
        return self._oracle_index

    def map_batch(self, reads: list[SeqRecord]) -> list[list[oal.Reg]]:
        mi = self._oracle_mi()
        return [
            map_read_lr(mi, r.seq, self.mo, self.mid_occ, r.name) for r in reads
        ]

    def map_stream(self, batches):
        for batch in batches:
            yield self.map_batch(batch)
