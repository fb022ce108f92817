"""Minimal library-API walkthrough (the reference's example.c:12-63).

Builds (or loads) a diet index over a target FASTA, maps each query with
CIGARs enabled, and prints one PAF-like line per hit with a cg:Z tag —
the same output the C example produces with mm_map + MM_F_CIGAR.

Run from the repo root:
    python examples/example.py tests/data/ref.fa tests/data/reads.fq
"""

import sys

from gdiet_tpu.api import Aligner, fastx_read

CIGAR_STR = "MIDNSHP=X"


def main(argv):
    if len(argv) < 3:
        print("Usage: example.py <target.fa|index.npz> <query.fa/q>",
              file=sys.stderr)
        return 1
    aligner = Aligner(argv[1], preset="sr")  # builds or loads the index
    for name, seq, _qual in fastx_read(argv[2]):
        for h in aligner.map(seq):  # one Alignment per hit
            cg = "".join(f"{l}{CIGAR_STR[op]}" for l, op in h.cigar)
            strand = "+" if h.strand > 0 else "-"
            print(f"{name}\t{len(seq)}\t{h.q_st}\t{h.q_en}\t{strand}\t"
                  f"{h.ctg}\t{h.ctg_len}\t{h.r_st}\t{h.r_en}\t{h.mlen}\t"
                  f"{h.blen}\t{h.mapq}\tcg:Z:{cg}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
