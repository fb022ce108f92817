"""Split ultra-long reads into fixed-size segments.

Analog of ReproducibleEvaluation/ReadMapping/UltraLongReadSplitter.py: ONT
ultralong reads are pre-split to (default) 30 kb segments before mapping
(Read-mapping-real-data-ONT.sh:16-18). Segment ``i`` of read ``X`` is named
``X_i``.

Usage: python eval/ultralong_read_splitter.py in.fq 30000 > out.fq
"""

import sys

sys.path.insert(0, ".")

from gdiet_tpu.io.fastx import read_fastx  # noqa: E402


def split(path: str, max_len: int, out=sys.stdout):
    for rec in read_fastx(path):
        n = 0
        for st in range(0, rec.l_seq, max_len):
            seq = rec.seq[st : st + max_len]
            qual = (rec.qual or "I" * rec.l_seq)[st : st + max_len]
            out.write(f"@{rec.name}_{n}\n{seq}\n+\n{qual}\n")
            n += 1


if __name__ == "__main__":
    split(sys.argv[1], int(sys.argv[2]))
