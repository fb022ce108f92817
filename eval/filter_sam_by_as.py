"""Filter SAM records by minimum AS (alignment score) tag.

Analog of ReproducibleEvaluation/ReadMapping/FilterSAMbyAStag.py.

Usage: python eval/filter_sam_by_as.py in.sam 100 > out.sam
"""

import sys


def filter_sam(path: str, as_min: int, out=sys.stdout):
    with open(path) as f:
        for line in f:
            if line.startswith("@"):
                out.write(line)
                continue
            score = None
            for field in line.rstrip("\n").split("\t")[11:]:
                if field.startswith("AS:i:"):
                    score = int(field[5:])
                    break
            if score is not None and score >= as_min:
                out.write(line)


if __name__ == "__main__":
    filter_sam(sys.argv[1], int(sys.argv[2]))
