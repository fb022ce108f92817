"""Seeding-quality evaluation: minimizers vs spaced seeds vs Genome-on-Diet.

Analog of ReproducibleEvaluation/SeedingEvaluation/kc-py1.py: for pairs of
(reference fragment, mutated read), sketch both with a chosen scheme and
report seed counts and matches — measuring how well each scheme preserves
seed matches under divergence.

Input format (as the reference's converted pairs file):
  >SEQ1
  <SEQ2
Usage:
  python eval/seeding_eval.py pairs.txt K W MODE PATTERN
  MODE: 0 = minimizers, 1 = spaced-pattern minimizers,
        2 = Genome-on-Diet seeds (pattern-sparsified, shift-inferred)
Output: CSV  pair,scheme,n1,n2,matches,edit_distance
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from gdiet_tpu.oracle import sketch as osk  # noqa: E402


def edit_distance(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = np.arange(lb + 1)
    bb = np.frombuffer(b.encode(), np.uint8)
    for i in range(1, la + 1):
        cur = np.empty(lb + 1, np.int64)
        cur[0] = i
        np.minimum(prev[:-1] + (bb != ord(a[i - 1])), prev[1:] + 1, out=cur[1:])
        for j in range(1, lb + 1):  # left-to-right insertion chain
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[-1])


def read_pairs(path: str):
    s1 = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                s1 = line[1:]
            elif line.startswith("<") and s1 is not None:
                yield s1, line[1:]
                s1 = None


def sketch_plain(seq: str, k: int, w: int) -> set:
    seeds = osk.sketch_index(osk.seq_to_code(seq), w, k, 0, "11")
    return {x >> 8 for x, _ in seeds}


def sketch_spaced(seq: str, k: int, w: int, pattern: str) -> set:
    """Spaced minimizers: drop pattern-0 positions within each k-mer window
    (kc-py1.py spaced_kmer), then minimize."""
    keep = [i for i in range(k) if pattern[i % len(pattern)] == "1"]
    codes = osk.seq_to_code(seq)
    n = len(codes)
    if n < k:
        return set()
    hashes = []
    for i in range(n - k + 1):
        km = codes[i : i + k][keep]
        if (km > 3).any():
            hashes.append(None)
            continue
        fwd = 0
        rev = 0
        for c in km:
            fwd = fwd << 2 | int(c)
        for c in km[::-1]:
            rev = rev << 2 | (3 - int(c))
        hashes.append(min(fwd, rev))
    out = set()
    for i in range(len(hashes) - w + 1):
        win = [h for h in hashes[i : i + w] if h is not None]
        if win:
            out.add(min(win))
    return out


def sketch_gdiet(seq: str, k: int, w: int, pattern: str) -> set:
    seeds, _ = osk.sketch_query(
        osk.seq_to_code(seq), w, k, pattern, 0, 1 << 32
    )
    return {x >> 8 for x, _ in seeds}


def main():
    path, k, w, mode, pattern = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
        sys.argv[5],
    )
    schemes = {0: "minimizer", 1: "spaced", 2: "gdiet"}
    print("pair,scheme,n1,n2,matches,edit_distance")
    for i, (s1, s2) in enumerate(read_pairs(path)):
        if mode == 0:
            a, b = sketch_plain(s1, k, w), sketch_plain(s2, k, w)
        elif mode == 1:
            a, b = sketch_spaced(s1, k, w, pattern), sketch_spaced(s2, k, w, pattern)
        else:
            a, b = sketch_gdiet(s1, k, w, pattern), sketch_gdiet(s2, k, w, pattern)
        ed = edit_distance(s1, s2)
        print(f"{i},{schemes[mode]},{len(a)},{len(b)},{len(a & b)},{ed}")


if __name__ == "__main__":
    main()
