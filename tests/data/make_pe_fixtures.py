#!/usr/bin/env python
"""Generate the paired-end golden fixture with the reference binary.

Creates ref_pe.fa + reads_pe_1.fq/reads_pe_2.fq (FR-oriented pairs) and the
reference GDiet-ShortReads SAM output golden_pe.sam, produced by the binary
built from /root/reference (see .claude/skills/verify/SKILL.md). The pair
fields exercised: flags 0x1/0x2/0x40/0x80/0x20/0x8, RNEXT/PNEXT/TLEN
(mm_write_sam3 format.c:432-530), pe_ori revcomp (map.c:1057-1090).
"""

import pathlib
import subprocess
import sys

import numpy as np

HERE = pathlib.Path(__file__).parent
REF_BIN = pathlib.Path("/tmp/gdiet_ref/SR/GDiet")

GENOME_LEN = 200_000
N_PAIRS = 300
READ_LEN = 150
SEED = 20260817

ARGS = ["-a", "-t", "1", "-x", "sr", "-Z", "10", "-W", "2", "-k", "21",
        "-w", "11", "-i", "2", "-N", "1", "-r", "0.05,150,200",
        "-n", "0.95,0.3", "-s", "100", "--AF_max_loc", "2"]


def revcomp(arr):
    return (3 - arr)[::-1]


def main():
    rng = np.random.default_rng(SEED)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = rng.integers(0, 4, GENOME_LEN, dtype=np.int64)
    fa = HERE / "ref_pe.fa"
    with open(fa, "w") as f:
        f.write(">chrP\n")
        seq = bases[genome].tobytes().decode()
        for i in range(0, GENOME_LEN, 80):
            f.write(seq[i : i + 80] + "\n")

    def mutate(r):
        nsub = rng.binomial(len(r), 0.005)
        r = r.copy()
        for _ in range(nsub):
            p = int(rng.integers(0, len(r)))
            r[p] = (r[p] + int(rng.integers(1, 4))) % 4
        return r

    f1 = open(HERE / "reads_pe_1.fq", "w")
    f2 = open(HERE / "reads_pe_2.fq", "w")
    for n in range(N_PAIRS):
        frag_len = int(rng.integers(320, 700))
        st = int(rng.integers(0, GENOME_LEN - frag_len))
        frag = genome[st : st + frag_len]
        r1 = mutate(frag[:READ_LEN])          # forward
        r2 = mutate(revcomp(frag[-READ_LEN:]))  # FR orientation
        if rng.random() < 0.5:  # fragment on the minus strand
            r1, r2 = mutate(revcomp(frag[-READ_LEN:])), mutate(frag[:READ_LEN])
        q = "I" * READ_LEN
        f1.write(f"@p{n}/1\n{bases[r1].tobytes().decode()}\n+\n{q}\n")
        f2.write(f"@p{n}/2\n{bases[r2].tobytes().decode()}\n+\n{q}\n")
    f1.close()
    f2.close()

    if not REF_BIN.exists():
        print(f"reference binary missing at {REF_BIN}; build it first "
              "(see .claude/skills/verify/SKILL.md)", file=sys.stderr)
        return 1

    # NOTE: the reference's own two-FASTQ PE path is undefined behavior
    # (mm_map_frag reads qlen_sum bytes from seqs[0] — a heap overread — and
    # never writes regs[1], GDiet-ShortReads/map.c:598-744), so no byte
    # golden exists for paired mapping. The well-defined per-END goldens
    # below pin our PE path's alignment columns: R1 mapped as-is, R2 mapped
    # after the FR pe_ori revcomp (worker_for, map.c:1057-1062).
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    with open(HERE / "reads_pe_2rc.fq", "w") as f:
        lines = (HERE / "reads_pe_2.fq").read_bytes().splitlines()
        for i in range(0, len(lines), 4):
            f.write(lines[i].decode() + "\n")
            f.write(lines[i + 1].translate(comp)[::-1].decode() + "\n")
            f.write("+\n")
            f.write(lines[i + 3][::-1].decode() + "\n")
    for src, dst in [("reads_pe_1.fq", "golden_pe_r1.sam"),
                     ("reads_pe_2rc.fq", "golden_pe_r2rc.sam")]:
        out = subprocess.run(
            [str(REF_BIN), *ARGS, str(fa), str(HERE / src)],
            capture_output=True, timeout=600, check=True,
        )
        (HERE / dst).write_bytes(out.stdout)
        print(f"wrote {HERE}/{dst} ({len(out.stdout.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
