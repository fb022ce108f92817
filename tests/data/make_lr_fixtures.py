"""Generate long-read golden fixtures with the *reference* LongReads binary.

Run from the repo root with the reference built at /tmp/gdiet_ref/LR/GDiet
(compiled from /root/reference/GDiet-LongReads). Produces ref_lr.fa,
reads_lr.fq and golden_lr_{hifi,ont}.sam in this directory.

Read mix: clean forward/reverse reads, reads with substitutions and small
indels (HiFi-like), chimeric reads made of two distant segments of the same
chromosome+strand (exercising second-round voting and CIGAR concatenation),
and unmappable random reads.
"""

import pathlib
import subprocess

import numpy as np

HERE = pathlib.Path(__file__).parent
REF_BIN = "/tmp/gdiet_ref/LR/GDiet"
BASES = "ACGT"

HIFI_ARGS = [
    "-a", "-t", "1", "-x", "map-hifi", "-Z", "10", "-W", "2", "-k", "19",
    "-w", "19", "-i", "0.2", "-r", "200", "--vt_dis=650", "--vt_nb_loc=5",
    "--vt_df1=0.0106", "--vt_df2=0.2", "-s", "100", "--vt_cov", "0.04",
    "--vt_f=0.04",
]
ONT_ARGS = [
    "-a", "-t", "1", "-x", "map-ont", "-Z", "10", "-W", "2", "-k", "15",
    "-w", "10", "-r", "300", "--vt_dis=1000", "--vt_nb_loc=3",
    "--vt_df1=0.007", "--vt_df2=0.007", "-s", "100", "--vt_cov", "0.1",
]


def mutate(rng, frag: np.ndarray, sub=0.01, ind=0.002) -> np.ndarray:
    out = []
    for c in frag:
        r = rng.random()
        if r < ind / 2:
            continue  # deletion
        if r < ind:
            out.append(rng.integers(0, 4))  # insertion
        if rng.random() < sub:
            out.append((c + rng.integers(1, 4)) % 4)
        else:
            out.append(c)
    return np.array(out, dtype=np.int64)


def main():
    rng = np.random.default_rng(42)
    chroms = {
        "chrA": rng.integers(0, 4, 120_000),
        "chrB": rng.integers(0, 4, 60_000),
    }
    with open(HERE / "ref_lr.fa", "w") as f:
        for name, g in chroms.items():
            f.write(f">{name}\n")
            s = "".join(BASES[i] for i in g)
            for i in range(0, len(s), 80):
                f.write(s[i : i + 80] + "\n")

    reads = []
    names = list(chroms)
    for n in range(60):
        cname = names[int(rng.integers(0, 2))]
        g = chroms[cname]
        kind = n % 6
        L = int(rng.integers(400, 1800))
        st = int(rng.integers(0, len(g) - L))
        frag = g[st : st + L].copy()
        if kind == 0:
            read = frag  # clean
        elif kind == 1:
            read = mutate(rng, frag, sub=0.01, ind=0.002)
        elif kind == 2:  # reverse strand with errors
            read = mutate(rng, (3 - frag)[::-1], sub=0.01, ind=0.002)
        elif kind == 3:  # big deletion in the middle (SV)
            mid = L // 2
            dele = int(rng.integers(60, 400))
            st2 = st + mid + dele
            frag2 = g[st2 : st2 + (L - mid)]
            read = mutate(rng, np.concatenate([frag[:mid], frag2]), 0.005, 0.001)
        elif kind == 4:  # chimera: two distant segments, same chrom+strand
            st2 = int(rng.integers(0, len(g) - L))
            frag2 = g[st2 : st2 + L // 2]
            read = mutate(rng, np.concatenate([frag[: L // 2], frag2]), 0.005, 0.001)
        else:
            read = rng.integers(0, 4, L)  # unmappable
        reads.append("".join(BASES[i] for i in read))
    for n in range(4):  # a few longer HiFi-scale reads
        g = chroms["chrA"]
        L = int(rng.integers(2500, 3500))
        st = int(rng.integers(0, len(g) - L))
        reads.append(
            "".join(BASES[i] for i in mutate(rng, g[st : st + L], 0.008, 0.002))
        )

    with open(HERE / "reads_lr.fq", "w") as f:
        for n, r in enumerate(reads):
            f.write(f"@lr{n}\n{r}\n+\n{'I' * len(r)}\n")

    for tag, args in (("hifi", HIFI_ARGS), ("ont", ONT_ARGS)):
        out = HERE / f"golden_lr_{tag}.sam"
        with open(out, "w") as f:
            subprocess.run(
                [REF_BIN, *args, str(HERE / "ref_lr.fa"), str(HERE / "reads_lr.fq")],
                stdout=f, check=True,
            )
        print("wrote", out)


if __name__ == "__main__":
    main()
