"""CLI plumbing: argument parsing, index dump/load, SAM output parity."""

import pathlib

from gdiet_tpu.cli import main


def test_cli_lr_subset_and_index_roundtrip(data_dir, tmp_path):
    # subset of the LR fixture (first 8 reads) to keep runtime small
    reads = (data_dir / "reads_lr.fq").read_text().splitlines()
    sub = tmp_path / "reads_sub.fq"
    sub.write_text("\n".join(reads[: 8 * 4]) + "\n")
    keep = {f"lr{i}" for i in range(8)}
    golden = [
        l for l in (data_dir / "golden_lr_hifi.sam").read_text().splitlines()
        if not l.startswith("@") and l.split("\t")[0] in keep
    ]

    idx = tmp_path / "idx.gdi.npz"
    args_common = [
        "-x", "map-hifi", "-Z", "10", "-W", "2", "-k", "19", "-w", "19",
        "-i", "0.2", "-r", "200", "--vt_dis=650", "--vt_nb_loc=5",
        "--vt_df1=0.0106", "--vt_df2=0.2", "-s", "100", "--vt_cov", "0.04",
        "--vt_f=0.04",
    ]
    # build + dump the index
    assert main([*args_common, "-d", str(idx), str(data_dir / "ref_lr.fa")]) == 0
    assert idx.exists()

    # map from the prebuilt index
    out = tmp_path / "out.sam"
    assert main([
        "-a", *args_common, "-o", str(out), str(idx), str(sub)
    ]) == 0
    produced = [
        l for l in out.read_text().splitlines() if not l.startswith("@")
    ]
    assert produced == golden


def test_cli_help_and_version(capsys):
    assert main(["--version"]) == 0
    assert capsys.readouterr().out.strip()
    assert main(["-h"]) == 0


def test_long_cigar_in_tag():
    """-L moves >65535-op CIGARs to CG:B:I (format.c:414,476-491,595)."""
    from gdiet_tpu.config import CIGAR_INS, CIGAR_MATCH, MM_F_LONG_CIGAR
    from gdiet_tpu.io import sam as samio
    from gdiet_tpu.oracle.align import Reg

    cig = []
    for _ in range(35000):
        cig.append((1, CIGAR_MATCH))
        cig.append((1, CIGAR_INS))
    r = Reg(id=0, parent=0, rid=0, rs=10, re=10 + 35000, qs=2, qe=70002,
            score=5, mapq=60)
    r.cigar = cig
    r.blen, r.mlen, r.n_ambi, r.sam_pri = 70000, 60000, 0, 1
    qlen = 70010
    seq = "A" * qlen
    rec = samio.sam_record("q1", seq, None, r, [r], ["chr1"],
                           MM_F_LONG_CIGAR, 0)
    fields = rec.split("\t")
    assert fields[5] == f"{qlen}S{35000}N"
    assert "CG:B:I" in rec
    vals = rec.split("CG:B:I", 1)[1].split("\t")[0].strip(",").split(",")
    assert len(vals) == 70000 + 2  # ops + soft clips
    assert int(vals[0]) == (2 << 4) | 4  # 2S leading clip
    assert int(vals[-1]) == ((qlen - 70002) << 4) | 4
    # without -L the plain CIGAR is emitted
    rec2 = samio.sam_record("q1", seq, None, r, [r], ["chr1"], 0, 0)
    assert "CG:B:I" not in rec2


def test_copy_comment():
    """-y appends the FASTA/Q header comment (format.c:357,599)."""
    from gdiet_tpu.config import MM_F_COPY_COMMENT
    from gdiet_tpu.io import sam as samio

    rec = samio.sam_record("q1", "ACGT", None, None, [], ["chr1"],
                           MM_F_COPY_COMMENT, 0, comment="BC:Z:ACGT")
    assert rec.endswith("\tBC:Z:ACGT")
    rec = samio.sam_record("q1", "ACGT", None, None, [], ["chr1"], 0, 0,
                           comment="BC:Z:ACGT")
    assert not rec.endswith("BC:Z:ACGT")
    paf = samio.paf_record("q1", 4, None, ["chr1"], [100], 0, False,
                           MM_F_COPY_COMMENT, "BC:Z:ACGT")
    assert paf.endswith("\tBC:Z:ACGT")


def test_cli_mesh_sam_parity(data_dir, tmp_path):
    """gdiet --mesh 2x2 (cli.py) produces byte-identical SAM to the
    single-device run on the virtual 8-CPU mesh (the multi-chip CLI
    entry, the split-index merge analog map.c:1094-1163)."""
    args = [
        "-a", "-t", "1", "-x", "sr", "-Z", "10", "-W", "2", "-k", "21",
        "-w", "11", "-i", "2", "-N", "1", "-r", "0.05,150,200",
        "-n", "0.95,0.3", "-s", "100", "--AF_max_loc", "2",
        str(data_dir / "ref.fa"), str(data_dir / "reads.fq"),
    ]
    single = tmp_path / "single.sam"
    meshed = tmp_path / "mesh.sam"
    assert main(["-o", str(single), *args]) == 0
    assert main(["--mesh", "2x2", "-o", str(meshed), *args]) == 0
    strip = lambda p: [l for l in p.read_text().splitlines()
                       if not l.startswith("@")]
    assert strip(meshed) == strip(single)
    assert len(strip(single)) > 0
