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
