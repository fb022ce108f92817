"""Multi-part index (-I) + --split-prefix merge parity."""

from gdiet_tpu.cli import main


def test_split_merge_parity(data_dir, tmp_path):
    out = tmp_path / "out.sam"
    assert main([
        "-a", "-t", "1", "-x", "sr", "-Z", "10", "-W", "2", "-k", "21",
        "-w", "11", "-i", "2", "-N", "1", "-r", "0.05,150,200",
        "-n", "0.95,0.3", "-s", "100", "--AF_max_loc", "2",
        "-I", "40k", "--split-prefix", str(tmp_path / "sp"),
        "-o", str(out),
        str(data_dir / "ref2.fa"), str(data_dir / "reads2.fq"),
    ]) == 0
    golden = [l for l in (data_dir / "golden_split.sam").read_text().splitlines()
              if not l.startswith("@")]
    produced = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert produced == golden
