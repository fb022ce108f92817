"""PE native fast path == generic Python PE path, byte-for-byte.

The paired-end hot path (runtime._run_sr_pe_sam_fast -> ShortReadMapper.
map_stream_sam_pe -> native pe_finish_batch: mm_pair pe.c:76-177 + the
n_seg=2 writer format.c:432-530) must emit exactly the records the generic
per-record path (run_mapping PE branch + samio.sam_record) emits.
test_pe_parity pins the generic semantics against reference goldens; this
test pins the native path against the generic one.
"""

import os
import pathlib

import pytest

from gdiet_tpu import native

DATA = pathlib.Path(__file__).parent / "data"

ARGS = ["-a", "-t", "1", "-x", "sr", "-Z", "10", "-W", "2", "-k", "21",
        "-w", "11", "-i", "2", "-N", "1", "-r", "0.05,150,200",
        "-n", "0.95,0.3", "-s", "100", "--AF_max_loc", "2"]


def _body(path):
    return [l for l in pathlib.Path(path).read_text().splitlines()
            if not l.startswith("@")]


@pytest.mark.skipif(native.lib is None, reason="needs the native library")
def test_pe_fast_matches_generic(tmp_path):
    from gdiet_tpu.cli import main as cli_main

    fast = tmp_path / "fast.sam"
    gen = tmp_path / "generic.sam"
    inputs = [str(DATA / "ref_pe.fa"), str(DATA / "reads_pe_1.fq"),
              str(DATA / "reads_pe_2.fq")]
    assert cli_main([*ARGS, "-o", str(fast), *inputs]) == 0
    os.environ["GDIET_NO_PE_FAST"] = "1"
    try:
        assert cli_main([*ARGS, "-o", str(gen), *inputs]) == 0
    finally:
        del os.environ["GDIET_NO_PE_FAST"]
    a, b = _body(fast), _body(gen)
    assert len(a) == len(b) and len(a) > 0
    assert a == b
