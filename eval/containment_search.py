"""Containment search: sparsified indexing + query-genome containment.

Analog of ReproducibleEvaluation/ContainmentSearch/{ContainmentIndexing,
ContainmentMapping}.sh: index target genomes with map-hifi k19 w16 under a
sweep of diet patterns (11, 10, 110, 100, 1110), report per-pattern index
size and build time, then chunk a query sequence set and map the chunks,
reporting the contained fraction. The reference's headline: 72.7-75.9x
faster and 723x more space-efficient search at sparser patterns
(README.md:69).

Usage:
  python eval/containment_search.py index  target.fa outdir [patterns...]
  python eval/containment_search.py search outdir/idx_10.gdi.npz query.fa \
      [chunk_len] [min_dp]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

from gdiet_tpu.config import options_for  # noqa: E402
from gdiet_tpu.index.build import DietIndex, build_index  # noqa: E402
from gdiet_tpu.io.fastx import SeqRecord, read_fastx  # noqa: E402

DEFAULT_PATTERNS = ["11", "10", "110", "100", "1110"]


def cmd_index(target: str, outdir: str, patterns: list[str],
              no_seq: bool = False):
    """Per-pattern index build sweep (ContainmentIndexing.sh:7-108). With
    ``no_seq`` the packed reference sequence is dropped (MM_I_NO_SEQ /
    --idx-no-seq, index.c:339-349) — the reference's 723x space story."""
    from gdiet_tpu.config import MM_I_NO_SEQ

    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    refs = [(r.name, r.seq) for r in read_fastx(target)]
    rows = []
    for pat in patterns:
        io_, _ = options_for("map-hifi", variant="lr", pattern=pat, k=19, w=16)
        if no_seq:
            io_.flag |= MM_I_NO_SEQ
        t0 = time.perf_counter()
        mi = build_index(refs, io_)
        dt = time.perf_counter() - t0
        path = out / f"idx_{pat}.gdi.npz"
        mi.save(str(path))
        size = path.stat().st_size
        rows.append({
            "pattern": pat, "build_s": round(dt, 2), "bytes": size,
            "distinct_minimizers": len(mi.keys), "positions": len(mi.positions),
        })
        print(json.dumps(rows[-1]))
    base = rows[0]["bytes"]
    for r in rows[1:]:
        print(f"# pattern {r['pattern']}: {base / r['bytes']:.2f}x smaller "
              f"than pattern 11")


def cmd_search(index_path: str, query: str, chunk_len: int = 2000,
               min_dp: int = 100):
    from gdiet_tpu.pipeline.longread import LongReadMapper

    mi = DietIndex.load(index_path)
    io_, mo = options_for(
        "map-hifi", variant="lr", pattern=mi.pattern, k=mi.k, w=mi.w,
        min_dp_max=min_dp,
    )
    mapper = LongReadMapper(mi, mo, max_read_len=max(chunk_len, 512))
    chunks = []
    for rec in read_fastx(query):
        for st in range(0, rec.l_seq, chunk_len):
            chunk = rec.seq[st : st + chunk_len]
            if len(chunk) >= mi.k:
                chunks.append(SeqRecord(f"{rec.name}_{st}", chunk))
    t0 = time.perf_counter()
    n_chunks = len(chunks)
    n_hit = 0
    B = 64
    for s in range(0, n_chunks, B):
        for regs in mapper.map_batch(chunks[s : s + B]):
            if regs:
                n_hit += 1
    dt = time.perf_counter() - t0
    print(json.dumps({
        "index": index_path, "chunks": n_chunks, "contained": n_hit,
        "containment": round(n_hit / max(n_chunks, 1), 4),
        "seconds": round(dt, 2),
    }))


if __name__ == "__main__":
    if sys.argv[1] == "index":
        args = [a for a in sys.argv[4:] if a != "--no-seq"]
        cmd_index(sys.argv[2], sys.argv[3], args or DEFAULT_PATTERNS,
                  no_seq="--no-seq" in sys.argv)
    elif sys.argv[1] == "search":
        cmd_search(sys.argv[2], sys.argv[3],
                   int(sys.argv[4]) if len(sys.argv) > 4 else 2000,
                   int(sys.argv[5]) if len(sys.argv) > 5 else 100)
    else:
        print(__doc__)
        sys.exit(1)
