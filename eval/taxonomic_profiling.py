"""Taxonomic profiling: map reads against a multi-genome database and
report per-taxon read counts and relative abundance.

Analog of ReproducibleEvaluation/TaxonomicProfiling/TaxonomicProfiling.sh,
where GDiet replaces minimap2 inside Metalign (k21 w11 / k28 w40 sweeps over
diet patterns). Here the database is a multi-FASTA whose sequence names are
taken as taxa (use one sequence per genome, or `name|taxid` naming);
abundance = primary-mapped reads per taxon / total mapped.

Usage:
  python eval/taxonomic_profiling.py db.fa reads.fq [pattern] [k] [w]
"""

import json
import sys
from collections import Counter

sys.path.insert(0, ".")

from gdiet_tpu.config import options_for  # noqa: E402
from gdiet_tpu.index.build import build_index  # noqa: E402
from gdiet_tpu.io.fastx import read_batches, read_fastx  # noqa: E402
from gdiet_tpu.pipeline.shortread import ShortReadMapper  # noqa: E402


def main(db: str, reads: str, pattern: str = "10", k: int = 21, w: int = 11):
    io_, mo = options_for(
        "sr", pattern=pattern, k=k, w=w, max_seeds=2.0, best_n=1,
        bw_frac=0.05, bw_min=150, bw_max=200, min_cnt=0.95,
        rec_threshold_frac=0.3, min_dp_max=100, AF_max_loc=2,
    )
    refs = [(r.name, r.seq) for r in read_fastx(db)]
    mi = build_index(refs, io_)
    mapper = ShortReadMapper(mi, mo)
    counts: Counter = Counter()
    total = mapped = 0
    for batch in read_batches(reads, mo.mini_batch_size):
        for rec, regs in zip(batch, mapper.map_batch(batch)):
            total += 1
            pri = next((r for r in regs or [] if r.sam_pri), None)
            if pri is not None:
                mapped += 1
                counts[mi.names[pri.rid].split("|")[0]] += 1
    profile = [
        {"taxon": t, "reads": c, "abundance": round(c / max(mapped, 1), 4)}
        for t, c in counts.most_common()
    ]
    print(json.dumps({
        "total_reads": total, "mapped": mapped, "profile": profile,
    }, indent=1))


if __name__ == "__main__":
    main(*sys.argv[1:])
