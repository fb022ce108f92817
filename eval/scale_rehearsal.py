#!/usr/bin/env python
"""GRCh38-scale rehearsal: build + map against a large repeat-rich genome.

Synthesizes a 120 Mbp genome with human-like repeat structure (LINE-like
dispersed repeats at 5-15% divergence, alpha-satellite-like tandem arrays,
segmental duplications, N gaps), then measures what SCALE.md records:

  - index build wall time + per-array bytes (the mm_idx_gen analog at scale,
    index.c:306-412)
  - device (HBM) residency of the mapping-time arrays
  - single-chip mapping throughput on 20k reads drawn uniformly AND 20k
    drawn only from repeat regions (where occurrence caps/fallbacks fire)
  - measured fallback counts for both read sets
  - SAM parity vs the reference binary on the same genome/reads

Run: python eval/scale_rehearsal.py [--genome-mb 120] [--out SCALE.md]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
WORK = pathlib.Path("/tmp/gdiet_scale")
REF_BIN = pathlib.Path("/tmp/gdiet_ref/SR/GDiet")

REF_ARGS = [
    "-a", "-t", "1", "-x", "sr", "-Z", "10", "-W", "2", "-k", "21", "-w", "11",
    "-i", "2", "-N", "1", "-r", "0.05,150,200", "-n", "0.95,0.3", "-s", "100",
    "--AF_max_loc", "2",
]


def log(m):
    print(f"[scale] {m}", file=sys.stderr, flush=True)


def synth_genome(n_bases: int, seed: int = 11):
    """Repeat-rich synthetic genome. Returns (codes, repeat_mask)."""
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, n_bases, dtype=np.int8)
    is_rep = np.zeros(n_bases, bool)

    # LINE-like element: 6 kb consensus, ~1200 dispersed copies/100Mbp at
    # 5-15% divergence, many 5'-truncated (like L1)
    line = rng.integers(0, 4, 6000, dtype=np.int8)
    n_lines = int(n_bases / 1e8 * 1200)
    for _ in range(n_lines):
        div = rng.uniform(0.05, 0.15)
        ln = int(rng.integers(500, 6000))
        copy = line[-ln:].copy()
        nmut = rng.binomial(ln, div)
        idx = rng.integers(0, ln, nmut)
        copy[idx] = (copy[idx] + rng.integers(1, 4, nmut)) % 4
        st = int(rng.integers(0, n_bases - ln))
        g[st : st + ln] = copy
        is_rep[st : st + ln] = True

    # SINE-like: 300 bp, denser, 10-20% divergence
    sine = rng.integers(0, 4, 300, dtype=np.int8)
    for _ in range(n_lines * 4):
        div = rng.uniform(0.1, 0.2)
        copy = sine.copy()
        nmut = rng.binomial(300, div)
        idx = rng.integers(0, 300, nmut)
        copy[idx] = (copy[idx] + rng.integers(1, 4, nmut)) % 4
        st = int(rng.integers(0, n_bases - 300))
        g[st : st + 300] = copy
        is_rep[st : st + 300] = True

    # alpha-satellite-like tandem arrays: 171 bp monomer, ~50 kb arrays
    mono = rng.integers(0, 4, 171, dtype=np.int8)
    n_arrays = max(2, n_bases // 40_000_000)
    for _ in range(n_arrays):
        arr_len = int(rng.integers(30_000, 60_000))
        reps = arr_len // 171 + 1
        arr = np.tile(mono, reps)[:arr_len].copy()
        nmut = rng.binomial(arr_len, 0.02)
        idx = rng.integers(0, arr_len, nmut)
        arr[idx] = (arr[idx] + rng.integers(1, 4, nmut)) % 4
        st = int(rng.integers(0, n_bases - arr_len))
        g[st : st + arr_len] = arr
        is_rep[st : st + arr_len] = True

    # segmental duplications: copy 100 kb blocks at ~2% divergence
    for _ in range(n_bases // 60_000_000 + 1):
        ln = 100_000
        src = int(rng.integers(0, n_bases - ln))
        dst = int(rng.integers(0, n_bases - ln))
        blk = g[src : src + ln].copy()
        nmut = rng.binomial(ln, 0.02)
        idx = rng.integers(0, ln, nmut)
        blk[idx] = (blk[idx] + rng.integers(1, 4, nmut)) % 4
        g[dst : dst + ln] = blk
        is_rep[dst : dst + ln] = True
        is_rep[src : src + ln] = True

    # N gaps (centromere/telomere-like)
    for _ in range(n_bases // 30_000_000 + 1):
        ln = int(rng.integers(5_000, 50_000))
        st = int(rng.integers(0, n_bases - ln))
        g[st : st + ln] = 4
    return g.astype(np.uint8), is_rep


def write_fasta(codes, path, chrom_mb=60):
    bases = np.frombuffer(b"ACGTN", np.uint8)
    chrom_len = chrom_mb * 1_000_000
    with open(path, "w") as f:
        for ci, st in enumerate(range(0, len(codes), chrom_len)):
            chunk = bases[codes[st : st + chrom_len]].tobytes().decode()
            f.write(f">chr{ci + 1}\n")
            for i in range(0, len(chunk), 80):
                f.write(chunk[i : i + 80] + "\n")


def make_reads(codes, is_rep, n, path, seed, repeats_only=False, rlen=150):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    picked = 0
    with open(path, "w") as f:
        while picked < n:
            st = int(rng.integers(0, len(codes) - rlen))
            r = codes[st : st + rlen]
            if (r > 3).any():
                continue
            if repeats_only and not is_rep[st : st + rlen].any():
                continue
            r = r.copy()
            nsub = rng.binomial(rlen, 0.005)
            for _ in range(nsub):
                p = int(rng.integers(0, rlen))
                r[p] = (r[p] + int(rng.integers(1, 4))) % 4
            if rng.random() < 0.5:
                r = 3 - r[::-1]
            tag = "rep" if repeats_only else "uni"
            f.write(f"@{tag}{picked}\n{bases[r].tobytes().decode()}\n+\n"
                    f"{'I' * rlen}\n")
            picked += 1


def map_ours(mi, reads_path, out_path, stats):
    import jax

    from gdiet_tpu.config import options_for
    from gdiet_tpu.io import sam as samio
    from gdiet_tpu.io.fastx import read_fastx
    from gdiet_tpu.pipeline import ShortReadMapper

    _, mo = options_for(
        "sr", pattern="10", max_seeds=2.0, best_n=1, bw_frac=0.05,
        bw_min=150, bw_max=200, min_cnt=0.95, rec_threshold_frac=0.3,
        min_dp_max=100, AF_max_loc=2,
    )
    reads = list(read_fastx(str(reads_path)))
    B = 8192
    mapper = ShortReadMapper(mi, mo, max_read_len=160, seed_budget=32,
                             shift_seed_budget=16, hit_budget=256,
                             dp_frac=0.375)
    batches = []
    tails = []
    for s in range(0, len(reads), B):
        b = reads[s : s + B]
        tails.append(len(b))
        if len(b) < B:
            b = b + [b[0]] * (B - len(b))
        batches.append(b)
    # warmup
    for _ in mapper.map_stream_sam(iter(batches[:1])):
        pass
    t0 = time.perf_counter()
    blobs = list(mapper.map_stream_sam(iter(batches)))
    dt = time.perf_counter() - t0
    stats["reads_per_sec"] = round(len(reads) / dt, 1)
    stats["fallback_reads"] = mapper.stats["fallback_reads"]
    stats["n_reads"] = len(reads)
    # write (cut padded tails by read-name change, names unique)
    with open(out_path, "wb") as f:
        f.write(samio.sam_header(
            mi.names, [int(x) for x in mi.lengths]).encode())
        for blob, n_real, batch in zip(blobs, tails, batches):
            if n_real == len(batch):
                f.write(blob)
                continue
            kept, seen, last = [], 0, None
            for ln in blob.split(b"\n"):
                if not ln:
                    continue
                nm = ln.split(b"\t", 1)[0]
                if nm != last:
                    seen += 1
                    last = nm
                if seen > n_real:
                    break
                kept.append(ln)
            f.write(b"\n".join(kept) + b"\n")
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=int, default=120)
    ap.add_argument("--out", default=str(REPO / "SCALE.md"))
    ap.add_argument("--skip-ref", action="store_true")
    args = ap.parse_args()

    global WORK
    if args.genome_mb != 120:  # keep per-size caches separate
        WORK = pathlib.Path(f"/tmp/gdiet_scale{args.genome_mb}")
    WORK.mkdir(parents=True, exist_ok=True)
    # claim the device tunnel FIRST (its plugin handshake is flaky; failing
    # here makes outer retries cheap)
    sys.path.insert(0, str(REPO))
    import gdiet_tpu  # noqa: F401
    from gdiet_tpu import native as _native

    _native.reexec_with_shmalloc()
    import jax

    log(f"devices: {jax.devices()}")
    n_bases = args.genome_mb * 1_000_000
    fa = WORK / "genome.fa"
    uni_fq = WORK / "reads_uniform.fq"
    rep_fq = WORK / "reads_repeat.fq"
    meta_path = WORK / "synth_meta.json"
    if fa.exists() and uni_fq.exists() and rep_fq.exists() \
            and meta_path.exists():
        # inputs cached: skip the multi-minute 3 Gbp re-synthesis
        repeat_frac = json.loads(meta_path.read_text())["repeat_frac"]
        log(f"cached genome + reads in {WORK} (repeat frac {repeat_frac:.3f})")
    else:
        t0 = time.perf_counter()
        codes, is_rep = synth_genome(n_bases)
        repeat_frac = float(is_rep.mean())
        log(f"synth genome {args.genome_mb} Mbp, repeat frac "
            f"{repeat_frac:.3f} in {time.perf_counter() - t0:.0f}s")
        if not fa.exists():
            write_fasta(codes, fa)
        if not uni_fq.exists():
            make_reads(codes, is_rep, 20000, uni_fq, 100)
            make_reads(codes, is_rep, 20000, rep_fq, 101, repeats_only=True)
        meta_path.write_text(json.dumps({"repeat_frac": repeat_frac}))

    from gdiet_tpu.config import options_for
    from gdiet_tpu.index.build import DietIndex, build_index
    from gdiet_tpu.io.fastx import read_fastx

    io_, _ = options_for("sr", pattern="10")
    io_.k, io_.w = 21, 11
    results = {"genome_mb": args.genome_mb,
               "repeat_frac": round(repeat_frac, 4),
               "platform": jax.devices()[0].platform}

    idx_path = WORK / "genome.gdi.npz"
    if idx_path.exists():
        mi = DietIndex.load(str(idx_path))
        results["index_build_sec"] = None
    else:
        # warm the per-shape sketch compile (run_evals does the same): the
        # recorded metric is steady-state build, not first-ever XLA compile
        _warm = np.random.default_rng(0).integers(0, 4, 2_000_000)
        build_index([("warm", _warm.astype(np.uint8))], io_)
        t0 = time.perf_counter()
        # stream the FASTA into the build (one sequence's string alive at
        # a time): holding all 3 GB of strings through the build measurably
        # inflates wall time on this demand-paged VM
        mi = build_index(
            ((r.name, r.seq) for r in read_fastx(str(fa))), io_)
        results["index_build_sec"] = round(time.perf_counter() - t0, 1)
        try:
            mi.save(str(idx_path))
        except Exception as ex:  # keep the in-memory build if disk/zip fails
            log(f"index save failed ({ex}) — continuing with in-memory index")
    results["index_arrays_mb"] = {
        "keys": round(mi.keys.nbytes / 1e6, 1),
        "positions": round(mi.positions.nbytes / 1e6, 1),
        "starts": round(mi.starts.nbytes / 1e6, 1),
        "ref_codes": round(mi.codes.nbytes / 1e6, 1),
    }
    results["n_keys"] = int(len(mi.keys))
    results["n_positions"] = int(len(mi.positions))
    # device (HBM) residency of the mapping-time arrays: 2-bit packed seq
    # (+1-bit N mask), cuckoo probe table (2 sides x NB x 4 slots x 16 B),
    # positions
    from gdiet_tpu.index.cuckoo import SLOTS
    n_codes = int(mi.lengths.sum())
    nbk = max(1, int(np.ceil(len(mi.keys) / (2 * SLOTS * 0.85))))
    results["hbm_mb"] = {
        "seq_2bit": round(n_codes / 4 / 1e6, 1),
        "n_mask": round((n_codes / 8 / 1e6) if (mi.codes > 3).any() else 0, 1),
        "cuckoo": round(2 * nbk * SLOTS * 16 / 1e6, 1),
        "positions": round(mi.positions.nbytes / 1e6, 1),
    }
    occ = np.diff(mi.starts)
    results["occ_p50_p99_max"] = [int(np.percentile(occ, 50)),
                                  int(np.percentile(occ, 99)), int(occ.max())]

    results["uniform"] = map_ours(mi, uni_fq, WORK / "ours_uni.sam", {})
    log(f"uniform: {results['uniform']}")
    results["repeat"] = map_ours(mi, rep_fq, WORK / "ours_rep.sam", {})
    log(f"repeat: {results['repeat']}")

    if not args.skip_ref and REF_BIN.exists():
      try:  # reference side is best-effort: never lose our own results to it
        ridx = WORK / "genome.ref.mmi"
        if not ridx.exists():
            t0 = time.perf_counter()
            # 120 Mbp took 125 s single-thread -> 3 Gbp projects ~1 h; leave
            # headroom on this slow-fault box
            subprocess.run([str(REF_BIN), *REF_ARGS, "-d", str(ridx), str(fa)],
                           check=True, capture_output=True, timeout=9000)
            results["ref_index_build_sec"] = round(time.perf_counter() - t0, 1)
        for tag, fq in [("uniform", uni_fq), ("repeat", rep_fq)]:
            t0 = time.perf_counter()
            proc = subprocess.run(
                [str(REF_BIN), *REF_ARGS, "-o", str(WORK / f"ref_{tag}.sam"),
                 str(ridx), str(fq)],
                check=True, capture_output=True, timeout=3600)
            results[tag]["ref_reads_per_sec"] = round(
                20000 / (time.perf_counter() - t0), 1)
            # load-EXCLUDED wall from the binary's own [M::fn::wall*cpu]
            # stamps (main.c:663-669): first stamp = index loaded, last =
            # final batch mapped. At 3 Gbp the reference re-reads a multi-GB
            # .mmi per invocation while our side keeps the index resident,
            # so the honest mapping-speed ratio uses this number
            import re as _re
            stamps = _re.findall(rb"\[M::[^\]]*?::([0-9.]+)\*", proc.stderr)
            if len(stamps) >= 2:
                map_wall = float(stamps[-1]) - float(stamps[0])
                if map_wall > 0:
                    results[tag]["ref_reads_per_sec_map_only"] = round(
                        20000 / map_wall, 1)
            ref_lines = [l for l in
                         (WORK / f"ref_{tag}.sam").read_text().splitlines()
                         if not l.startswith("@")]
            our = WORK / ("ours_uni.sam" if tag == "uniform" else
                          "ours_rep.sam")
            our_lines = [l for l in our.read_text().splitlines()
                         if not l.startswith("@")]
            same = sum(a == b for a, b in zip(ref_lines, our_lines))
            results[tag]["sam_parity"] = round(
                same / max(len(ref_lines), 1), 4)
            results[tag]["n_records"] = [len(our_lines), len(ref_lines)]
      except Exception as ex:
        log(f"reference side failed: {ex}")

    print(json.dumps(results, indent=1))
    write_scale_md(results, args.out)


def write_scale_md(r, out):
    u, rep = r.get("uniform", {}), r.get("repeat", {})
    amb = r["index_arrays_mb"]
    lines = [
        "# SCALE — large-genome rehearsal (GRCh38-scale dry run)",
        "",
        f"Synthetic {r['genome_mb']} Mbp genome with human-like repeat "
        f"structure ({100 * r['repeat_frac']:.1f}% repeat bases: LINE/SINE-"
        "like dispersed repeats at 5-20% divergence, alpha-satellite tandem "
        "arrays, 2%-diverged segmental duplications, N gaps), generated by "
        "eval/scale_rehearsal.py. Mapping config = the published sr bench "
        "preset (README.md:41).",
        "",
        "| metric | value |",
        "|---|---|",
        f"| index build (device sketch + host CSR) | "
        f"{r.get('index_build_sec')} s |",
        f"| reference index build | {r.get('ref_index_build_sec', 'n/a')} s |",
        f"| index keys / positions | {r['n_keys']:,} / "
        f"{r['n_positions']:,} |",
        f"| index bytes: keys / positions / starts / ref codes | "
        f"{amb['keys']} / {amb['positions']} / {amb['starts']} / "
        f"{amb['ref_codes']} MB |",
        f"| HBM residency: 2-bit seq / N mask / cuckoo / positions | "
        f"{r.get('hbm_mb', {}).get('seq_2bit', 'n/a')} / "
        f"{r.get('hbm_mb', {}).get('n_mask', 'n/a')} / "
        f"{r.get('hbm_mb', {}).get('cuckoo', 'n/a')} / "
        f"{r.get('hbm_mb', {}).get('positions', 'n/a')} MB |",
        f"| occurrence p50 / p99 / max | {r['occ_p50_p99_max'][0]} / "
        f"{r['occ_p50_p99_max'][1]} / {r['occ_p50_p99_max'][2]} |",
        f"| uniform reads: ours / reference (reads/s) | "
        f"{u.get('reads_per_sec')} / {u.get('ref_reads_per_sec', 'n/a')} |",
        f"| uniform reads: reference load-EXCLUDED (reads/s, from its "
        f"[M::] stamps) | {u.get('ref_reads_per_sec_map_only', 'n/a')} |",
        f"| uniform reads: fallbacks | {u.get('fallback_reads')} / "
        f"{u.get('n_reads')} |",
        f"| uniform reads: SAM parity | {u.get('sam_parity', 'n/a')} |",
        f"| repeat-region reads: ours / reference (reads/s) | "
        f"{rep.get('reads_per_sec')} / "
        f"{rep.get('ref_reads_per_sec', 'n/a')} |",
        f"| repeat reads: reference load-EXCLUDED (reads/s, from its "
        f"[M::] stamps) | {rep.get('ref_reads_per_sec_map_only', 'n/a')} |",
        f"| repeat-region reads: fallbacks | {rep.get('fallback_reads')} / "
        f"{rep.get('n_reads')} |",
        f"| repeat-region reads: SAM parity | "
        f"{rep.get('sam_parity', 'n/a')} |",
        "",
        "## GRCh38 (3 Gbp) notes",
        "",
        "The mapping-time device arrays are the HBM-residency row above: "
        "the sequence is 2-bit packed on device (pack_ref_codes — denser "
        "than the reference's 4-bit index.c:350-357 pack) and the lookup is "
        "a bucketed cuckoo table at ~1.2x key+val bytes (index/cuckoo.py), "
        "shipped as [rows, 128] u64 tiles — a [buckets, 8] layout would "
        "lane-pad 16x and overflow HBM at this scale (the fix behind the "
        "measured run above). Reference mapping runs load their index from "
        "disk per invocation (same command a user runs); ours keep the "
        "index resident, which is the framework's serving model. The build "
        "STREAMS sequences into the device sketch (one ASCII string alive "
        "at a time — holding the whole genome's strings measurably "
        "inflated wall on this demand-paged VM: 775-1339 s vs ~440 s for "
        "the same pipeline, r05 A/B) and is warm-compile timed like every "
        "other measurement here; its per-phase decomposition at 3 Gbp is "
        "device sketch ~134 s (D2H fetch-bound), native LSD radix sort "
        "~95 s, FASTA parse ~27 s, encode ~23 s, concat ~34 s, CSR ~2 s "
        "(eval/profile_build.py). Build remains a once-per-genome cost and "
        "is not the benched claim.",
        "",
        "## Host memory model (this benchmark VM)",
        "",
        "This box demand-pages PRIVATE anonymous memory from the hypervisor "
        "at ~5 MB/s on first touch, and free-page reporting returns freed "
        "frames to the host immediately, so the cost recurs per fresh "
        "allocation; SHARED anonymous (shmem) pages are served at RAM "
        "speed. Large-build runs therefore use the "
        "gdiet_tpu/native/shmalloc.c LD_PRELOAD interposer (>=4 MiB "
        "allocations -> MAP_SHARED), which turns an 800 MB numpy "
        "first-touch from 173 s into 0.8 s. The host CSR build itself is a "
        "native LSD radix sort + sorted-diff unique (np.lexsort+np.unique "
        "were ~96 s of the former ~110 s 120 Mbp build). Both our build and "
        "the reference binary run on the same box and pay the same fault "
        "costs where not mitigated.",
        "",
        f"Raw JSON: `{json.dumps(r)}`",
    ]
    pathlib.Path(out).write_text("\n".join(lines) + "\n")
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
