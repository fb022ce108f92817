"""Batched short-read mapping pipeline (device stages + host finish).

TPU-native re-design of GDiet-ShortReads mm_map_frag (map.c:586-1010).
Reads are processed as fixed-shape batches:

  1. shift inference  — per-shift device sketches + batched index lookups,
                        argmax of hit counts (sketch2/mm_get_shift).
  2. query sketch     — device sketch at the chosen shift with the frag-mode
                        seed cap (sketch3 semantics, incl. extracted_len).
  3. seed matching    — batched CSR lookups; occurrence filter (the streak
                        selection of mm_seed_select reduces to n <= mid_occ
                        for reads shorter than 0.501*occ_dist, which is the
                        short-read regime; longer reads take the exact host
                        path).
  4. hit expansion    — ragged seed-occurrence lists flattened into a [B, A]
                        hit budget via prefix sums + batched searchsorted,
                        diagonal projection per strand, device sort.
  5. voting           — a single lax.scan over the concatenated fwd/rev hit
                        stream maintaining the top-K candidate list and the
                        sub-threshold recovery candidate (vote, map.c:447).
  6. alignment        — window geometry (map.c:764-840), exact-match filter,
                        batched banded dual-affine DP (ops/dp.py).
  7. host finish      — backtrack, CIGAR fix-ups, filters, score sort,
                        mm_set_sam_params (all oracle-exact).

Reads that leave the fixed-shape envelope (len > 300, occurrence-streak
selection possible, hit-budget overflow, active query-occurrence filter)
fall back to the scalar oracle, preserving exactness everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gdiet_tpu import pattern as pat
from gdiet_tpu.config import MM_F_FRAG_MODE, MM_F_NO_PRINT_2ND, MapOptions
from gdiet_tpu.index.build import DietIndex
from gdiet_tpu.io.fastx import SeqRecord
from gdiet_tpu.oracle import align as oal
from gdiet_tpu.oracle import sketch as osk
from gdiet_tpu.oracle.pipeline import map_read, set_sam_params
from gdiet_tpu.ops import dp as dpk
from gdiet_tpu.ops.sketch import sketch_emit

U64_MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)
U32 = 0xFFFFFFFF


@partial(jax.jit, static_argnames=("K", "A"))
def _vote_scan(
    keys: jnp.ndarray,  # [B, M] u64 projected targets (stream order)
    qpos: jnp.ndarray,  # [B, M] i32
    valid: jnp.ndarray,  # [B, M] bool
    strand: jnp.ndarray,  # [M] i32 (0 fwd pass, 1 rev pass)
    vt_distance: jnp.ndarray,  # [B] u64
    vt_threshold: jnp.ndarray,  # [B] i32
    vt_rec_threshold: jnp.ndarray,  # [B] i32
    K: int,
    A: int,
):
    """vote (map.c:447-584) over the concatenated fwd/rev hit stream.

    Returns top-K candidate fields (sorted by score as maintained by the
    reference's insertion) plus the recovery candidate.
    """
    B, M = keys.shape
    i32 = jnp.int32

    state = {
        "head_t": jnp.zeros((B,), jnp.uint64),
        "head_valid": jnp.zeros((B,), bool),
        "head_str": jnp.zeros((B,), i32),
        "fq": jnp.zeros((B,), i32),
        "lq": jnp.zeros((B,), i32),
        "cnt": jnp.zeros((B,), i32),
        "k_score": jnp.full((B, K), -1, i32),
        "k_target": jnp.zeros((B, K), jnp.uint64),
        "k_fq": jnp.zeros((B, K), i32),
        "k_lq": jnp.zeros((B, K), i32),
        "k_str": jnp.zeros((B, K), i32),
        "out_len": jnp.zeros((B,), i32),
        "r_score": jnp.zeros((B,), i32),
        "r_target": jnp.zeros((B,), jnp.uint64),
        "r_fq": jnp.zeros((B,), i32),
        "r_lq": jnp.zeros((B,), i32),
        "r_str": jnp.zeros((B,), i32),
    }

    def emit(st, do_emit):
        """Process a finished run (head fields) where do_emit."""
        cnt, fq, lq = st["cnt"], st["fq"], st["lq"]
        target, hstr = st["head_t"], st["head_str"]
        passes = do_emit & (cnt > vt_threshold)
        full = st["out_len"] == K
        reject = passes & full & (st["k_score"][:, K - 1] >= cnt)
        insert = passes & ~reject
        # position of insertion: out_len (or K-1 when full)
        pos = jnp.where(full, K - 1, st["out_len"])
        slot = jnp.arange(K, dtype=i32)[None, :] == pos[:, None]
        upd = insert[:, None] & slot
        ks = jnp.where(upd, cnt[:, None], st["k_score"])
        kt = jnp.where(upd, target[:, None], st["k_target"])
        kf = jnp.where(upd, fq[:, None], st["k_fq"])
        kl = jnp.where(upd, lq[:, None], st["k_lq"])
        kr = jnp.where(upd, hstr[:, None], st["k_str"])
        # single backward bubble pass == the reference's insertion loop
        for kk in range(K - 1, 0, -1):
            swap = insert & (ks[:, kk] > ks[:, kk - 1])

            def sw(arr):
                a, b = arr[:, kk - 1], arr[:, kk]
                arr = arr.at[:, kk].set(jnp.where(swap, a, arr[:, kk]))
                arr = arr.at[:, kk - 1].set(jnp.where(swap, b, arr[:, kk - 1]))
                return arr

            ks, kt, kf, kl, kr = sw(ks), sw(kt), sw(kf), sw(kl), sw(kr)
        out_len = jnp.where(insert & ~full, st["out_len"] + 1, st["out_len"])
        # recovery (map.c:519-531): only while no potentials exist
        rec = (
            do_emit
            & ~passes
            & (st["out_len"] == 0)
            & (cnt > vt_rec_threshold)
            & (cnt > st["r_score"])
        )
        st = dict(st)
        st.update(
            k_score=ks, k_target=kt, k_fq=kf, k_lq=kl, k_str=kr, out_len=out_len,
            r_score=jnp.where(rec, cnt, st["r_score"]),
            r_target=jnp.where(rec, target, st["r_target"]),
            r_fq=jnp.where(rec, fq, st["r_fq"]),
            r_lq=jnp.where(rec, lq, st["r_lq"]),
            r_str=jnp.where(rec, hstr, st["r_str"]),
        )
        return st

    def step(st, inp):
        t, q, ok, sgn = inp
        in_run = (
            st["head_valid"]
            & ok
            & (sgn == st["head_str"])
            & ((t - st["head_t"]) <= vt_distance)
        )
        # extend run
        new_fq = jnp.where(in_run & (q < st["fq"]), q, st["fq"])
        new_head = jnp.where(in_run & (q < st["fq"]), t, st["head_t"])
        new_lq = jnp.where(in_run & (q > st["lq"]), q, st["lq"])
        new_cnt = jnp.where(in_run, st["cnt"] + 1, st["cnt"])
        # a break: head was valid and (invalid element | out of range)
        brk = st["head_valid"] & ~in_run
        st2 = emit(st, brk)
        # start new run at cur (if valid)
        st2["head_t"] = jnp.where(in_run, new_head, t)
        st2["fq"] = jnp.where(in_run, new_fq, q)
        st2["lq"] = jnp.where(in_run, new_lq, q)
        st2["cnt"] = jnp.where(in_run, new_cnt, 1)
        st2["head_valid"] = jnp.where(in_run, True, ok)
        st2["head_str"] = jnp.where(in_run, st["head_str"], sgn)
        return st2, None

    xs = (keys.T, qpos.T, valid.T, strand)
    final, _ = jax.lax.scan(step, state, xs)
    # final flush
    final = emit(final, final["head_valid"])
    return {k: v for k, v in final.items() if k.startswith(("k_", "out_len", "r_"))}


@partial(jax.jit, static_argnames=("A",))
def _expand_hits(
    starts: jnp.ndarray,  # [B, S] i64 CSR starts per kept seed
    counts: jnp.ndarray,  # [B, S] i64 (0 for dropped seeds)
    qpos: jnp.ndarray,  # [B, S] i32 (real query position)
    qstrand: jnp.ndarray,  # [B, S] i32
    positions: jnp.ndarray,  # [P] u64 index position array
    extracted_len: jnp.ndarray,  # [B] i32
    A: int,
):
    """Flatten ragged per-seed hit lists to [B, A]; project to diagonal keys
    (map.c:294-311) and sort each strand."""
    B, S = starts.shape
    cum = jnp.cumsum(counts, axis=1)  # [B, S]
    total = cum[:, -1]
    a_idx = jnp.arange(A, dtype=jnp.int64)[None, :]
    sid = jax.vmap(lambda c: jnp.searchsorted(c, a_idx[0], side="right"))(cum)
    sid_c = jnp.clip(sid, 0, S - 1)
    prev = jnp.where(sid_c > 0, jnp.take_along_axis(cum, jnp.maximum(sid_c - 1, 0), 1), 0)
    off_in = a_idx - prev
    pidx = jnp.take_along_axis(starts, sid_c, 1) + off_in
    hit = jnp.take(positions, jnp.clip(pidx, 0, len(positions) - 1))
    ok = a_idx < total[:, None]

    qp = jnp.take_along_axis(qpos, sid_c, 1)
    qs = jnp.take_along_axis(qstrand, sid_c, 1)
    strand = (hit & jnp.uint64(1)).astype(jnp.int32) ^ qs
    loc = ((hit & jnp.uint64(U32)) >> jnp.uint64(1)).astype(jnp.int64)
    chrom = (hit >> jnp.uint64(32)).astype(jnp.int64)
    proj_f = (loc + extracted_len[:, None].astype(jnp.int64) - qp.astype(jnp.int64)) & U32
    proj_r = (loc + qp.astype(jnp.int64)) & U32
    key_f = (chrom.astype(jnp.uint64) << jnp.uint64(32)) | proj_f.astype(jnp.uint64)
    key_r = (chrom.astype(jnp.uint64) << jnp.uint64(32)) | proj_r.astype(jnp.uint64)
    fkey = jnp.where(ok & (strand == 0), key_f, U64_MAX)
    rkey = jnp.where(ok & (strand == 1), key_r, U64_MAX)
    fval = ok & (strand == 0)
    rval = ok & (strand == 1)
    fkey_s, fq_s, fok_s = jax.lax.sort([fkey, qp, fval], dimension=1, num_keys=1)
    rkey_s, rq_s, rok_s = jax.lax.sort([rkey, qp, rval], dimension=1, num_keys=1)
    return fkey_s, fq_s, fok_s, rkey_s, rq_s, rok_s, total


@dataclass
class MapResult:
    regs: list  # list[Reg]
    rep_len: int = 0


class ShortReadMapper:
    """Batched device mapper with oracle-exact host fallback."""

    def __init__(
        self,
        index: DietIndex,
        mo: MapOptions,
        max_read_len: int = 256,
        seed_budget: int = 160,
        shift_seed_budget: int = 64,
        hit_budget: int = 2048,
    ):
        self.mi = index
        self.mo = mo
        self.mid_occ = index.derive_mid_occ(mo)
        self.Lmax = max_read_len
        self.A = hit_budget
        self.W = len(mo.pattern)
        # per-shift diet gather maps padded to a common budget
        maps = [pat.gather_map(max_read_len, mo.pattern, s) for s in range(self.W)]
        self.Dmax = max(len(m) for m in maps)
        # seeds can never exceed the diet length
        self.S = min(seed_budget, self.Dmax)
        self.S2 = min(shift_seed_budget, self.Dmax)
        self.maps = np.zeros((self.W, self.Dmax), np.int64)
        for s, m in enumerate(maps):
            self.maps[s, : len(m)] = m
            if len(m) < self.Dmax:
                self.maps[s, len(m):] = max_read_len - 1  # safe pad
        self._maps_dev = jnp.asarray(self.maps)
        self._oracle_index = None

    # ------------------------------------------------------------------
    def _oracle_mi(self):
        """Wrap the device index for the oracle fallback path."""
        if self._oracle_index is None:
            mi = self.mi

            class _Wrap:
                w, k, pattern = mi.w, mi.k, mi.pattern
                names, lengths = mi.names, [int(x) for x in mi.lengths]

                @staticmethod
                def get(minier):
                    return mi.get(minier)

                @staticmethod
                def getseq(rid, st, en, rev=False):
                    return mi.getseq(rid, st, en, rev)

            self._oracle_index = _Wrap()
        return self._oracle_index

    def _sketch(self, diet_codes, diet_len, rp, cap_out):
        return sketch_emit(
            diet_codes, diet_len, rp,
            jnp.zeros((diet_codes.shape[0],), jnp.int64),
            self.mi.k, self.mi.w, cap_out, final_flush_ge=True,
        )

    # ------------------------------------------------------------------
    def map_batch(self, reads: list[SeqRecord]) -> list[list[oal.Reg]]:
        mo, mi = self.mo, self.mi
        B = len(reads)
        lens = np.array([r.l_seq for r in reads], np.int64)
        codes = np.full((B, self.Lmax), 255, np.uint8)
        for i, r in enumerate(reads):
            codes[i, : r.l_seq] = osk.seq_to_code(r.seq)[: self.Lmax]

        host_only = lens > min(300, self.Lmax)
        device_idx = np.where(~host_only)[0]
        results: list[list[oal.Reg] | None] = [None] * B

        if len(device_idx):
            sub = [reads[i] for i in device_idx]
            dev_results, fallback = self._map_device(
                codes[device_idx], lens[device_idx], sub
            )
            for j, i in enumerate(device_idx):
                if j in fallback:
                    host_only[i] = True
                else:
                    results[i] = dev_results[j]

        for i in np.where(host_only)[0]:
            results[i] = map_read(
                self._oracle_mi(), reads[i].seq, mo, self.mid_occ, reads[i].name
            )
        return results

    # ------------------------------------------------------------------
    def _map_device(self, codes_np, lens_np, reads):
        mo, mi = self.mo, self.mi
        B = len(reads)
        codes = jnp.asarray(codes_np)
        fallback: set[int] = set()

        # ---- phase 1: shift inference (mm_sketch2 + mm_get_shift) ----
        frac_mode = mo.max_seeds < 1
        len_crop0 = (
            (mo.max_seeds * lens_np).astype(np.int64) if frac_mode else lens_np
        )
        cap_const = None if frac_mode else int(mo.max_seeds)
        nb_hits = np.zeros((self.W, B), np.int64)
        cap_vec = None  # set by shift 0 in frac mode
        for s in range(self.W):
            lc = len_crop0 if (frac_mode and s == 0) else lens_np
            dlen = np.array(
                [pat.diet_length(int(l), mo.pattern, s) for l in lc], np.int64
            )
            rp = jnp.broadcast_to(self._maps_dev[s], (B, self.Dmax))
            dc = jnp.take_along_axis(codes, rp, axis=1)
            xs, ys, valid, n = self._sketch(dc, jnp.asarray(dlen), rp, self.S2)
            n_np = np.asarray(n)
            if frac_mode and s == 0:
                cap_vec = n_np.copy()  # sketch.c:2219-2222
                eff = n_np
            else:
                cap = cap_vec if frac_mode else np.full(B, cap_const)
                eff = np.minimum(n_np, cap)
            _, cnts = mi.lookup(xs >> jnp.uint64(8))
            cnts = np.asarray(cnts)
            mask = np.arange(self.S2)[None, :] < eff[:, None]
            nb_hits[s] = (cnts * mask).sum(axis=1)
            # seeds beyond the device budget that would still count -> exact path
            if frac_mode and s == 0:
                over = n_np >= self.S2
            else:
                cap = cap_vec if frac_mode else np.full(B, cap_const)
                over = (n_np >= self.S2) & (cap > self.S2)
            for i in np.where(over)[0]:
                fallback.add(int(i))
        shift = nb_hits.argmax(axis=0)  # first max wins = mm_get_shift

        # ---- phase 2: query sketch (mm_sketch3) ----
        max_nb_seeds = (
            (800 if mo.max_frag_len == 0 else mo.max_frag_len)
            if (mo.flag & MM_F_FRAG_MODE)
            else U32
        )
        dlen3 = np.array(
            [pat.diet_length(int(l), mo.pattern, int(s)) for l, s in zip(lens_np, shift)],
            np.int64,
        )
        rp3 = jnp.take(self._maps_dev, jnp.asarray(shift), axis=0)
        dc3 = jnp.take_along_axis(codes, rp3, axis=1)
        xs, ys, _, n3 = self._sketch(dc3, jnp.asarray(dlen3), rp3, self.S)
        n3_np = np.asarray(n3)
        cap3 = min(max_nb_seeds, self.S)
        # seeds beyond the device budget but below the frag cap need fallback
        for i in np.where((n3_np > self.S) & (self.S < max_nb_seeds))[0]:
            fallback.add(int(i))
        mv_n = np.minimum(n3_np, max_nb_seeds)
        capped = n3_np >= max_nb_seeds
        ys_np = np.asarray(ys)
        cap_col = min(max_nb_seeds, ys_np.shape[1]) - 1
        extracted = np.where(
            capped, (ys_np[np.arange(B), cap_col] & U32) >> 1, lens_np
        ).astype(np.int64)

        # q-occurrence filter is a no-op when mv_n <= mid_occ (seed.c:8)
        if mo.q_occ_frac > 0:
            for i in np.where(mv_n > self.mid_occ)[0]:
                fallback.add(int(i))

        # ---- phase 3: matches ----
        seed_ok = jnp.arange(self.S)[None, :] < jnp.asarray(
            np.minimum(mv_n, self.S).astype(np.int64)
        )[:, None]
        starts, cnts = mi.lookup(jnp.where(seed_ok, xs >> jnp.uint64(8), U64_MAX))
        cnts_np = np.asarray(cnts)
        # exact streak selection can differ for long reads (seed.c:66-106)
        span_possible = lens_np >= int(0.501 * mo.occ_dist) + 1
        has_high = (cnts_np > self.mid_occ).any(axis=1)
        for i in np.where(span_possible & has_high)[0]:
            fallback.add(int(i))
        kept = seed_ok & (cnts > 0) & (cnts <= self.mid_occ)
        kcounts = jnp.where(kept, cnts, 0)
        total_np = np.asarray(kcounts.sum(axis=1))
        for i in np.where(total_np > self.A)[0]:
            fallback.add(int(i))

        qpos = ((ys & jnp.uint64(U32)) >> jnp.uint64(1)).astype(jnp.int32)
        qstrand = (ys & jnp.uint64(1)).astype(jnp.int32)

        fk, fq, fok, rk, rq, rok, _ = _expand_hits(
            starts.astype(jnp.int64), kcounts.astype(jnp.int64),
            qpos, qstrand, mi.device("positions"),
            jnp.asarray(extracted.astype(np.int32)), self.A,
        )

        # ---- phase 4: voting ----
        bw = (lens_np * mo.bw_frac).astype(np.int64)
        bw = np.clip(bw, mo.bw_min, mo.bw_max)
        capped_mask = ((mo.flag & MM_F_FRAG_MODE) != 0) & (extracted < lens_np)
        vt_thr = np.where(
            capped_mask,
            (max_nb_seeds * mo.min_cnt),
            mv_n * mo.min_cnt,
        ).astype(np.int64)
        vt_thr = np.maximum(vt_thr, 1)
        vt_rec = np.where(
            capped_mask,
            (max_nb_seeds * mo.rec_threshold_frac),
            mv_n * mo.rec_threshold_frac,
        ).astype(np.int64)

        K = mo.AF_max_loc
        M = 2 * self.A + 2
        barrier = jnp.full((B, 1), U64_MAX, jnp.uint64)
        bq = jnp.zeros((B, 1), jnp.int32)
        bok = jnp.zeros((B, 1), bool)
        keys = jnp.concatenate([fk, barrier, rk, barrier], axis=1)
        qv = jnp.concatenate([fq, bq, rq, bq], axis=1)
        okv = jnp.concatenate([fok, bok, rok, bok], axis=1)
        strand_stream = jnp.concatenate(
            [jnp.zeros(self.A + 1, jnp.int32), jnp.ones(self.A + 1, jnp.int32)]
        )
        vt = _vote_scan(
            keys, qv, okv, strand_stream,
            jnp.asarray(bw.astype(np.uint64)),
            jnp.asarray(vt_thr.astype(np.int32)),
            jnp.asarray(vt_rec.astype(np.int32)),
            K, self.A,
        )
        k_score = np.asarray(vt["k_score"])
        k_target = np.asarray(vt["k_target"])
        k_fq = np.asarray(vt["k_fq"])
        k_lq = np.asarray(vt["k_lq"])
        k_str = np.asarray(vt["k_str"])
        out_len = np.asarray(vt["out_len"])
        r_score = np.asarray(vt["r_score"])

        # ---- phase 5: candidate windows + alignment ----
        # build candidate list per read (top-K order, recovery substitution)
        cands = []  # (read_idx, chrom, target_loc(i32), fq, lq, str, vote_score)
        for i in range(B):
            if i in fallback:
                continue
            n_c = int(out_len[i])
            if n_c == 0:
                if r_score[i] == 0:
                    continue
                items = [(int(np.asarray(vt["r_target"])[i]),
                          int(np.asarray(vt["r_fq"])[i]),
                          int(np.asarray(vt["r_lq"])[i]),
                          int(np.asarray(vt["r_str"])[i]),
                          int(r_score[i]))]
            else:
                items = [
                    (int(k_target[i, c]), int(k_fq[i, c]), int(k_lq[i, c]),
                     int(k_str[i, c]), int(k_score[i, c]))
                    for c in range(n_c)
                ]
            for (tgt, fq_, lq_, st_, sc_) in items:
                chrom = tgt >> 32
                off = 0 if st_ else -int(extracted[i])
                loc = _to_i32((tgt & U32) + off)
                cands.append([i, chrom, loc, fq_, lq_, st_, sc_])

        return self._align_candidates(
            codes_np, lens_np, reads, cands, bw, fallback
        )

    # ------------------------------------------------------------------
    def _align_candidates(self, codes_np, lens_np, reads, cands, bw, fallback):
        """Window geometry (map.c:764-840, <=300bp branch), exact-match check,
        batched DP, and the oracle-exact host finish."""
        mo, mi = self.mo, self.mi
        B = len(reads)
        NC = len(cands)
        regs_per_read: list[list[oal.Reg]] = [[] for _ in range(B)]
        if NC:
            Lmax = self.Lmax
            qbuf = np.zeros((NC, Lmax), np.uint8)
            tbuf = np.zeros((NC, Lmax), np.uint8)
            meta = []
            for n, (i, chrom, loc, fq_, lq_, st_, sc_) in enumerate(cands):
                qlen = int(lens_np[i])
                tlen = int(mi.lengths[chrom])
                if st_:
                    loc -= mi.k - 1
                target_start = target_end = loc
                if st_:
                    if target_end > tlen - 1:
                        start_offset = target_end - (tlen - 1)
                        target_end = tlen - 1
                    else:
                        start_offset = 0
                    if target_end < qlen - start_offset - 1:
                        end_offset = start_offset + target_end
                        target_start = 0
                    else:
                        end_offset = qlen - 1
                        target_start = target_end - (end_offset - start_offset)
                else:
                    if target_start < 0:
                        start_offset = -target_start
                        target_start = 0
                    else:
                        start_offset = 0
                    if tlen - target_start < qlen - start_offset:
                        end_offset = tlen - 1 - target_start + start_offset
                        target_end = tlen - 1
                    else:
                        end_offset = qlen - 1
                        target_end = target_start + (end_offset - start_offset)
                length = end_offset - start_offset + 1
                if length <= 0 or length > Lmax or target_start < 0:
                    fallback.add(i)
                    meta.append(None)
                    continue
                rcodes = codes_np[i, :qlen]
                if st_:
                    qs_full = (rcodes[::-1] ^ 0x3).astype(np.uint8)
                    qs = qs_full[qlen - 1 - end_offset :][:length]
                else:
                    qs = rcodes[start_offset:][:length]
                ts = mi.getseq(chrom, target_start, target_end + 1)
                qbuf[n, : len(qs)] = qs
                tbuf[n, : len(ts)] = ts
                meta.append(
                    (i, chrom, start_offset, end_offset, target_start, target_end,
                     st_, sc_, length)
                )

            live = [n for n, m in enumerate(meta) if m is not None]
            lensC = np.array(
                [meta[n][8] if meta[n] else 0 for n in range(NC)], np.int32
            )
            exact = np.array(
                [
                    bool(meta[n])
                    and lens_np[meta[n][0]] < 300
                    and np.array_equal(qbuf[n, : lensC[n]], tbuf[n, : lensC[n]])
                    for n in range(NC)
                ]
            )
            dp_lens = np.where(exact, 0, lensC).astype(np.int32)
            bandC = np.array(
                [bw[meta[n][0]] if meta[n] else 0 for n in range(NC)], np.int32
            )
            params = np.array([mo.a, mo.b, mo.q, mo.e, mo.q2, mo.e2], np.int32)
            score, dirs, offs, off_ends = dpk.extd2_batch(
                jnp.asarray(qbuf), jnp.asarray(tbuf), jnp.asarray(dp_lens),
                jnp.asarray(bandC), jnp.asarray(params), Lmax,
            )
            score = np.asarray(score)
            cigs = dpk.backtrack_batch(
                np.asarray(dirs), np.asarray(offs), np.asarray(off_ends), dp_lens
            )

            for n in live:
                (i, chrom, so, eo, ts_, te_, st_, sc_, length) = meta[n]
                if i in fallback:
                    continue
                qlen = int(lens_np[i])
                if exact[n]:
                    ez_score = qlen * mo.a
                    cigar = [(length, oal.CIGAR_MATCH)]
                else:
                    ez_score = int(score[n])
                    cigar = cigs[n]
                r = oal.Reg(
                    rid=chrom, score=ez_score, qs=so, qe=eo + 1,
                    rs=ts_, re=te_ + 1, rev=st_, cigar=list(cigar),
                    dp_score=ez_score,
                )
                oal.update_extra(
                    r, qbuf[n, :length], tbuf[n, :length], mo.a, mo.b, mo.q, mo.e
                )
                clip0 = qlen - r.qe if r.rev else r.qs
                clip1 = r.qs if r.rev else qlen - r.qe
                if not (clip0 < qlen and clip1 < qlen) or r.dp_score < mo.min_dp_max:
                    continue
                lst = regs_per_read[i]
                lst.append(r)
                k = len(lst) - 1
                while k > 0 and lst[k].score > lst[k - 1].score:
                    lst[k], lst[k - 1] = lst[k - 1], lst[k]
                    k -= 1

        max_nb_sec = 0 if (mo.flag & MM_F_NO_PRINT_2ND) else mo.best_n
        for i in range(B):
            if i in fallback:
                continue
            if regs_per_read[i]:
                set_sam_params(regs_per_read[i], int(lens_np[i]), mo.a, max_nb_sec)
        return regs_per_read, fallback


def _to_i32(v: int) -> int:
    v &= U32
    return v - (1 << 32) if v >= (1 << 31) else v
