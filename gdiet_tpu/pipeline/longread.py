"""Long-read mapper: device front + exact host finish.

Device stages (pipeline/lr_step.py): shift inference, query sketch, CSR
lookup, hit expansion, round-1 coverage-gated voting, and window-constrained
round-2 voting all run as fused jitted dispatches; per-segment banded DP runs
as length-bucketed Pallas kernel calls with on-device backtrack. The host
applies the density/relative filters, builds the concatenation graph and the
CIGAR concatenation, and assigns SAM params — all via the byte-parity-tested
oracle stage functions (oracle/longread.py).

Reads that leave the fixed-shape envelope fall back to the scalar oracle.
On non-TPU backends the per-segment DP uses the scalar oracle kernel (the
XLA scan would dominate test time); everything else still runs the device
path, keeping CPU tests representative.
"""

from __future__ import annotations

from dataclasses import replace as dataclass_replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gdiet_tpu.config import MM_F_NO_PRINT_2ND, MM_F_SR, MapOptions
from gdiet_tpu.index.build import DietIndex, bucket_table, lookup_vals
from gdiet_tpu.io.fastx import SeqRecord
from gdiet_tpu.oracle import align as oal
from gdiet_tpu.oracle import longread as olr
from gdiet_tpu.oracle import sketch as osk
from gdiet_tpu.ops import dp as dpk
from gdiet_tpu.pipeline import device_step as ds
from gdiet_tpu.pipeline.lr_step import lr_front, unpack_lr_meta

F32 = np.float32
U32 = 0xFFFFFFFF

# (Lq, Lt) DP buckets; segments beyond the largest bucket -> oracle fallback
DP_BUCKETS = [(512, 1024), (2048, 3072), (4096, 5120), (8192, 9216), (16384, 17408), (32768, 34048)]


class LongReadMapper:
    def __init__(
        self,
        index: DietIndex,
        mo: MapOptions,
        max_read_len: int = 8192,
        seed_budget: int = 2048,
        shift_seed_budget: int = 256,
        hit_budget: int = 8192,
        device: bool = True,
        vote_budget: int = 0,
        n_threads: int = 1,
        mesh=None,
    ):
        self.mi = index
        self.mo = mo
        self.mid_occ = index.derive_mid_occ(mo)
        self.Lmax = max_read_len
        self.device_enabled = device
        self._oracle_index = None
        # -t analog (kt_for, kthread.c:54): the per-read host loops
        # (prepare_segments / finalize_read / oracle fallbacks) release the
        # GIL inside numpy and the C oracle kernels, so a thread pool is
        # the LR host-finish parallelism — same design as ShortReadMapper
        self.n_threads = max(1, n_threads)
        self._pool = None
        # measured per-run counters (reset by callers as needed): reads that
        # left the device envelope and took the scalar oracle
        self.stats = {"fallback_reads": 0, "n_reads": 0}

        from gdiet_tpu import pattern as pat

        dmax = pat.diet_length(max_read_len, mo.pattern, 0)
        cfg = ds.StepConfig.from_options(
            index, mo, self.mid_occ, max_read_len,
            min(seed_budget, dmax), min(shift_seed_budget, dmax), hit_budget,
        )
        # LR voting keeps vt_nb_loc candidates (map.c:1310)
        cfg = dataclass_replace(cfg, K=mo.vt_nb_loc,
                                vote_budget=vote_budget)
        tkv, c1, c2, nb = index.device_cuckoo_kv()
        cfg = dataclass_replace(
            cfg, probe="cuckoo", cuckoo_c1=c1, cuckoo_c2=c2, cuckoo_nb=nb
        )
        self._use_pallas_dp = jax.default_backend() == "tpu"
        self.cfg = cfg
        maps, pref, _ = ds._pattern_tables(cfg)
        self.arrays = dict(
            idx_keys=tkv,  # merged (k0..3, v0..3) rows; vals unused
            idx_vals=jnp.zeros((1,), jnp.uint64),
            idx_positions=jnp.asarray(index.positions),
            idx_buckets=jnp.zeros((1,), jnp.int64),  # unused under cuckoo
            maps=jnp.asarray(maps),
            pref=jnp.asarray(pref),
        )
        self.mesh = mesh
        if mesh is not None:
            # multi-chip LR: the front runs under shard_map on a
            # (data, ref) mesh (parallel/dist.sharded_lr_front); the host
            # finish and segment DP are unchanged. Device batches are
            # padded to a multiple of the data-axis width.
            from gdiet_tpu.parallel.dist import sharded_lr_front

            self._mesh_front = sharded_lr_front(
                mesh, index, cfg, maps, pref, index.k,
                float(mo.vt_df1), float(mo.vt_f), int(mo.bw),
            )
        self._front = jax.jit(partial(
            lr_front, cfg=cfg, k=index.k, vt_df1=float(mo.vt_df1),
            vt_f=float(mo.vt_f), bw=int(mo.bw),
        ))
        self._bucket_fns: dict = {}

    # ------------------------------------------------------------------
    def _map_parallel(self, fn, items):
        """Run ``fn`` over items on the -t pool (order-preserving)."""
        if self.n_threads > 1 and len(items) > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(self.n_threads)
            return list(self._pool.map(fn, items))
        return [fn(x) for x in items]

    # ------------------------------------------------------------------
    def _oracle_mi(self):
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

    # ------------------------------------------------------------------
    def map_batch(self, reads: list[SeqRecord]) -> list[list[oal.Reg]]:
        return self._tail_batch(self._mid_batch(self._start_batch(reads)))

    def map_stream(self, batches):
        """Two-deep pipeline over the tunnel: while this batch's host vote +
        job prep run, the device computes the NEXT batch's front; while the
        device runs this batch's segment DP, the host finalizes the
        PREVIOUS batch. Stage order per iteration: start(k+1), mid(k),
        tail(k-1)."""
        started = None  # front dispatched
        midded = None   # DP dispatched, awaiting fetch + finalize
        for batch in batches:
            new = self._start_batch(batch)
            if started is not None:
                m = self._mid_batch(started)
                if midded is not None:
                    yield self._tail_batch(midded)
                midded = m
            started = new
        if started is not None:
            m = self._mid_batch(started)
            if midded is not None:
                yield self._tail_batch(midded)
            midded = m
        if midded is not None:
            yield self._tail_batch(midded)

    def regs_to_sam_lines(self, rec: SeqRecord, regs, rep_len: int = 0):
        """Final SAM record lines for one read (the single library path used
        by CLI, bench and tests — format.c:412-602 semantics via io/sam.py)."""
        from gdiet_tpu.io import sam as samio

        mo = self.mo
        lines = []
        if regs:
            for r in regs:
                if (mo.flag & MM_F_NO_PRINT_2ND) and r.id != r.parent:
                    continue
                lines.append(samio.sam_record(
                    rec.name, rec.seq, rec.qual, r, regs, self.mi.names,
                    mo.flag, rep_len, index=self.mi,
                ))
        else:
            lines.append(samio.sam_record(
                rec.name, rec.seq, rec.qual, None, [], self.mi.names,
                mo.flag, rep_len,
            ))
        return lines

    def _start_batch(self, reads):
        B = len(reads)
        results: list[list[oal.Reg] | None] = [None] * B
        lens = np.array([r.l_seq for r in reads], np.int64)
        from gdiet_tpu import debug

        host_only = (
            np.ones(B, bool)
            if (not self.device_enabled or self.mo.sdust_thres > 0
                or debug.enabled())
            else (lens > self.Lmax) | (lens == 0)
        )
        device_idx = np.where(~host_only)[0]
        front = None
        if len(device_idx):
            front = self._dispatch_front(
                [reads[i] for i in device_idx], lens[device_idx]
            )
        return reads, results, lens, host_only, device_idx, front

    def _mid_batch(self, st):
        """Host vote + round-2 + job prep; ends with the segment-DP chunks
        dispatched (device computes while the caller does other work)."""
        reads, results, lens, host_only, device_idx, front = st
        dev = None
        if len(device_idx):
            dev = self._map_device_mid(
                [reads[i] for i in device_idx], lens[device_idx], results,
                device_idx, front,
            )
        return reads, results, lens, host_only, device_idx, dev

    def _tail_batch(self, st):
        """Fetch the DP results, finalize device reads, run host fallbacks."""
        reads, results, lens, host_only, device_idx, dev = st
        if dev is not None:
            fb = self._map_device_tail(dev)
            for j, i in enumerate(device_idx):
                if fb[j]:
                    host_only[i] = True
        self.stats["fallback_reads"] += int(host_only.sum())
        self.stats["n_reads"] += len(reads)
        # per-batch mask for callers that pad batches and must count only
        # real reads (bench.py ont_stats)
        self.last_host_only = host_only
        fb_idx = [int(i) for i in np.where(host_only)[0]]
        fb_res = self._map_parallel(
            lambda i: olr.map_read_lr(
                self._oracle_mi(), reads[i].seq, self.mo, self.mid_occ,
                reads[i].name,
            ),
            fb_idx,
        )
        for i, r in zip(fb_idx, fb_res):
            results[i] = r
        return results

    # ------------------------------------------------------------------
    def _dispatch_front(self, reads, lens_np):
        """Encode and enqueue the device front (async dispatch)."""
        mo = self.mo
        B = len(reads)
        from gdiet_tpu import native

        if native.lib is not None:
            codes, _ = native.encode_batch([r.seq for r in reads], self.Lmax)
        else:
            codes = np.full((B, self.Lmax), 255, np.uint8)
            for i, r in enumerate(reads):
                codes[i, : r.l_seq] = osk.seq_to_code(r.seq)[: self.Lmax]

        cov_thr = np.array(
            [int(F32(l) * F32(mo.vt_cov)) for l in lens_np], np.int32
        )
        vt_dis = np.full(B, mo.vt_dis, np.uint64)
        if self.mesh is not None:
            # pad the device batch to a multiple of the data-axis width
            # with zero-length rows (sliced off the returned meta)
            n_data = self.mesh.shape["data"]
            pad = (-B) % n_data
            if pad:
                codes_p = np.full((B + pad, self.Lmax), 255, np.uint8)
                codes_p[:B] = codes
                lens_p = np.concatenate([lens_np, np.zeros(pad, np.int64)])
                cov_p = np.concatenate([cov_thr, np.zeros(pad, np.int32)])
                dis_p = np.concatenate([vt_dis, np.ones(pad, np.uint64)])
            else:
                codes_p, lens_p, cov_p, dis_p = codes, lens_np, cov_thr, vt_dis
            out = self._mesh_front(
                jnp.asarray(codes_p), jnp.asarray(lens_p.astype(np.int64)),
                jnp.asarray(cov_p), jnp.asarray(dis_p),
            )
            out = {"meta": out["meta"][:B]}
        else:
            out = self._front(
                jnp.asarray(codes), jnp.asarray(lens_np.astype(np.int64)),
                self.arrays["idx_keys"], self.arrays["idx_vals"],
                self.arrays["idx_positions"], self.arrays["idx_buckets"],
                self.arrays["maps"], self.arrays["pref"],
                jnp.asarray(cov_thr), jnp.asarray(vt_dis),
            )
        try:  # start the D2H copy of the vote results without blocking
            out["meta"].copy_to_host_async()
        except AttributeError:
            pass
        return codes, cov_thr, vt_dis, out

    def _map_device_mid(self, reads, lens_np, results, result_idx, front):
        from gdiet_tpu.utils.profile import PROFILE, Stage

        mo, mi, cfg = self.mo, self.mi, self.cfg
        B = len(reads)
        codes, cov_thr, vt_dis, out = front
        with PROFILE.stage(Stage.DEVICE_FUSED):
            # blocks on the fused front (sketch+lookup+vote) D2H
            meta = unpack_lr_meta(np.asarray(out["meta"]), cfg.K)
        fallback = meta["fallback"].copy()
        kept_len = meta["kept_len"]
        k_score = meta["k_score"]
        k_fq = meta["k_fq"]
        k_lq = meta["k_lq"]
        k_str = meta["k_str"]
        k_chrom = meta["k_chrom"]
        k_ft = meta["k_ft"]
        k_lt = meta["k_lt"]
        k_lt_adj = meta["k_lt_adj"]
        lo1, hi1 = meta["lo1"], meta["hi1"]
        lo2, hi2 = meta["lo2"], meta["hi2"]
        vt2p = meta["vt2"]

        # ---- host: rebuild filtered VtSeqs (filters ran on device) ----
        per_read: list[list[olr.VtSeq] | None] = [None] * B
        for i in range(B):
            if fallback[i]:
                continue
            seqs = [
                olr.VtSeq(
                    chrom_id=int(k_chrom[i, c]),
                    first_target_loc=int(k_ft[i, c]),  # signed i32
                    last_target_loc=(
                        int(k_lt[i, c]) if k_lt_adj[i, c]
                        else int(k_lt[i, c]) & U32
                    ),
                    first_query_loc=int(k_fq[i, c]) & U32,
                    last_query_loc=int(k_lq[i, c]),
                    str=int(k_str[i, c]),
                    score=int(k_score[i, c]),
                )
                for c in range(int(kept_len[i]))
            ]
            per_read[i] = seqs

        # ---- round-2 accepts (the scans already ran on device) ----
        if ((hi1 > lo1) | (hi2 > lo2)).any():
            u32 = lambda x: int(x) & U32
            for (lo, hi), vt2 in (((lo1, hi1), vt2p[:, :8]),
                                  ((lo2, hi2), vt2p[:, 8:])):
                for i in range(B):
                    if fallback[i] or per_read[i] is None or not per_read[i]:
                        continue
                    if hi[i] <= lo[i]:
                        continue
                    cand = olr.VtSeq(
                        chrom_id=u32(vt2[i, 4]),
                        first_target_loc=u32(vt2[i, 5]),
                        last_target_loc=u32(vt2[i, 7]),
                        first_query_loc=int(vt2[i, 1]),
                        last_query_loc=int(vt2[i, 2]),
                        str=int(vt2[i, 3]),
                        score=int(vt2[i, 0]),
                    )
                    olr.accept_round2(cand, mo, mi.k, per_read[i])

        # ---- host: concat graph + window geometry (on the -t pool) ----
        all_jobs = []  # (read i, job tuple)
        strands: list[tuple[np.ndarray, np.ndarray] | None] = [None] * B
        prep_idx = []
        for i in range(B):
            if fallback[i] or per_read[i] is None:
                continue
            if not per_read[i]:
                results[result_idx[i]] = []
                continue
            prep_idx.append(i)

        def _prep(i):
            seqs = per_read[i]
            olr.build_concat_graph(seqs, mo)
            qlen_sum = int(lens_np[i])
            qs_for = codes[i, :qlen_sum].astype(np.uint8)
            qs_rev = (qs_for[::-1] ^ 0x3).astype(np.uint8)
            jobs = olr.prepare_segments(
                self._oracle_mi(), mo, qs_for, qs_rev, qlen_sum, seqs
            )
            return (qs_for, qs_rev), jobs

        for i, (strand, jobs) in zip(
            prep_idx, self._map_parallel(_prep, prep_idx)
        ):
            strands[i] = strand
            for job in jobs:
                all_jobs.append((i, job))

        # ---- batched segment DP (bucketed): dispatch only ----
        ezs, pending = self._align_jobs_dispatch(all_jobs, lens_np, fallback)
        return (results, result_idx, lens_np, fallback, per_read, strands,
                all_jobs, ezs, pending)

    def _map_device_tail(self, dev):
        from gdiet_tpu.utils.profile import PROFILE, Stage

        (results, result_idx, lens_np, fallback, per_read, strands,
         all_jobs, ezs, pending) = dev
        mo = self.mo
        B = len(lens_np)
        self._align_jobs_fetch(ezs, pending)

        # ---- finish per read ----
        with PROFILE.stage(Stage.HOST_FINISH):
            by_read: dict[int, tuple[list, list]] = {}
            for (i, job), ez in zip(all_jobs, ezs):
                by_read.setdefault(i, ([], []))
                by_read[i][0].append(job)
                by_read[i][1].append(ez)
            fin_idx = [
                i for i in range(B)
                if not (fallback[i] or per_read[i] is None or not per_read[i])
            ]

            def _fin(i):
                jobs, ez_list = by_read.get(i, ([], []))
                qs_for, qs_rev = strands[i]
                return olr.finalize_read(
                    self._oracle_mi(), mo, qs_for, qs_rev, int(lens_np[i]),
                    per_read[i], jobs, ez_list,
                )

            for i, regs in zip(fin_idx, self._map_parallel(_fin, fin_idx)):
                results[result_idx[i]] = regs
        return fallback

    # ------------------------------------------------------------------
    def _align_jobs_dispatch(self, all_jobs, lens_np, fallback):
        """Per-segment DP: exact-match short-circuit, then length-bucketed
        batched kernel calls (TPU) or the scalar oracle kernel (CPU)."""
        mo = self.mo
        ezs: list = [None] * len(all_jobs)
        buckets: dict[int, list[int]] = {bi: [] for bi in range(len(DP_BUCKETS))}
        for n, (i, (s, qwin, twin, exact, qlen)) in enumerate(all_jobs):
            if fallback[i]:
                ezs[n] = (oal.NEG_INF, [])
                continue
            if exact:
                ezs[n] = (int(lens_np[i]) * mo.a, [(int(qlen), oal.CIGAR_MATCH)])
                continue
            if not self._use_pallas_dp:
                ez = oal.extd2(
                    qwin, twin, mo.a, mo.b, mo.q, mo.e, mo.q2, mo.e2,
                    mo.bw, mo.zdrop, mo.end_bonus, oal.KSW_EZ_APPROX_MAX,
                )
                ezs[n] = (ez.score, list(ez.cigar))
                continue
            placed = False
            for bi, (lq, lt) in enumerate(DP_BUCKETS):
                if len(qwin) <= lq and len(twin) <= lt:
                    buckets[bi].append(n)
                    placed = True
                    break
            if not placed:  # beyond the largest bucket
                ez = oal.extd2(
                    qwin, twin, mo.a, mo.b, mo.q, mo.e, mo.q2, mo.e2,
                    mo.bw, mo.zdrop, mo.end_bonus, oal.KSW_EZ_APPROX_MAX,
                )
                ezs[n] = (ez.score, list(ez.cigar))

        from gdiet_tpu import native
        from gdiet_tpu.pipeline.device_step import unpack_ops

        from gdiet_tpu.ops.dp_pallas import window_geometry

        # phase 1: enqueue every chunk (async dispatch) so the device works
        # ahead while the host post-processes earlier chunks
        pending = []
        for bi, members in buckets.items():
            if not members:
                continue
            lq, lt = DP_BUCKETS[bi]
            # bound the dirs tensor (R x N x Wd bytes) to ~1 GB per call,
            # where Wd is the banded lane-window width, not the full target
            T_pad = (lt + 127) // 128 * 128
            WB = window_geometry(int(mo.bw), T_pad)
            Wd = WB if (WB is not None and WB < T_pad) else T_pad
            R = lq + lt
            # power-of-two chunk so padded batch dims never exceed the
            # ~1 GB dirs budget
            chunk = 32
            while chunk * 2 * R * Wd <= (1 << 30):
                chunk *= 2
            run = self._bucket_fn(lq, lt)
            for c0 in range(0, len(members), chunk):
                sub = members[c0 : c0 + chunk]
                # pad the batch dim to the next power of two so each bucket
                # compiles for O(log) shapes instead of one per job count
                # (padded rows have qlen 0 = dead candidates)
                N = 32
                while N < len(sub):
                    N <<= 1
                Q = np.zeros((N, lq), np.uint8)
                T = np.zeros((N, lt), np.uint8)
                qlens = np.zeros(N, np.int32)
                tlens = np.zeros(N, np.int32)
                for j, n in enumerate(sub):
                    _, (s, qwin, twin, exact, _q) = all_jobs[n]
                    Q[j, : len(qwin)] = qwin
                    T[j, : len(twin)] = twin
                    qlens[j] = len(qwin)
                    tlens[j] = len(twin)
                band = np.full(N, mo.bw, np.int32)
                dev = run(
                    jnp.asarray(Q), jnp.asarray(T), jnp.asarray(qlens),
                    jnp.asarray(tlens), jnp.asarray(band),
                )
                pending.append((sub, qlens, dev))

        # start every D2H copy now so the transfers overlap the caller's
        # host work and each other
        for _, _, dev in pending:
            try:
                dev.copy_to_host_async()
            except AttributeError:
                pass
        return ezs, pending

    def _align_jobs_fetch(self, ezs, pending):
        """Fetch dispatched DP chunks + host RLE, in dispatch order."""
        from gdiet_tpu import native
        from gdiet_tpu.pipeline.device_step import unpack_ops

        from gdiet_tpu.utils.profile import PROFILE, Stage

        for sub, qlens, dev in pending:
            with PROFILE.stage(Stage.DEVICE_FUSED):  # segment-DP D2H block
                packed = np.asarray(dev)
            score = packed[:, :4].copy().view(np.int32)[:, 0]
            fin_i = packed[:, 4:8].copy().view(np.int32)[:, 0]
            fin_j = packed[:, 8:12].copy().view(np.int32)[:, 0]
            op_rows = unpack_ops(packed[:, 12:])
            cigs = None
            if native.lib is not None:
                cigs = native.rle_ops(op_rows, fin_i, fin_j, qlens,
                                      max_runs=max(1024, op_rows.shape[1] // 4))
            if cigs is None:
                cigs = dpk.cigars_from_ops(op_rows, fin_i, fin_j, qlens)
            for j, n in enumerate(sub):
                sc = int(score[j])
                ezs[n] = (sc, cigs[j] if sc != oal.NEG_INF else [])
        return ezs

    def _bucket_fn(self, lq: int, lt: int):
        """Jitted DP+backtrack for one (lq, lt) bucket with ONE packed u8
        output (score | fin_i | fin_j | 2-bit op stream) per candidate."""
        key = (lq, lt)
        if key in self._bucket_fns:
            return self._bucket_fns[key]
        params = tuple(self.cfg.params)
        from gdiet_tpu.ops.dp_pallas import extd2_batch_pallas
        from gdiet_tpu.pipeline.device_step import pack_ops

        bb = int(self.mo.bw)

        # windowed long-read buckets are grid-step-overhead bound: use a
        # deeper wavefront unroll than the short-read default
        LR_UNROLL = 8

        @jax.jit
        def run(Q, T, qlens, tlens, band):
            score, dirs, offs, offe = extd2_batch_pallas(
                Q, T, qlens, band, params, lq, tlens=tlens, Lt=lt,
                band_budget=bb, unroll=LR_UNROLL,
            )
            ops, fin_i, fin_j = ds._backtrack_antidiag(
                dirs, qlens, band, lq, tlens=tlens, Lt=lt, band_budget=bb,
                unroll=LR_UNROLL,
            )
            pad = (-ops.shape[1]) % 4
            if pad:
                ops = jnp.concatenate(
                    [ops, jnp.full((ops.shape[0], pad), 255, jnp.uint8)],
                    axis=1,
                )
            N = Q.shape[0]
            b = lambda x: jax.lax.bitcast_convert_type(
                x[:, None].astype(jnp.int32), jnp.uint8
            ).reshape(N, 4)
            return jnp.concatenate(
                [b(score), b(fin_i), b(fin_j), pack_ops(ops)], axis=1
            )

        self._bucket_fns[key] = run
        return run
