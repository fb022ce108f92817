"""Device stages of the long-read pipeline.

Reuses the shared hit-collection front (device_step.collect_hits) and adds
the long-read voting scans as lax.scans over the concatenated fwd/rev hit
stream:

  * ``_vote_scan_lr`` — round-1 vote (GDiet-LongReads/map.c:1052-1180):
    coverage-gated runs, raw-target span tracking via the inverse diagonal
    projection, score-sorted top-K insertion (no threshold, no recovery).
  * ``_vote2_scan`` — round-2 vote (map.c:1182-1271): best run constrained
    to a query window (lo, hi), counting only in-window hits.

The hit stream (keys/qpos/valid) is returned by ``lr_front`` as device
arrays so the round-2 scan reruns on device without re-uploading anything.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gdiet_tpu.pipeline.device_step import StepConfig, collect_hits

U64_MAX = jnp.uint64(0xFFFFFFFFFFFFFFFF)
U32 = 0xFFFFFFFF
I64 = jnp.int64


def _raw_target(t, q, sgn, extracted):
    """Inverse diagonal projection: the hit's raw genomic anchor
    (map.c:1064-1065). u64 wraparound semantics."""
    qq = q.astype(jnp.uint64)
    ex = extracted.astype(jnp.uint64)
    return jnp.where(sgn != 0, t - qq, t - (ex - qq))


@partial(jax.jit, static_argnames=("K",))
def _vote_scan_lr(
    keys: jnp.ndarray,  # [B, M] u64 projected targets (stream order)
    qpos: jnp.ndarray,  # [B, M] i32
    valid: jnp.ndarray,  # [B, M] bool
    strand: jnp.ndarray,  # [M] i32
    extracted: jnp.ndarray,  # [B] i64
    vt_distance: jnp.ndarray,  # [B] u64
    cov_thr: jnp.ndarray,  # [B] i32 coverage threshold
    K: int,
):
    B, M = keys.shape
    i32 = jnp.int32

    state = {
        "head_valid": jnp.zeros((B,), bool),
        "head_str": jnp.zeros((B,), i32),
        "ref_loc": jnp.zeros((B,), jnp.uint64),
        "first_t": jnp.zeros((B,), jnp.uint64),
        "last_t": jnp.zeros((B,), jnp.uint64),
        "fq": jnp.zeros((B,), i32),
        "lq": jnp.zeros((B,), i32),
        "cnt": jnp.zeros((B,), i32),
        "k_score": jnp.full((B, K), -1, i32),
        "k_first_t": jnp.zeros((B, K), jnp.uint64),
        "k_last_t": jnp.zeros((B, K), jnp.uint64),
        "k_fq": jnp.zeros((B, K), i32),
        "k_lq": jnp.zeros((B, K), i32),
        "k_str": jnp.zeros((B, K), i32),
        "out_len": jnp.zeros((B,), i32),
    }

    def emit(st, do_emit):
        # lq >= fq by construction, so plain i32 subtraction implements the
        # uint32 coverage gate (map.c:1095)
        cov = (st["lq"] - st["fq"]) > cov_thr
        passes = do_emit & cov
        full = st["out_len"] == K
        reject = passes & full & (st["k_score"][:, K - 1] >= st["cnt"])
        insert = passes & ~reject
        pos = jnp.where(full, K - 1, st["out_len"])
        slot = jnp.arange(K, dtype=i32)[None, :] == pos[:, None]
        upd = insert[:, None] & slot

        def put(arr, val):
            return jnp.where(upd, val[:, None], arr)

        ks = put(st["k_score"], st["cnt"])
        kft = put(st["k_first_t"], st["first_t"])
        klt = put(st["k_last_t"], st["last_t"])
        kf = put(st["k_fq"], st["fq"])
        kl = put(st["k_lq"], st["lq"])
        kr = put(st["k_str"], st["head_str"])
        for kk in range(K - 1, 0, -1):
            swap = insert & (ks[:, kk] > ks[:, kk - 1])

            def sw(arr):
                a, b = arr[:, kk - 1], arr[:, kk]
                arr = arr.at[:, kk].set(jnp.where(swap, a, arr[:, kk]))
                arr = arr.at[:, kk - 1].set(jnp.where(swap, b, arr[:, kk - 1]))
                return arr

            ks, kft, klt, kf, kl, kr = (
                sw(ks), sw(kft), sw(klt), sw(kf), sw(kl), sw(kr)
            )
        st = dict(st)
        st.update(
            k_score=ks, k_first_t=kft, k_last_t=klt, k_fq=kf, k_lq=kl,
            k_str=kr,
            out_len=jnp.where(insert & ~full, st["out_len"] + 1, st["out_len"]),
        )
        return st

    def step(st, inp):
        t, q, ok, sgn = inp
        raw = _raw_target(t, q, sgn, extracted)
        in_run = (
            st["head_valid"]
            & ok
            & (sgn == st["head_str"])
            & ((t - st["ref_loc"]) <= vt_distance)
        )
        q_lt = q < st["fq"]
        new_fq = jnp.where(q_lt, q, st["fq"])
        new_ref = jnp.where(q_lt, t, st["ref_loc"])
        new_lq = jnp.maximum(st["lq"], q)
        new_ft = jnp.minimum(st["first_t"], raw)
        new_lt = jnp.maximum(st["last_t"], raw)
        brk = st["head_valid"] & ~in_run
        st2 = emit(st, brk)
        st2["ref_loc"] = jnp.where(in_run, new_ref, t)
        st2["first_t"] = jnp.where(in_run, new_ft, raw)
        st2["last_t"] = jnp.where(in_run, new_lt, raw)
        st2["fq"] = jnp.where(in_run, new_fq, q)
        st2["lq"] = jnp.where(in_run, new_lq, q)
        st2["cnt"] = jnp.where(in_run, st["cnt"] + 1, 1)
        st2["head_valid"] = jnp.where(in_run, True, ok)
        st2["head_str"] = jnp.where(in_run, st["head_str"], sgn)
        return st2, None

    final, _ = jax.lax.scan(step, state, (keys.T, qpos.T, valid.T, strand))
    final = emit(final, final["head_valid"])
    return {k: v for k, v in final.items() if k.startswith(("k_", "out_len"))}


@jax.jit
def _vote2_scan(
    keys: jnp.ndarray,  # [B, M] u64
    qpos: jnp.ndarray,  # [B, M] i32
    valid: jnp.ndarray,  # [B, M] bool
    strand: jnp.ndarray,  # [M] i32
    extracted: jnp.ndarray,  # [B] i64
    vt_distance: jnp.ndarray,  # [B] u64
    lo: jnp.ndarray,  # [B] i32 window (exclusive)
    hi: jnp.ndarray,  # [B] i32 window (exclusive)
):
    """vote_2 (map.c:1182-1271): best window-constrained run per read."""
    B, M = keys.shape
    i32 = jnp.int32

    state = {
        "head_valid": jnp.zeros((B,), bool),
        "head_str": jnp.zeros((B,), i32),
        "ref_loc": jnp.zeros((B,), jnp.uint64),
        "first_t": jnp.zeros((B,), jnp.uint64),
        "last_t": jnp.zeros((B,), jnp.uint64),
        "fq": jnp.zeros((B,), i32),
        "lq": jnp.zeros((B,), i32),
        "cnt": jnp.zeros((B,), i32),
        "b_score": jnp.zeros((B,), i32),
        "b_first_t": jnp.zeros((B,), jnp.uint64),
        "b_last_t": jnp.zeros((B,), jnp.uint64),
        "b_fq": jnp.zeros((B,), i32),
        "b_lq": jnp.zeros((B,), i32),
        "b_str": jnp.zeros((B,), i32),
    }

    def consider(st, do_emit):
        better = (
            do_emit & (st["cnt"] > st["b_score"]) & (st["lq"] < hi)
            & (st["fq"] > lo)
        )
        st = dict(st)
        for dst, src in (("b_score", "cnt"), ("b_first_t", "first_t"),
                         ("b_last_t", "last_t"), ("b_fq", "fq"),
                         ("b_lq", "lq"), ("b_str", "head_str")):
            st[dst] = jnp.where(better, st[src], st[dst])
        return st

    def step(st, inp):
        t, q, ok, sgn = inp
        raw = _raw_target(t, q, sgn, extracted)
        in_run = (
            st["head_valid"]
            & ok
            & (sgn == st["head_str"])
            & ((t - st["ref_loc"]) <= vt_distance)
        )
        in_win = in_run & (q < hi) & (q > lo)
        q_lt = in_win & (q < st["fq"])
        brk = st["head_valid"] & ~in_run
        st2 = consider(st, brk)
        st2["ref_loc"] = jnp.where(in_run, jnp.where(q_lt, t, st["ref_loc"]), t)
        st2["first_t"] = jnp.where(
            in_run, jnp.where(in_win, jnp.minimum(st["first_t"], raw), st["first_t"]), raw
        )
        st2["last_t"] = jnp.where(
            in_run, jnp.where(in_win, jnp.maximum(st["last_t"], raw), st["last_t"]), raw
        )
        st2["fq"] = jnp.where(in_run, jnp.where(q_lt, q, st["fq"]), q)
        st2["lq"] = jnp.where(
            in_run, jnp.where(in_win, jnp.maximum(st["lq"], q), st["lq"]), q
        )
        st2["cnt"] = jnp.where(in_run, st["cnt"] + jnp.where(in_win, 1, 0), 1)
        st2["head_valid"] = jnp.where(in_run, True, ok)
        st2["head_str"] = jnp.where(in_run, st["head_str"], sgn)
        return st2, None

    final, _ = jax.lax.scan(step, state, (keys.T, qpos.T, valid.T, strand))
    final = consider(final, final["head_valid"])
    return {k: v for k, v in final.items() if k.startswith("b_")}


def lr_front(
    codes, lens,
    idx_keys, idx_starts, idx_positions, idx_buckets,
    maps, pref,
    cov_thr,  # [B] i32
    vt_dis,  # [B] u64 (opt.vt_dis)
    cfg: StepConfig,
):
    """Device front of the LR mm_map_frag: shared hit collection + round-1
    vote. Returns vote results plus the device-resident hit stream for the
    round-2 scan."""
    B = codes.shape[0]
    (fallback, shift, extracted, mv_n, capped,
     fk, fq, fok, rk, rq, rok, A_stream) = collect_hits(
        codes, lens, idx_keys, idx_starts, idx_positions, idx_buckets,
        maps, pref, cfg,
    )
    barrier = jnp.full((B, 1), U64_MAX, jnp.uint64)
    bq = jnp.zeros((B, 1), jnp.int32)
    bok = jnp.zeros((B, 1), bool)
    keys = jnp.concatenate([fk, barrier, rk, barrier], axis=1)
    qv = jnp.concatenate([fq, bq, rq, bq], axis=1)
    okv = jnp.concatenate([fok, bok, rok, bok], axis=1)
    strand_stream = jnp.concatenate(
        [jnp.zeros(A_stream + 1, jnp.int32), jnp.ones(A_stream + 1, jnp.int32)]
    )
    vt = _vote_scan_lr(
        keys, qv, okv, strand_stream, extracted, vt_dis, cov_thr, cfg.K
    )
    # single packed [B, 4 + 8K] i32 tensor for the host (the TPU link has
    # high per-transfer latency); u64 target fields split into hi/lo words
    i32 = jnp.int32
    cols = [
        fallback.astype(i32)[:, None],
        shift.astype(i32)[:, None],
        extracted.astype(i32)[:, None],
        vt["out_len"][:, None],
        vt["k_score"],
        vt["k_fq"],
        vt["k_lq"],
        vt["k_str"],
        (vt["k_first_t"] >> jnp.uint64(32)).astype(i32),
        (vt["k_first_t"] & jnp.uint64(0xFFFFFFFF)).astype(i32),
        (vt["k_last_t"] >> jnp.uint64(32)).astype(i32),
        (vt["k_last_t"] & jnp.uint64(0xFFFFFFFF)).astype(i32),
    ]
    return {
        "meta": jnp.concatenate(cols, axis=1),
        "extracted": extracted,
        "keys": keys,
        "qv": qv,
        "okv": okv,
        "strand_stream": strand_stream,
    }


LR_META_B = 4  # fallback, shift, extracted, out_len
LR_META_BK = 8  # score, fq, lq, str, ft_hi, ft_lo, lt_hi, lt_lo


def unpack_lr_meta(meta, K: int) -> dict:
    """Host inverse of lr_front's packed meta."""
    import numpy as np

    u32 = lambda x: x.astype(np.int64) & 0xFFFFFFFF
    out = {
        "fallback": meta[:, 0].astype(bool),
        "shift": meta[:, 1],
        "extracted": meta[:, 2],
        "out_len": meta[:, 3],
    }
    base = LR_META_B
    names = ("k_score", "k_fq", "k_lq", "k_str", "ft_hi", "ft_lo", "lt_hi",
             "lt_lo")
    for f, name in enumerate(names):
        out[name] = meta[:, base + f * K : base + (f + 1) * K]
    out["k_first_t"] = (u32(out.pop("ft_hi")) << 32) | u32(out.pop("ft_lo"))
    out["k_last_t"] = (u32(out.pop("lt_hi")) << 32) | u32(out.pop("lt_lo"))
    return out


def vote2_packed_pair(keys, qv, okv, strand_stream, extracted, vt_dis,
                      lo1, hi1, lo2, hi2):
    """Both round-2 windows (head gap + tail gap, map.c:1680-1712) in ONE
    dispatch; returns [B, 16] i32 (two packed vote2 blocks) so the host
    pays a single transfer round-trip."""
    a = vote2_packed(keys, qv, okv, strand_stream, extracted, vt_dis, lo1, hi1)
    b = vote2_packed(keys, qv, okv, strand_stream, extracted, vt_dis, lo2, hi2)
    return jnp.concatenate([a, b], axis=1)


def vote2_packed(keys, qv, okv, strand_stream, extracted, vt_dis, lo, hi):
    """Round-2 scan with a single packed [B, 8] i32 result."""
    vt2 = _vote2_scan(keys, qv, okv, strand_stream, extracted, vt_dis, lo, hi)
    i32 = jnp.int32
    return jnp.stack(
        [
            vt2["b_score"],
            vt2["b_fq"],
            vt2["b_lq"],
            vt2["b_str"],
            (vt2["b_first_t"] >> jnp.uint64(32)).astype(i32),
            (vt2["b_first_t"] & jnp.uint64(0xFFFFFFFF)).astype(i32),
            (vt2["b_last_t"] >> jnp.uint64(32)).astype(i32),
            (vt2["b_last_t"] & jnp.uint64(0xFFFFFFFF)).astype(i32),
        ],
        axis=1,
    )
