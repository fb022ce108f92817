"""Pallas TPU kernel for the batched banded dual affine-gap DP.

Same recurrence as ops/dp.py::extd2_batch (the Suzuki-Kasahara difference
formulation of ksw_extd2, GDiet-ShortReads/ksw2_extd2_sse.c:34-402) but with
the anti-diagonal state held in VMEM scratch across a (candidate-block,
wavefront) grid: TPU grid steps execute sequentially per core, so the r-axis
of the grid IS the wavefront loop, each step writing its direction bytes to
its own [1, NB, T] output block (pipelined to HBM by Mosaic). The XLA scan
version round-trips ~12 carry arrays through HBM per step; this kernel
touches HBM once for inputs and once per dirs slice.

The anti-diagonal substitution lookup needs query[r-t] per lane t; since the
wavefront advances by exactly one lane per step, that vector is maintained in
scratch: roll right by one lane, inject query[r] at lane 0 (the C code's
reversed-query trick, ksw2_extd2_sse.c:105-147, without the copy).

Bit-identical to ops/dp.py (asserted by tests/test_dp_pallas.py in
interpreter mode and on hardware by the SAM-parity bench): 16-lane stale
block behavior, boundary fallbacks, greedy approx-max H0 tracking, direction
bit packing.

Speed-of-light analysis (BASELINE.md's "speed-of-light MCUPS" target)
---------------------------------------------------------------------
This recurrence cannot use the MXU: it is a select/max-heavy int32 chain
with a loop-carried dependency per wavefront, so the ceiling is the VPU's
int32 throughput, not matmul FLOPs.

At the SR bench shape (qlen = tlen = 150, band 150): T = 256 lanes,
R = 320 wavefronts, i.e. 81,920 computed lane-cells per candidate vs the
22,500 cells MCUPS counts — a 3.64x lane-padding factor inherent to the
16-lane-aligned full-width wavefront (the banded window only engages when
band << T, i.e. the long-read buckets). Counting the vector ops in the
unrolled body (recurrence core + direction bits + X/Y/X2/Y2 updates +
boundary/edge selects + the two masked H0 reductions) gives ~80 int32 VPU
ops per lane-cell. One v5e core's VPU sustains ~4e12 int32 op/s, so the
op-count ceiling is ~48e9 lane-cells/s = ~13 GCUPS *counted* at this
shape. The dirs stream writes R*T = 82 kB per candidate (3.6 B/counted
cell); at ~800 GB/s HBM write bandwidth that bounds ~220 GCUPS — HBM is
NOT the limit; the kernel is VPU-compute-bound.

Measured (bench.py mcups_stat, honest checksum-synced harness, r04):
~4.6 GCUPS = ~35% of the op-count ceiling; the residual gap is the
masked-reduction H0 gathers, the three pltpu.roll ops (multi-instruction
on Mosaic), and the full-lane-width vector ops against the diamond's
variable live span. For comparison, the reference's 1-core AVX-512
kernel (ksw2_extd2_avx.c:72) reaches ~1-2 GCUPS on this recurrence; one
TPU core already exceeds it, and the SR pipeline amortizes DP under
dp_frac anyway.

Lever status after r05 measurement (all numbers v5e, N=16384, L=192,
qlen=150, floor-subtracted):

(1) lane-padding halving — IMPLEMENTED as the time-FOLDED kernel
    (_dp_kernel_fold, fold=True): two consecutive candidates' half-
    diamonds time-share each kernel row, cutting wavefronts/candidate
    from R=qlen+tlen-1 to ~H=max(qlen, R/2) and halving the dirs HBM
    footprint (513->275 MB at the SR batch shape). Measured return:
    +7% kernel-level and +1.2% end-to-end (SAM-identical), NOT the
    naive 1.9x — the dual-half body costs ~1.5x per step (extra
    boundary/reset/H0 machinery and lost VPU multi-issue slack), and
    Mosaic compiles it ~8x slower (353 s vs 46 s first pass). It is
    therefore OPT-IN (GDIET_DP_FOLD=1); bench.py records both variants'
    MCUPS. The honest conclusion: at ~120 VPU ops/wavefront the
    unfolded kernel already sits near the 4-issue op bound, so padding
    reduction buys little without an op-count reduction to match.

(2) int16 state lanes — ``state_dtype="int16"`` is implemented and
    bit-parity tested in interpreter mode (tests/test_dp_pallas.py) but
    TOOLCHAIN-BLOCKED on hardware: this environment's Mosaic compile
    helper rejects even trivial int16 Pallas kernels (HTTP-500 from
    tpu_compile_helper, r05 probe), on top of the missing int16
    reductions/rotates already worked around by int32 casts. Re-test
    when the toolchain moves.

(3) eliding dirs writes for sub-only rows — superseded: the SR pipeline
    already compacts DP rows to the need-DP subset (device_step phase 8).

(4) vectorizing the approximate-H0 walk — TRIED AND REVERTED (r05): the
    two per-wavefront masked reductions (the _row_gather H0/lt taps,
    ksw2_extd2_sse.c:367-383) can be replaced by a one-hot walk mask
    updated elementwise plus a per-lane increment accumulator, with ONE
    cross-lane sum at kernel end. Bit-parity held (interpreter fuzz +
    NEG_INF rows), but same-box A/B measured 4,357 -> 3,882-3,961 MCUPS
    (~9-10% SLOWER): the replacement needs two extra pltpu.roll ops and
    ~6 full-width selects per wavefront, which out-cost the two
    log-depth reductions, and its larger unrolled live set overflowed
    the 16 MiB scoped-vmem stack budget (needed a vmem_limit_bytes
    raise just to compile). Kept out of the tree; this note is the
    record.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0x40000000
DP_UNROLL = 4  # wavefronts per grid step (shared with the backtrack)
FOLD_GAP = 32  # folded mode: lane gap between the two resident half-diamonds
FOLD_PASSES = 16  # target candidates per kernel row (pass-overhead = 1/16)


def fold_geometry(Lmax: int, Lt: int | None, unroll: int = DP_UNROLL):
    """Static geometry of the folded kernel (see extd2_batch_pallas fold=True):
    H = wavefronts per pass, T = folded lane width, Tn = the nominal
    (unfolded) lane width whose clamps the C semantics reference."""
    if Lt is None:
        Lt = Lmax
    Tn = _round_up(Lt, 128)
    T = _round_up(Lt + FOLD_GAP + 16, 128)
    # coverage: 2H >= Lmax+Lt-1; lane-disjointness: H >= qlen_max = Lmax
    H = _round_up(max(Lmax, (Lmax + Lt) // 2), max(unroll, 8))
    return H, T, Tn


def window_geometry(band_budget: int, T: int, unroll: int = DP_UNROLL):
    """Static banded-window width for a given max bandwidth; None when the
    window would not be smaller than the full lane range.

    Coverage: for wavefronts r in [r0, r0+U) the kernel touches lanes
    [st, en] with st >= ((r0-w+1)>>1) - 16 (16-aligned down) and
    en <= ((r0+U-1+w)>>1) + 15; the 128-aligned window base costs <= 127
    more, so width w + U/2 + 158 + eps suffices — +176 slack rounds up."""
    WB = _round_up(band_budget + 176 + unroll, 128)
    return WB if WB < T else None

# columns of the per-row scalar scratch (sc_s[NB, 128])
_H0, _LT, _LST, _LEN, _SCORE = 0, 1, 2, 3, 4


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def safe_state_dtype(params: tuple) -> str:
    """"int16" when the scoring provably fits the 16-bit lane state (every
    real preset does — the lane values of the difference formulation are
    bounded by a few gap costs, ksw2_extd2_sse.c:34), else "int32"."""
    a, b, q, e, q2, e2 = params
    return "int16" if 4 * (a + b + q + e + q2 + e2) < 32767 else "int32"


def _row_gather(arr, idx, base=0, mask=None):
    """arr[row, idx[row] - base] for per-row indices clipped into the array,
    via masked reduction, returned as int32. ``base`` is the absolute lane
    id of column 0. Pass a precomputed ``mask`` (from _row_mask) when
    several arrays are gathered at the same index. The reduction always
    runs in int32: Mosaic has no int16 reductions, and the consumers
    (per-row H0 tracking) are int32 anyway."""
    if mask is None:
        mask = _row_mask(arr.shape, idx, base)
    return jnp.sum(
        jnp.where(mask, arr, 0).astype(jnp.int32), axis=1, keepdims=True,
        dtype=jnp.int32,
    )


def _row_mask(shape, idx, base=0):
    T = shape[1]
    lanes = base + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx_c = jnp.clip(idx, base, base + T - 1)
    return lanes == idx_c


def _dp_kernel(meta_ref, q_ref, t_ref, score_ref, dirs_ref,
               u_s, v_s, x_s, y_s, x2_s, y2_s, s_s, sc_s, *, T, TQ,
               scoring, WB=None, w_max=0, sdt=jnp.int32):
    # Mosaic has no 64-bit ints; under x64 python literals in clip/where///
    # trace to i64 scalars whose i64->i32 converts fail to lower. All kernel
    # inputs are 32-bit, so tracing with x64 off keeps everything i32.
    with jax.enable_x64(False):
        _dp_kernel_body(meta_ref, q_ref, t_ref, score_ref, dirs_ref,
                        u_s, v_s, x_s, y_s, x2_s, y2_s, s_s, sc_s,
                        T=T, TQ=TQ, scoring=scoring, WB=WB, w_max=w_max,
                        sdt=sdt)


def _dp_kernel_body(meta_ref, q_ref, t_ref, score_ref, dirs_ref,
                    u_s, v_s, x_s, y_s, x2_s, y2_s, s_s, sc_s,
                    *, T, TQ, scoring, WB=None, w_max=0, sdt=jnp.int32):
    a, b, q, e, q2, e2, long_thres, long_diff = scoring
    NB = meta_ref.shape[0]
    U = dirs_ref.shape[0]  # wavefronts per grid step (unroll factor)
    i32 = jnp.int32
    g = pl.program_id(1).astype(i32)
    r0 = g * U
    G = pl.num_programs(1)

    # all literals must be explicitly typed: weak python ints inside
    # jnp.where default to i64 under x64. The LANE state runs in ``sdt``
    # (int16 where the scoring provably fits: 2x VPU lanes per op — the
    # roofline lever (2) in the module docstring); the per-row scalars
    # (H0 / score) stay i32.
    qe_init = sdt(-(q + e))
    qe2_init = sdt(-(q2 + e2))
    c_mch = sdt(a)
    c_mis = sdt(-b)
    c_n = sdt(-e2)
    c_e = sdt(-e)
    c_e2 = sdt(-e2)
    c_ld = sdt(long_diff)
    i0, i1, i2, i3, i4 = (sdt(n) for n in range(5))
    b08, b10, b20, b40 = (sdt(n) for n in (0x08, 0x10, 0x20, 0x40))

    @pl.when(r0 == 0)
    def _init():
        u_s[:, :] = jnp.full((NB, T), qe_init, sdt)
        v_s[:, :] = jnp.full((NB, T), qe_init, sdt)
        x_s[:, :] = jnp.full((NB, T), qe_init, sdt)
        y_s[:, :] = jnp.full((NB, T), qe_init, sdt)
        x2_s[:, :] = jnp.full((NB, T), qe2_init, sdt)
        y2_s[:, :] = jnp.full((NB, T), qe2_init, sdt)
        s_s[:, :] = jnp.zeros((NB, T), sdt)
        cols = jax.lax.broadcasted_iota(i32, (NB, 128), 1)
        sc = jnp.where((cols == _LST) | (cols == _LEN), jnp.int32(-1), jnp.int32(0))
        sc = jnp.where(cols == _SCORE, jnp.int32(NEG_INF), sc)
        sc_s[:, :] = sc

    qlen = meta_ref[:, 0:1]  # [NB, 1]
    wband = meta_ref[:, 1:2]
    tlen = meta_ref[:, 2:3]

    # banded window: every live row's 16-aligned band at wavefronts
    # [r0, r0+U) lies within [(r0-w_max+1)>>1 - 16, (r0+U-1+w_max)>>1 + 31],
    # a data-independent range of width < WB; compute (and the dirs stream)
    # touch only that 128-aligned window
    windowed = WB is not None and WB < T
    if windowed:
        lo_raw = ((r0 - jnp.int32(w_max) + 1) >> 1) - 16
        lo_al = jnp.clip(lo_raw, 0, T - WB) // 128 * 128
        lo_al = pl.multiple_of(lo_al, 128)
        W_ = WB
        win = lambda ref: ref[:, pl.ds(lo_al, WB)]
    else:
        lo_al = 0
        W_ = T
        win = lambda ref: ref[:, :]
    lanes = lo_al + jax.lax.broadcasted_iota(i32, (NB, W_), 1)
    sf = win(t_ref)

    u, v = win(u_s), win(v_s)
    x, y = win(x_s), win(y_s)
    x2, y2 = win(x2_s), win(y2_s)
    s = win(s_s)
    H0 = sc_s[:, _H0:_H0 + 1]
    lt = sc_s[:, _LT:_LT + 1]
    last_st = sc_s[:, _LST:_LST + 1]
    last_en = sc_s[:, _LEN:_LEN + 1]
    score = sc_s[:, _SCORE:_SCORE + 1]

    for uu in range(U):
        r = r0 + uu
        # the anti-diagonal query vector qv[j] = query[r - lo_al - j] is a
        # reversed read: qrev_ext[o + j] with o = T + TQ - 1 - r + lo_al.
        # Mosaic dynamic slices must be 128-aligned, so load the aligned
        # superset and rotate by the remainder (dynamic roll).
        o = jnp.int32(T + TQ - 1) - r + lo_al
        ao = pl.multiple_of(o // 128 * 128, 128)
        rem = o - ao
        sl = q_ref[:, pl.ds(ao, W_ + 128)]
        qv_win = pltpu.roll(sl, (W_ + 128) - rem, axis=1)[:, :W_]

        st0 = jnp.maximum(jnp.maximum(0, r - qlen + 1), (r - wband + 1) >> 1)
        en0 = jnp.minimum(jnp.minimum(tlen - 1, r), (r + wband) >> 1)
        live = (st0 <= en0) & (r < qlen + tlen - 1) & (qlen > 0)
        st = st0 // 16 * 16
        en = jnp.minimum((en0 + 16) // 16 * 16 - 1, T - 1)

        # boundary values (ksw2_extd2_sse.c:149-163). The lane-st-1 state
        # values are delivered by the SAME roll-by-1 the recurrence already
        # needs (the window has >= 15 lanes of slack below st, so the roll
        # never wraps into garbage there) — no masked-reduction gathers.
        prev_ok = (st > 0) & (st - 1 >= last_st) & (st - 1 <= last_en)
        bu = jnp.where(
            r == 0, qe_init,
            jnp.where(r < long_thres, c_e, jnp.where(r == long_thres, c_ld, c_e2)),
        )

        # edge-lane init at t == r
        at_edge = (lanes == r) & (en >= r) & live
        y = jnp.where(at_edge, qe_init, y)
        y2 = jnp.where(at_edge, qe2_init, y2)
        u = jnp.where(at_edge, bu, u)

        # substitution scores for lanes [st0, st0+16*ceil(span/16))
        span16 = (en0 - st0) // 16 * 16 + 16
        in_s = (lanes >= st0) & (lanes < st0 + span16) & live
        qi_ok = (lanes <= r) & ((r - lanes) < qlen)
        qv = jnp.where(qi_ok, qv_win, 0)
        nmask = (sf == 4) | (qv == 4)
        sval = jnp.where(sf == qv, c_mch, c_mis)
        sval = jnp.where(nmask, c_n, sval)
        s = jnp.where(in_s, sval, s)

        in_al = (lanes >= st) & (lanes <= en) & live
        # Mosaic's lane rotate has no int16 lowering: roll through int32
        # (the cast pair costs 2 W-wide ops per roll vs ~80 in the body)
        if sdt == jnp.int32:
            _roll1 = lambda A: pltpu.roll(A, 1, axis=1)
        else:
            _roll1 = lambda A: pltpu.roll(
                A.astype(i32), 1, axis=1).astype(sdt)
        x_prev = _roll1(x)
        v_prev = _roll1(v)
        x2_prev = _roll1(x2)
        at_st = lanes == st
        # at lane st the rolled value IS x[st-1] etc.; override only when
        # st-1 was outside the previous wavefront's footprint (or st == 0,
        # where v takes the r-boundary value bu)
        x_prev = jnp.where(at_st & ~prev_ok, qe_init, x_prev)
        x2_prev = jnp.where(at_st & ~prev_ok, qe2_init, x2_prev)
        v_bnd = jnp.where(st > 0, jnp.where(prev_ok, v_prev, qe_init),
                          jnp.broadcast_to(bu, v_prev.shape))
        v_prev = jnp.where(at_st, v_bnd, v_prev)

        zv = s
        a_ = x_prev + v_prev
        b_ = y + u
        a2_ = x2_prev + v_prev
        b2_ = y2 + u
        d = jnp.where(a_ > zv, i1, i0)
        zv = jnp.maximum(zv, a_)
        d = jnp.where(b_ > zv, i2, d)
        zv = jnp.maximum(zv, b_)
        d = jnp.where(a2_ > zv, i3, d)
        zv = jnp.maximum(zv, a2_)
        d = jnp.where(b2_ > zv, i4, d)
        zv = jnp.maximum(zv, b2_)
        zv = jnp.minimum(zv, c_mch)

        u_new = zv - v_prev
        v_new = zv - u
        a_p = a_ - (zv - q)
        b_p = b_ - (zv - q)
        a2_p = a2_ - (zv - q2)
        b2_p = b2_ - (zv - q2)
        d = d | jnp.where(a_p > 0, b08, i0)
        d = d | jnp.where(b_p > 0, b10, i0)
        d = d | jnp.where(a2_p > 0, b20, i0)
        d = d | jnp.where(b2_p > 0, b40, i0)

        u2 = jnp.where(in_al, u_new, u)
        v2 = jnp.where(in_al, v_new, v)
        x = jnp.where(in_al, jnp.maximum(a_p, 0) - (q + e), x)
        y = jnp.where(in_al, jnp.maximum(b_p, 0) - (q + e), y)
        x2 = jnp.where(in_al, jnp.maximum(a2_p, 0) - (q2 + e2), x2)
        y2 = jnp.where(in_al, jnp.maximum(b2_p, 0) - (q2 + e2), y2)
        u, v = u2, v2
        d_out = jnp.where(in_al, d, i0)
        dirs_ref[uu, :, :] = d_out.astype(jnp.uint8)

        # approximate H0 tracking (ksw2_extd2_sse.c:367-383)
        lt_in = (lt >= st0) & (lt <= en0)
        lt1_in = (lt + 1 >= st0) & (lt + 1 <= en0)
        v_lt = _row_gather(v2, lt, lo_al)
        u_lt1 = _row_gather(u2, lt + 1, lo_al)
        both = lt_in & lt1_in
        d0gt = v_lt > u_lt1
        H0_new = jnp.where(
            both,
            jnp.where(d0gt, H0 + v_lt, H0 + u_lt1),
            jnp.where(lt_in, H0 + v_lt, H0 + u_lt1),
        )
        lt_new = jnp.where(
            both, jnp.where(d0gt, lt, lt + 1), jnp.where(lt_in, lt, lt + 1)
        )
        first = r == 0
        # r == 0 implies lo_al == 0, so v2 lane 0 is a plain slice
        H0 = jnp.where(live, jnp.where(
            first, v2[:, 0:1].astype(i32) - (q + e), H0_new), H0)
        lt = jnp.where(live, jnp.where(first, 0, lt_new), lt)

        hit_end = live & (r == qlen + tlen - 2) & (en0 == tlen - 1)
        score = jnp.where(hit_end, H0, score)
        last_st = jnp.where(live, st, last_st)
        last_en = jnp.where(live, en, last_en)

    if windowed:
        u_s[:, pl.ds(lo_al, WB)] = u
        v_s[:, pl.ds(lo_al, WB)] = v
        x_s[:, pl.ds(lo_al, WB)] = x
        y_s[:, pl.ds(lo_al, WB)] = y
        x2_s[:, pl.ds(lo_al, WB)] = x2
        y2_s[:, pl.ds(lo_al, WB)] = y2
        s_s[:, pl.ds(lo_al, WB)] = s
    else:
        u_s[:, :] = u
        v_s[:, :] = v
        x_s[:, :] = x
        y_s[:, :] = y
        x2_s[:, :] = x2
        y2_s[:, :] = y2
        s_s[:, :] = s
    cols = jax.lax.broadcasted_iota(i32, (NB, 128), 1)
    sc = sc_s[:, :]
    sc = jnp.where(cols == _H0, H0, sc)
    sc = jnp.where(cols == _LT, lt, sc)
    sc = jnp.where(cols == _LST, last_st, sc)
    sc = jnp.where(cols == _LEN, last_en, sc)
    sc = jnp.where(cols == _SCORE, score, sc)
    sc_s[:, :] = sc

    @pl.when(g == G - 1)
    def _fin():
        score_ref[:, :] = jnp.broadcast_to(score, (NB, 128))


# folded-mode per-row scalar columns (sc_s[NB, 128]); candidate A (first
# half, lanes [0, Tn)) at +0, candidate B (second half, lanes GAP-shifted)
# at +8. LST/LEN/LT are stored in GLOBAL lane coordinates for both halves.
_FQ, _FW, _FT = 5, 6, 7


def _dp_kernel_fold(meta_ref, q_ref, t_ref, score_ref, dirs_ref,
                    u_s, v_s, x_s, y_s, x2_s, y2_s, s_s, tm_s, sc_s,
                    *, T, Tn, TQ, H, scoring, sdt=jnp.int32):
    with jax.enable_x64(False):  # see _dp_kernel: trace literals as i32
        _dp_kernel_fold_body(meta_ref, q_ref, t_ref, score_ref, dirs_ref,
                             u_s, v_s, x_s, y_s, x2_s, y2_s, s_s, tm_s, sc_s,
                             T=T, Tn=Tn, TQ=TQ, H=H, scoring=scoring, sdt=sdt)


def _dp_kernel_fold_body(meta_ref, q_ref, t_ref, score_ref, dirs_ref,
                         u_s, v_s, x_s, y_s, x2_s, y2_s, s_s, tm_s, sc_s,
                         *, T, Tn, TQ, H, scoring, sdt=jnp.int32):
    """Time-folded wavefront kernel: each kernel row runs a PIPELINE of
    candidates, two resident at a time — candidate A's first-half diamond
    (wavefronts [0, H), lanes growing from 0) and the PREVIOUS candidate
    B's second half (wavefronts [H, 2H), lanes shrinking toward its tlen,
    shifted up by FOLD_GAP). Their per-step lane footprints are provably
    disjoint (A's 16-aligned reads/writes reach at most lane r+15; B's
    aligned span starts at >= r+18 because st0_B >= r + H - qlen + 1 and
    H >= qlen), so one set of state arrays and ONE shared recurrence serve
    both halves: ~2x the counted cells per step of the unfolded kernel
    (roofline lever (1), halving the 3.64x lane-padding factor).

    C-parity invariants preserved across the fold:
      - a frontier reset writes init values to lane r+16 each wavefront,
        so A's 16-aligned stale block (lanes (en0, r+15]) always reads the
        same 'never touched' values the unfolded kernel's _init provides —
        after B abandoned those lanes (B last writes lane t at step
        <= t-18, A first reads it at step t-15, the reset lands at t-16);
      - the substitution target vector is maintained incrementally in
        scratch (tm_s): lane r+16 flips from B's target code to A's on the
        same reset cadence;
      - at each pass start the state arrays roll up by FOLD_GAP (the
        finishing candidate changes coordinate systems from A to B) and
        lanes [0, FOLD_GAP) reset to init values.

    The shared query vector trick: q_ref holds A's reversed query at
    positions [..C0] (C0 = T+TQ-1, as the unfolded kernel) AND B's query
    at positions C0+H+GAP-i for i in [0, Lmax): both halves read
    buf[o + lane] with o = C0 - r, so the one aligned load + roll serves
    A (lanes <= r) and B (lanes >= GAP + st0_B) simultaneously.
    """
    a, b, q, e, q2, e2, long_thres, long_diff = scoring
    NB = meta_ref.shape[0]
    U = dirs_ref.shape[0]
    i32 = jnp.int32
    GAP = FOLD_GAP
    pid = pl.program_id(1)
    g = pl.program_id(2).astype(i32)
    G = pl.num_programs(2)
    r0 = g * U

    qe_init = sdt(-(q + e))
    qe2_init = sdt(-(q2 + e2))
    c_mch = sdt(a)
    c_mis = sdt(-b)
    c_n = sdt(-e2)
    c_e = sdt(-e)
    c_e2 = sdt(-e2)
    c_ld = sdt(long_diff)
    i0, i1, i2, i3, i4 = (sdt(n) for n in range(5))
    b08, b10, b20, b40 = (sdt(n) for n in (0x08, 0x10, 0x20, 0x40))
    cols = jax.lax.broadcasted_iota(i32, (NB, 128), 1)
    lanes = jax.lax.broadcasted_iota(i32, (NB, T), 1)

    def _sc_meta(sc):
        """Fresh first-half scalar slots from this pass's meta block."""
        sc = jnp.where((cols == _LST) | (cols == _LEN), i32(-1), sc)
        sc = jnp.where((cols == _H0) | (cols == _LT), i32(0), sc)
        sc = jnp.where(cols == _SCORE, i32(NEG_INF), sc)
        sc = jnp.where(cols == _FQ, meta_ref[:, 0:1], sc)
        sc = jnp.where(cols == _FW, meta_ref[:, 1:2], sc)
        sc = jnp.where(cols == _FT, meta_ref[:, 2:3], sc)
        return sc

    @pl.when((pid == 0) & (r0 == 0))
    def _full_init():
        for ref, cv in ((u_s, qe_init), (v_s, qe_init), (x_s, qe_init),
                        (y_s, qe_init), (x2_s, qe2_init), (y2_s, qe2_init),
                        (s_s, sdt(0))):
            ref[:, :] = jnp.full((NB, T), cv, sdt)
        tm_s[:, :] = t_ref[:, :]
        sc = jnp.where((cols == _LST + 8) | (cols == _LEN + 8), i32(-1),
                       jnp.zeros((NB, 128), i32))
        sc = jnp.where(cols == _SCORE + 8, i32(NEG_INF), sc)
        sc_s[:, :] = _sc_meta(sc)  # B slots stay dead (qlen 0)

    @pl.when((pid > 0) & (r0 == 0))
    def _pass_transition():
        low = lanes < GAP
        if sdt == jnp.int32:
            _rollg = lambda A: pltpu.roll(A, GAP, axis=1)
        else:
            _rollg = lambda A: pltpu.roll(
                A.astype(i32), GAP, axis=1).astype(sdt)
        for ref, cv in ((u_s, qe_init), (v_s, qe_init), (x_s, qe_init),
                        (y_s, qe_init), (x2_s, qe2_init), (y2_s, qe2_init),
                        (s_s, sdt(0))):
            ref[:, :] = jnp.where(low, cv, _rollg(ref[:, :]))
        tm_s[:, :] = jnp.where(low, t_ref[:, :],
                               pltpu.roll(tm_s[:, :], GAP, axis=1))
        # scalars: A -> B (lane coords shift by GAP), fresh A from meta
        olds = [sc_s[:, c:c + 1] for c in range(8)]
        sc = jnp.zeros((NB, 128), i32)
        for c, val in enumerate(olds):
            if c in (_LT, _LST, _LEN):
                val = val + GAP
            sc = jnp.where(cols == c + 8, val, sc)
        sc_s[:, :] = _sc_meta(sc)

    # per-row scalars for both halves
    H0a, lta = sc_s[:, 0:1], sc_s[:, 1:2]
    lsta, lena = sc_s[:, 2:3], sc_s[:, 3:4]
    scoa = sc_s[:, 4:5]
    qla, wba, tla = sc_s[:, 5:6], sc_s[:, 6:7], sc_s[:, 7:8]
    H0b, ltb = sc_s[:, 8:9], sc_s[:, 9:10]
    lstb, lenb = sc_s[:, 10:11], sc_s[:, 11:12]
    scob = sc_s[:, 12:13]
    qlb, wbb, tlb = sc_s[:, 13:14], sc_s[:, 14:15], sc_s[:, 15:16]

    u, v = u_s[:, :], v_s[:, :]
    x, y = x_s[:, :], y_s[:, :]
    x2, y2 = x2_s[:, :], y2_s[:, :]
    s = s_s[:, :]
    tmix = tm_s[:, :]
    t_new = t_ref[:, :]

    if sdt == jnp.int32:
        _roll1 = lambda A: pltpu.roll(A, 1, axis=1)
        _rollm1 = lambda A: pltpu.roll(A, T - 1, axis=1)
    else:
        _roll1 = lambda A: pltpu.roll(A.astype(i32), 1, axis=1).astype(sdt)
        _rollm1 = lambda A: pltpu.roll(
            A.astype(i32), T - 1, axis=1).astype(sdt)

    for uu in range(U):
        r = r0 + uu
        rB = r + jnp.int32(H)
        # shared anti-diagonal query vector (A + B layouts, one roll)
        o = jnp.int32(T + TQ - 1) - r
        ao = pl.multiple_of(o // 128 * 128, 128)
        rem = o - ao
        sl = q_ref[:, pl.ds(ao, T + 128)]
        qv_win = pltpu.roll(sl, (T + 128) - rem, axis=1)[:, :T]

        # first-half (A) band geometry — local == global lanes
        st0a = jnp.maximum(jnp.maximum(0, r - qla + 1), (r - wba + 1) >> 1)
        en0a = jnp.minimum(jnp.minimum(tla - 1, r), (r + wba) >> 1)
        livea = (st0a <= en0a) & (r < qla + tla - 1) & (qla > 0)
        sta = st0a // 16 * 16
        ena = jnp.minimum((en0a + 16) // 16 * 16 - 1, Tn - 1)
        # second-half (B) band geometry — global = local + GAP
        st0b = jnp.maximum(jnp.maximum(0, rB - qlb + 1), (rB - wbb + 1) >> 1)
        en0b = jnp.minimum(jnp.minimum(tlb - 1, rB), (rB + wbb) >> 1)
        liveb = (st0b <= en0b) & (rB < qlb + tlb - 1) & (qlb > 0)
        stb = st0b // 16 * 16 + GAP
        enb = jnp.minimum((en0b + 16) // 16 * 16 - 1, Tn - 1) + GAP
        st0bg, en0bg = st0b + GAP, en0b + GAP

        prev_oka = (sta > 0) & (sta - 1 >= lsta) & (sta - 1 <= lena)
        prev_okb = (stb - 1 >= lstb) & (stb - 1 <= lenb)  # stb > 0 always
        bu = jnp.where(
            r == 0, qe_init,
            jnp.where(r < long_thres, c_e,
                      jnp.where(r == long_thres, c_ld, c_e2)),
        )

        # edge-lane init at t == r, for BOTH halves: when tlen > qlen the
        # diamond's leading edge extends past wavefront H into the second
        # half (B's edge sits at global lane GAP + rB, which only matches
        # while rB <= en, i.e. rB < tlen + 16)
        at_edge = (lanes == r) & (ena >= r) & livea
        y = jnp.where(at_edge, qe_init, y)
        y2 = jnp.where(at_edge, qe2_init, y2)
        u = jnp.where(at_edge, bu, u)
        bub = jnp.where(rB < long_thres, c_e,
                        jnp.where(rB == long_thres, c_ld, c_e2))
        at_edgeb = (lanes == rB + GAP) & (enb >= rB + GAP) & liveb
        y = jnp.where(at_edgeb, qe_init, y)
        y2 = jnp.where(at_edgeb, qe2_init, y2)
        u = jnp.where(at_edgeb, bub, u)

        # frontier reset: lane r+16 returns to 'never touched' init values
        # (B abandoned it by step r-2; A first reads it at step r+1) and
        # the mixed target vector flips that lane to A's code
        rst = lanes == (r + 16)
        u = jnp.where(rst, qe_init, u)
        v = jnp.where(rst, qe_init, v)
        x = jnp.where(rst, qe_init, x)
        y = jnp.where(rst, qe_init, y)
        x2 = jnp.where(rst, qe2_init, x2)
        y2 = jnp.where(rst, qe2_init, y2)
        s = jnp.where(rst, sdt(0), s)
        tmix = jnp.where(rst, t_new, tmix)

        # substitution scores for both halves' 16-blocks
        span16a = (en0a - st0a) // 16 * 16 + 16
        in_sa = (lanes >= st0a) & (lanes < st0a + span16a) & livea
        span16b = (en0b - st0b) // 16 * 16 + 16
        in_sb = (lanes >= st0bg) & (lanes < st0bg + span16b) & liveb
        in_s = in_sa | in_sb
        qi_oka = (lanes <= r) & ((r - lanes) < qla)
        idxb = (rB + GAP) - lanes  # B's query index at this lane
        qi_okb = (idxb >= 0) & (idxb < qlb)
        qv = jnp.where(qi_oka | qi_okb, qv_win, 0)
        nmask = (tmix == 4) | (qv == 4)
        sval = jnp.where(tmix == qv, c_mch, c_mis)
        sval = jnp.where(nmask, c_n, sval)
        s = jnp.where(in_s, sval, s)

        in_ala = (lanes >= sta) & (lanes <= ena) & livea
        in_alb = (lanes >= stb) & (lanes <= enb) & liveb
        in_al = in_ala | in_alb
        x_prev = _roll1(x)
        v_prev = _roll1(v)
        x2_prev = _roll1(x2)
        at_sta = lanes == sta
        at_stb = lanes == stb
        bad = (at_sta & ~prev_oka) | (at_stb & ~prev_okb)
        x_prev = jnp.where(bad, qe_init, x_prev)
        x2_prev = jnp.where(bad, qe2_init, x2_prev)
        v_bnda = jnp.where(sta > 0, jnp.where(prev_oka, v_prev, qe_init),
                           jnp.broadcast_to(bu, v_prev.shape))
        v_prev = jnp.where(at_sta, v_bnda, v_prev)
        v_prev = jnp.where(at_stb & ~prev_okb, qe_init, v_prev)

        zv = s
        a_ = x_prev + v_prev
        b_ = y + u
        a2_ = x2_prev + v_prev
        b2_ = y2 + u
        d = jnp.where(a_ > zv, i1, i0)
        zv = jnp.maximum(zv, a_)
        d = jnp.where(b_ > zv, i2, d)
        zv = jnp.maximum(zv, b_)
        d = jnp.where(a2_ > zv, i3, d)
        zv = jnp.maximum(zv, a2_)
        d = jnp.where(b2_ > zv, i4, d)
        zv = jnp.maximum(zv, b2_)
        zv = jnp.minimum(zv, c_mch)

        u_new = zv - v_prev
        v_new = zv - u
        a_p = a_ - (zv - q)
        b_p = b_ - (zv - q)
        a2_p = a2_ - (zv - q2)
        b2_p = b2_ - (zv - q2)
        d = d | jnp.where(a_p > 0, b08, i0)
        d = d | jnp.where(b_p > 0, b10, i0)
        d = d | jnp.where(a2_p > 0, b20, i0)
        d = d | jnp.where(b2_p > 0, b40, i0)

        u2 = jnp.where(in_al, u_new, u)
        v2 = jnp.where(in_al, v_new, v)
        x = jnp.where(in_al, jnp.maximum(a_p, 0) - (q + e), x)
        y = jnp.where(in_al, jnp.maximum(b_p, 0) - (q + e), y)
        x2 = jnp.where(in_al, jnp.maximum(a2_p, 0) - (q2 + e2), x2)
        y2 = jnp.where(in_al, jnp.maximum(b2_p, 0) - (q2 + e2), y2)
        u, v = u2, v2
        d_out = jnp.where(in_al, d, i0)
        dirs_ref[uu, :, :] = d_out.astype(jnp.uint8)

        # approximate-H0 tracking for both halves via ONE gather each:
        # val_arr pre-selects the value the greedy step will add (max of
        # v[lt]/u[lt+1] when both are in-band, else the in-band one), with
        # the comparison bit packed into bit 0, so the masked-reduction
        # gather runs once per half instead of twice
        u2m1 = jnp.where(lanes == T - 1, u2, _rollm1(u2))  # u2[min(t+1,T-1)]
        mx = jnp.maximum(v2, u2m1)
        cmp_ = (v2 > u2m1).astype(i32)
        for half in (0, 1):
            if half == 0:
                H0h, lth, st0h, en0h, liveh, firsth = (
                    H0a, lta, st0a, en0a, livea, r == 0)
            else:
                H0h, lth, st0h, en0h, liveh, firsth = (
                    H0b, ltb, st0bg, en0bg, liveb, None)
            lt_in = (lth >= st0h) & (lth <= en0h)
            lt1_in = (lth + 1 >= st0h) & (lth + 1 <= en0h)
            both = lt_in & lt1_in
            val = jnp.where(both, mx, jnp.where(lt_in, v2, u2m1))
            combo = (val.astype(i32) << 1) | cmp_
            gv = _row_gather(combo, lth, 0)
            inc = gv >> 1
            d0gt = (gv & 1) != 0
            H0_new = H0h + inc
            lt_new = jnp.where(both, jnp.where(d0gt, lth, lth + 1),
                               jnp.where(lt_in, lth, lth + 1))
            if half == 0:
                H0a = jnp.where(livea, jnp.where(
                    firsth, v2[:, 0:1].astype(i32) - (q + e), H0_new), H0a)
                lta = jnp.where(livea, jnp.where(firsth, 0, lt_new), lta)
            else:
                H0b = jnp.where(liveb, H0_new, H0b)
                ltb = jnp.where(liveb, lt_new, ltb)

        hit_enda = livea & (r == qla + tla - 2) & (en0a == tla - 1)
        scoa = jnp.where(hit_enda, H0a, scoa)
        hit_endb = liveb & (rB == qlb + tlb - 2) & (en0b == tlb - 1)
        scob = jnp.where(hit_endb, H0b, scob)
        lsta = jnp.where(livea, sta, lsta)
        lena = jnp.where(livea, ena, lena)
        lstb = jnp.where(liveb, stb, lstb)
        lenb = jnp.where(liveb, enb, lenb)

    u_s[:, :] = u
    v_s[:, :] = v
    x_s[:, :] = x
    y_s[:, :] = y
    x2_s[:, :] = x2
    y2_s[:, :] = y2
    s_s[:, :] = s
    tm_s[:, :] = tmix
    sc = sc_s[:, :]
    for c, val in ((0, H0a), (1, lta), (2, lsta), (3, lena), (4, scoa),
                   (8, H0b), (9, ltb), (10, lstb), (11, lenb), (12, scob)):
        sc = jnp.where(cols == c, val, sc)
    sc_s[:, :] = sc

    @pl.when(g == G - 1)
    def _fin():  # the pass's SECOND-half candidate just completed
        score_ref[:, :] = jnp.broadcast_to(scob, (NB, 128))


@partial(jax.jit, static_argnames=("params", "Lmax", "Lt", "band_budget",
                                   "interpret", "unroll", "state_dtype",
                                   "fold"))
def extd2_batch_pallas(
    query: jnp.ndarray,  # [N, Lmax] uint8 codes
    target: jnp.ndarray,  # [N, Lt|Lmax] uint8 codes
    lens: jnp.ndarray,  # [N] int32 qlens (also tlens when tlens is None)
    band: jnp.ndarray,  # [N] int32
    params: tuple,  # static (a, b, q, e, q2, e2)
    Lmax: int,
    tlens: jnp.ndarray | None = None,  # [N] int32 target lengths
    Lt: int | None = None,  # static target budget (defaults to Lmax)
    band_budget: int | None = None,  # static max bandwidth: enables the
    # banded lane window (compute + dirs IO shrink from T to ~band lanes)
    interpret: bool = False,
    unroll: int = DP_UNROLL,  # wavefronts per grid step (the long-read
    # buckets use 8: their cost is grid-step overhead, not lane math)
    state_dtype: str = "int32",  # "int16": halve the lane-state width —
    # the difference formulation bounds every lane value by a few gap
    # costs (the reference's 8-bit SIMD lanes exploit the same bound,
    # ksw2_extd2_sse.c:34), so int16 is exact for every real preset;
    # per-row H0/score scalars stay int32. 2x VPU throughput + 2x NB.
    fold: bool = False,  # time-fold two half-diamonds per kernel row
    # (_dp_kernel_fold): ~2x counted cells per step when band >= min(qlen,
    # tlen) makes the banded window useless (the short-read shape). Mutually
    # exclusive with the banded lane window; dirs comes back in the folded
    # [(C+1)*H, Nrows, T] layout for _backtrack_antidiag(fold_lt=...).
):
    """Returns (score [N], dirs [N, R, Wd] u8, offs [N, R], off_ends [N, R])
    with Wd = the banded window width when band_budget is set, else T.

    R = Lmax+Lt-1 rounded up to the unroll granularity; T = Lt rounded up
    to 128. Windowed dirs columns are lane (i - window_base(r)) — the
    device backtrack recomputes the base in closed form.

    fold=True: dirs is returned in the RAW folded layout [(C+1)*H, Nrows,
    T_fold] (candidate n = c*Nrows + k; wavefront r of candidate (k, c)
    lives at dirs[c*H + r, k, lane + (FOLD_GAP if r >= H else 0)]); offs /
    off_ends cover R = 2H wavefronts.
    """
    N = query.shape[0]
    if Lt is None:
        Lt = Lmax
    T = _round_up(Lt, 128)
    TQ = _round_up(Lmax, 128)
    R = _round_up(Lmax + Lt - 1, 8)
    sdt = {"int32": jnp.int32, "int16": jnp.int16}[state_dtype]
    if sdt == jnp.int16:
        # lane values are bounded by a few gap costs (see the docstring);
        # a loose 4x safety bound must still fit int16
        a_, b_, q_, e_, q2_, e2_ = params
        assert 4 * (a_ + b_ + q_ + e_ + q2_ + e2_) < 32767, params
    isz = jnp.dtype(sdt).itemsize
    # candidates per grid program: as many as a ~6 MB VMEM scratch budget
    # allows (7 lane-state arrays + unrolled dirs blocks + double-buffered
    # inputs must fit 16 MB) — larger NB amortizes per-grid-step overhead;
    # int16 state halves the per-lane bytes (7*isz + 4B slack per lane)
    NB = max(8, min(256, (12 << 19) // ((7 * isz + 4) * T) // 16 * 16))
    Npad = _round_up(max(N, NB), NB)
    WB = (window_geometry(band_budget, T, unroll)
          if band_budget is not None else None)
    Wd = WB if WB is not None else T

    a, b, q, e, q2, e2 = params
    if q2 + e2 < q + e:  # ksw2_extd2_sse.c:78
        q, q2, e, e2 = q2, q, e2, e
    long_thres = (q2 - q) // (e - e2) - 1 if e != e2 else 0
    if q2 + e2 + long_thres * e2 > q + e + long_thres * e:
        long_thres += 1
    long_diff = long_thres * (e - e2) - (q2 - q) - e2
    scoring = (a, b, q, e, q2, e2, long_thres, long_diff)

    if fold:
        return _extd2_fold(query, target, lens, band, scoring, Lmax,
                           tlens, Lt, sdt, unroll, interpret)

    # reversed query in an extended buffer: qrev_ext[T + v] = query[TQ-1-v]
    XB = _round_up(T + TQ + (WB if WB is not None else T) + 256, 128)
    qpad = jnp.zeros((Npad, XB), jnp.int32)
    qpad = qpad.at[:N, T + TQ - Lmax : T + TQ].set(
        jnp.flip(query.astype(jnp.int32), axis=1)
    )
    tpad = jnp.zeros((Npad, T), jnp.int32).at[:N, : target.shape[1]].set(
        target.astype(jnp.int32)
    )
    tl = lens if tlens is None else tlens
    meta = jnp.zeros((Npad, 128), jnp.int32)
    meta = meta.at[:N, 0].set(lens.astype(jnp.int32))
    meta = meta.at[:N, 1].set(band.astype(jnp.int32))
    meta = meta.at[:N, 2].set(tl.astype(jnp.int32))

    U = unroll  # wavefronts per grid step: amortizes per-step overhead
    R = _round_up(R, U * 8)
    grid = (Npad // NB, R // U)
    with jax.enable_x64(False):  # index-map literals must trace as i32
        score, dirs = pl.pallas_call(
            partial(_dp_kernel, T=T, TQ=TQ, scoring=scoring, WB=WB,
                    w_max=band_budget or 0, sdt=sdt),
            grid=grid,
            in_specs=[
                pl.BlockSpec((NB, 128), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, XB), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, T), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((NB, 128), lambda i, g: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((U, NB, Wd), lambda i, g: (g, i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Npad, 128), jnp.int32),
                jax.ShapeDtypeStruct((R, Npad, Wd), jnp.uint8),
            ],
            scratch_shapes=[
                pltpu.VMEM((NB, T), sdt),  # u
                pltpu.VMEM((NB, T), sdt),  # v
                pltpu.VMEM((NB, T), sdt),  # x
                pltpu.VMEM((NB, T), sdt),  # y
                pltpu.VMEM((NB, T), sdt),  # x2
                pltpu.VMEM((NB, T), sdt),  # y2
                pltpu.VMEM((NB, T), sdt),  # s
                pltpu.VMEM((NB, 128), jnp.int32),  # per-row scalars
            ],
            interpret=interpret,
        )(meta, qpad, tpad)

    # band geometry is a closed form of (r, qlen, tlen, band): computed
    # outside the kernel (ksw2_extd2_sse.c:121-137)
    r_idx = jnp.arange(R, dtype=jnp.int32)[None, :]
    qlen_c = lens.astype(jnp.int32)[:, None]
    tlen_c = tl.astype(jnp.int32)[:, None]
    w_c = band.astype(jnp.int32)[:, None]
    st0 = jnp.maximum(jnp.maximum(0, r_idx - qlen_c + 1), (r_idx - w_c + 1) >> 1)
    en0 = jnp.minimum(jnp.minimum(tlen_c - 1, r_idx), (r_idx + w_c) >> 1)
    live = (st0 <= en0) & (r_idx < qlen_c + tlen_c - 1) & (qlen_c > 0)
    st_al = st0 // 16 * 16
    en_al = jnp.minimum((en0 + 16) // 16 * 16 - 1, T - 1)
    offs = jnp.where(live, st_al, T).astype(jnp.int32)
    offe = jnp.where(live, en_al, -1).astype(jnp.int32)
    return score[:N, 0], dirs.transpose(1, 0, 2)[:N], offs, offe


def _extd2_fold(query, target, lens, band, scoring, Lmax, tlens, Lt,
                sdt, unroll, interpret):
    """Folded-mode driver: shapes the candidate stream into Nrows pipeline
    rows x C passes (+1 drain pass), builds the dual-layout query buffer,
    and runs _dp_kernel_fold. Candidate n maps to (c = n // Nrows,
    k = n % Nrows); see extd2_batch_pallas's fold docstring for the dirs
    layout contract consumed by the folded backtrack."""
    N = query.shape[0]
    U = unroll
    H, T, Tn = fold_geometry(Lmax, Lt, U)
    TQ = _round_up(Lmax, 128)
    isz = jnp.dtype(sdt).itemsize
    # VMEM budget: tighter than the unfolded kernel (the mixed-target lane
    # array + the dual-layout query block push NB=256 ~3 MB past the 16 MB
    # scoped-vmem limit at T=256; 192 leaves ~2 MB headroom, measured)
    NB = max(8, min(192, (10 << 19) // ((7 * isz + 8) * T) // 16 * 16))
    # rows/passes split: ~FOLD_PASSES candidates per row bounds the drain-
    # pass overhead at ~1/FOLD_PASSES while keeping rows a multiple of NB
    Nrows = _round_up(max(1, -(-N // FOLD_PASSES)), NB)
    C = max(1, -(-N // Nrows))
    Npad = Nrows * C
    C0 = T + TQ - 1
    XB = _round_up(max(C0 + 1 + T + 128, C0 + 1 + H + FOLD_GAP) + 128, 128)

    qr = jnp.zeros((Npad, Lmax), jnp.int32).at[:N].set(
        query.astype(jnp.int32))
    qflip = jnp.flip(qr.reshape(C, Nrows, Lmax), axis=2)
    qpad = jnp.zeros((C + 1, Nrows, XB), jnp.int32)
    # first-half layout: reversed query below C0 (as the unfolded kernel)
    qpad = qpad.at[:C, :, T + TQ - Lmax : T + TQ].set(qflip)
    # second-half layout for the NEXT pass: buf[C0+H+GAP-i] = query[i]
    qpad = qpad.at[1:, :, C0 + H + FOLD_GAP - Lmax + 1 :
                   C0 + H + FOLD_GAP + 1].set(qflip)
    qpad = qpad.reshape((C + 1) * Nrows, XB)

    Lt_in = target.shape[1]
    tr = jnp.zeros((Npad, Lt_in), jnp.int32).at[:N].set(
        target.astype(jnp.int32))
    tpad = jnp.zeros((C + 1, Nrows, T), jnp.int32)
    tpad = tpad.at[:C, :, :Lt_in].set(tr.reshape(C, Nrows, Lt_in))
    tpad = tpad.reshape((C + 1) * Nrows, T)

    tl = lens if tlens is None else tlens
    meta = jnp.zeros((Npad, 128), jnp.int32)
    meta = meta.at[:N, 0].set(lens.astype(jnp.int32))
    meta = meta.at[:N, 1].set(band.astype(jnp.int32))
    meta = meta.at[:N, 2].set(tl.astype(jnp.int32))
    meta = jnp.concatenate(  # drain pass: no new first-half candidate
        [meta.reshape(C, Nrows, 128),
         jnp.zeros((1, Nrows, 128), jnp.int32)]).reshape(-1, 128)

    nb_i = Nrows // NB
    grid = (nb_i, C + 1, H // U)
    with jax.enable_x64(False):
        score, dirs = pl.pallas_call(
            partial(_dp_kernel_fold, T=T, Tn=Tn, TQ=TQ, H=H,
                    scoring=scoring, sdt=sdt),
            grid=grid,
            in_specs=[
                pl.BlockSpec((NB, 128), lambda i, p, g: (p * nb_i + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, XB), lambda i, p, g: (p * nb_i + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((NB, T), lambda i, p, g: (p * nb_i + i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((NB, 128), lambda i, p, g: (p * nb_i + i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((U, NB, T),
                             lambda i, p, g: (p * (H // U) + g, i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(((C + 1) * Nrows, 128), jnp.int32),
                jax.ShapeDtypeStruct(((C + 1) * H, Nrows, T), jnp.uint8),
            ],
            scratch_shapes=[
                pltpu.VMEM((NB, T), sdt),  # u
                pltpu.VMEM((NB, T), sdt),  # v
                pltpu.VMEM((NB, T), sdt),  # x
                pltpu.VMEM((NB, T), sdt),  # y
                pltpu.VMEM((NB, T), sdt),  # x2
                pltpu.VMEM((NB, T), sdt),  # y2
                pltpu.VMEM((NB, T), sdt),  # s
                pltpu.VMEM((NB, T), jnp.int32),  # mixed target codes
                pltpu.VMEM((NB, 128), jnp.int32),  # per-row scalars A+B
            ],
            interpret=interpret,
        )(meta, qpad, tpad)

    # candidate (k, c) score was written at the end of pass c+1
    score = score[Nrows:, 0][:N]

    R2 = 2 * H
    r_idx = jnp.arange(R2, dtype=jnp.int32)[None, :]
    qlen_c = lens.astype(jnp.int32)[:, None]
    tlen_c = tl.astype(jnp.int32)[:, None]
    w_c = band.astype(jnp.int32)[:, None]
    st0 = jnp.maximum(jnp.maximum(0, r_idx - qlen_c + 1),
                      (r_idx - w_c + 1) >> 1)
    en0 = jnp.minimum(jnp.minimum(tlen_c - 1, r_idx), (r_idx + w_c) >> 1)
    live = (st0 <= en0) & (r_idx < qlen_c + tlen_c - 1) & (qlen_c > 0)
    st_al = st0 // 16 * 16
    en_al = jnp.minimum((en0 + 16) // 16 * 16 - 1, Tn - 1)
    offs = jnp.where(live, st_al, Tn).astype(jnp.int32)
    offe = jnp.where(live, en_al, -1).astype(jnp.int32)
    return score, dirs, offs, offe
