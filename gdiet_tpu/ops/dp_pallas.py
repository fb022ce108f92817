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
~5.1 GCUPS = ~40% of the op-count ceiling; the residual gap is grid-step
overhead, the three pltpu.roll ops (multi-instruction on Mosaic), and the
windowed scratch store-backs. Levers toward the ceiling, in order of
expected payoff: (1) halve the padding factor by packing two 150-cell
candidates per 256-lane row (or 16-lane-bucketing tlen), (2) int16 state
lanes where the SR score envelope provably fits (doubles VPU lanes),
(3) eliding dirs writes for rows the caller marks sub-only. For
comparison, the reference's 1-core AVX-512 kernel (ksw2_extd2_avx.c:72)
reaches ~1-2 GCUPS on this recurrence; one TPU core at 5.1 GCUPS already
exceeds it, and the SR pipeline amortizes DP under dp_frac anyway.

Lever (2) status: ``state_dtype="int16"`` is implemented and bit-parity
tested in interpreter mode (tests/test_dp_pallas.py), but the current
Mosaic lowering blocks the hot path on real hardware: no int16
reductions, no int16 lane rotates (both worked around here by casting
through int32), and i1 mask relayout (8,128)->(16,128) errors when
(8,128)-layout comparisons (lane iota vs row scalars) feed (16,128)
int16 selects. A full flip needs the lane-index comparisons rebuilt in
int16 (safe for T <= 8192 with clamped row scalars) — and whether Mosaic
executes packed-i16 ALU ops at 2x or emulates them (a potential LOSS) is
unverified, so the default stays int32.
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


@partial(jax.jit, static_argnames=("params", "Lmax", "Lt", "band_budget",
                                   "interpret", "unroll", "state_dtype"))
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
):
    """Returns (score [N], dirs [N, R, Wd] u8, offs [N, R], off_ends [N, R])
    with Wd = the banded window width when band_budget is set, else T.

    R = Lmax+Lt-1 rounded up to the unroll granularity; T = Lt rounded up
    to 128. Windowed dirs columns are lane (i - window_base(r)) — the
    device backtrack recomputes the base in closed form.
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
