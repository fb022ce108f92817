"""Cuckoo hash probe table for the device index lookup.

The CSR lookup (mm_idx_get, index.c:84-100) on device was a bucketed
binary search: ~4-6 DEPENDENT random gathers per probe — a serial chain of
HBM round trips that dominates collect_hits. A 2-table cuckoo hash answers
every probe with 4 gathers in 2 INDEPENDENT rounds (k1/v1 ∥ k2/v2), cutting
both element count and, more importantly, the serial depth.

Layout: one array of 2T slots; h1 addresses [0, T), h2 addresses [T, 2T).
Keys are the 2k-bit invertible minimizer hashes (sketch.c:25-34 analog);
values are the packed CSR (start << 24 | count) from index.build.lookup_vals.
Memory: 2T * 16 bytes with T = 2^ceil(log2(1.1 * nk)) — ~2.2-4x the packed
CSR key+val arrays; at GRCh38 scale (~150 M keys) about 4.8 GB HBM, paid
back by the 2-bit sequence pack (device_step.pack_ref_codes).

Build is a vectorized parallel random-walk eviction (numpy): each round the
unplaced keys scatter-claim their slot on one side (last write wins),
losers and evicted occupants retry on the other side next round. Converges
w.h.p. in O(log n) rounds at total load <= 0.5; on a cycle the build
retries with fresh hash constants.
"""

from __future__ import annotations

import numpy as np

EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)

# odd 64-bit multiplicative constants (splitmix64 / Fibonacci-style)
_DEFAULT_C = (0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9)
_RETRY_C = (
    (0x94D049BB133111EB, 0x2545F4914F6CDD1D),
    (0xD6E8FEB86659FD93, 0xA5A5A5A5A5A5A5A7),
    (0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9),
)


def _h(keys: np.ndarray, c: int, log_t: int) -> np.ndarray:
    return ((keys * np.uint64(c)) >> np.uint64(64 - log_t)).astype(np.int64)


def build_cuckoo(keys: np.ndarray, vals: np.ndarray, max_rounds: int = 256):
    """Place (keys, vals) into a 2T-slot cuckoo table.

    Returns (tbl_keys [2T] u64, tbl_vals [2T] u64, c1, c2, log_t).
    """
    keys = np.asarray(keys, np.uint64)
    vals = np.asarray(vals, np.uint64)
    nk = len(keys)
    log_t = max(4, int(np.ceil(np.log2(max(nk, 1) * 1.1 + 1))))
    T = 1 << log_t

    for c1, c2 in (_DEFAULT_C, *_RETRY_C):
        tbl_k = np.full(2 * T, EMPTY, np.uint64)
        tbl_v = np.zeros(2 * T, np.uint64)
        cur_k, cur_v = keys, vals
        side = 0
        ok = False
        for _ in range(max_rounds):
            if len(cur_k) == 0:
                ok = True
                break
            base = side * T
            slot = base + _h(cur_k, c1 if side == 0 else c2, log_t)
            old_k = tbl_k[slot]
            old_v = tbl_v[slot]
            tbl_k[slot] = cur_k  # last write per slot wins
            tbl_v[slot] = cur_v
            won = tbl_k[slot] == cur_k
            # winners are unique per slot, so their gathered old occupants
            # are each evicted exactly once
            ev = old_k[won]
            evv = old_v[won]
            live = ev != EMPTY
            cur_k = np.concatenate([cur_k[~won], ev[live]])
            cur_v = np.concatenate([cur_v[~won], evv[live]])
            side ^= 1
        if ok:
            return tbl_k, tbl_v, c1, c2, log_t
    raise RuntimeError(
        f"cuckoo build failed for {nk} keys at log_t={log_t} "
        "(all hash-constant retries exhausted)"
    )


def probe_host(tbl_k, tbl_v, c1, c2, log_t, q):
    """Reference host-side probe (for tests)."""
    q = np.asarray(q, np.uint64)
    T = 1 << log_t
    s1 = _h(q, c1, log_t)
    s2 = T + _h(q, c2, log_t)
    out = np.zeros(len(q), np.uint64)
    m1 = tbl_k[s1] == q
    m2 = tbl_k[s2] == q
    out[m2] = tbl_v[s2][m2]
    out[m1] = tbl_v[s1][m1]
    return out, m1 | m2
