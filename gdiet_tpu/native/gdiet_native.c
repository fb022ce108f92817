/* Native host runtime for gdiet_tpu.
 *
 * The reference's host runtime is C (bseq.c readers, kalloc arenas, kthread
 * pools); the TPU rebuild keeps the device path in JAX/Pallas and gives the
 * host-side hot loops native implementations, bound via ctypes:
 *
 *   - encode_batch: ASCII reads -> nt4 code matrix (bseq/seq_nt4_table path)
 *   - rle_ops:      device-backtracked op streams -> packed CIGARs
 *                   (the host half of ksw_backtrack, ksw2.h:131-163)
 *   - sam_flags_seq: reverse-complement of ASCII sequences (mm_revcomp_bseq)
 *
 * Build: cc -O3 -shared -fPIC gdiet_native.c -o gdiet_native.so
 */

#include <stdint.h>
#include <string.h>

static unsigned char seq_nt4_table[256];
static unsigned char comp_table[256];

__attribute__((constructor)) static void init_tables(void) {
    memset(seq_nt4_table, 4, 256);
    seq_nt4_table['A'] = seq_nt4_table['a'] = 0;
    seq_nt4_table['C'] = seq_nt4_table['c'] = 1;
    seq_nt4_table['G'] = seq_nt4_table['g'] = 2;
    seq_nt4_table['T'] = seq_nt4_table['t'] = 3;
    for (int i = 0; i < 256; i++) comp_table[i] = (unsigned char)i;
    const char *f = "ACGTUacgtuRYSWKMBDHVN";
    const char *r = "TGCAAtgcaaYRSWMKVHDBN";
    for (int i = 0; f[i]; i++) comp_table[(unsigned char)f[i]] = (unsigned char)r[i];
}

/* reads: concatenated ASCII bases; offsets: n+1 entries into reads.
 * out: [n, lmax] uint8 prefilled by caller (255 padding). lens: [n]. */
void encode_batch(const char *reads, const int64_t *offsets, int64_t n,
                  int64_t lmax, uint8_t *out, int64_t *lens) {
    for (int64_t i = 0; i < n; i++) {
        const char *s = reads + offsets[i];
        int64_t l = offsets[i + 1] - offsets[i];
        if (l > lmax) l = lmax;
        uint8_t *row = out + i * lmax;
        for (int64_t j = 0; j < l; j++) row[j] = seq_nt4_table[(uint8_t)s[j]];
        lens[i] = offsets[i + 1] - offsets[i];
    }
}

/* ops: [n, smax] op codes (0=M,1=I,2=D, >=3 padding) back-to-front.
 * fin_i/fin_j: leading-gap leftovers. Output: packed (len<<4|op) uint32
 * runs written front-to-back into out[i*max_runs ...]; n_runs[i] = count.
 * Returns 0, or 1 if any row overflowed max_runs. */
int rle_ops(const uint8_t *ops, int64_t n, int64_t smax,
            const int32_t *fin_i, const int32_t *fin_j, const int64_t *lens,
            uint32_t *out, int64_t max_runs, int32_t *n_runs) {
    int overflow = 0;
    for (int64_t r = 0; r < n; r++) {
        const uint8_t *row = ops + r * smax;
        uint32_t *dst = out + r * max_runs;
        int64_t m = 0; /* runs collected (back-to-front) */
        if (lens[r] > 0) {
            int64_t j = 0;
            while (j < smax && row[j] < 3) {
                uint8_t op = row[j];
                int64_t len = 0;
                while (j < smax && row[j] == op) { len++; j++; }
                if (m < max_runs) dst[m] = ((uint32_t)len << 4) | op;
                m++;
            }
            if (fin_i[r] >= 0) { /* leading deletion leftover */
                if (m > 0 && m <= max_runs && (dst[m - 1] & 0xf) == 2)
                    dst[m - 1] += ((uint32_t)(fin_i[r] + 1)) << 4;
                else { if (m < max_runs) dst[m] = ((uint32_t)(fin_i[r] + 1) << 4) | 2; m++; }
            }
            if (fin_j[r] >= 0) { /* leading insertion leftover */
                if (m > 0 && m <= max_runs && (dst[m - 1] & 0xf) == 1)
                    dst[m - 1] += ((uint32_t)(fin_j[r] + 1)) << 4;
                else { if (m < max_runs) dst[m] = ((uint32_t)(fin_j[r] + 1) << 4) | 1; m++; }
            }
            if (m > max_runs) { overflow = 1; m = max_runs; }
            /* reverse into front-to-back order */
            for (int64_t a = 0, b = m - 1; a < b; a++, b--) {
                uint32_t t = dst[a]; dst[a] = dst[b]; dst[b] = t;
            }
        }
        n_runs[r] = (int32_t)m;
    }
    return overflow;
}

/* in-place reverse complement of an ASCII sequence */
void revcomp_ascii(char *seq, int64_t l) {
    for (int64_t a = 0, b = l - 1; a <= b; a++, b--) {
        char x = (char)comp_table[(uint8_t)seq[a]];
        char y = (char)comp_table[(uint8_t)seq[b]];
        seq[a] = y;
        seq[b] = x;
    }
}

/* float32 bit-trick approximate log2 (reference mmpriv.h:146-157) */
static float mg_log2f(float x) {
    union { float f; uint32_t i; } z;
    z.f = x;
    float log_2 = (float)((int)((z.i >> 23) & 255) - 128);
    z.i = (z.i & ~(255u << 23)) + (127u << 23);
    float f = z.f;
    return log_2 + (-0.34484843f * f + 2.02466578f) * f - 0.67487759f;
}

/* mm_update_extra's rescoring scan (reference align.c:259-318): walk the
 * CIGAR over the aligned query/target windows accumulating blen/mlen/
 * n_ambi and the clamped running local max of the rescented alignment
 * score. cigar ops are packed len<<4|op (0=M 1=I 2=D 3=N). Returns
 * blen, mlen, n_ambi, dp_max, qoff, toff in out[0..5]. */
void update_extra_scan(const uint8_t *qseq, const uint8_t *tseq,
                       const uint32_t *cigar, int64_t n_cigar,
                       int64_t a, int64_t b, int64_t q, int64_t e,
                       int log_gap, int64_t *out) {
    double s = 0.0, mx = 0.0;
    int64_t blen = 0, mlen = 0, n_ambi_tot = 0, qoff = 0, toff = 0;
    double babs = b < 0 ? (double)(-b) : (double)b;
    for (int64_t ci = 0; ci < n_cigar; ci++) {
        int64_t len = (int64_t)(cigar[ci] >> 4);
        int op = (int)(cigar[ci] & 0xf);
        if (op == 0) {
            int64_t n_ambi = 0, n_diff = 0;
            for (int64_t j = 0; j < len; j++) {
                uint8_t cq = qseq[qoff + j], ct = tseq[toff + j];
                double c;
                if (cq > 3 || ct > 3) {
                    n_ambi++;
                    c = 0.0;
                } else {
                    if (cq != ct) n_diff++;
                    c = cq == ct ? (double)a : -babs;
                }
                s += c;
                if (s < 0) s = 0.0;
                else if (s > mx) mx = s;
            }
            blen += len - n_ambi;
            mlen += len - (n_ambi + n_diff);
            n_ambi_tot += n_ambi;
            qoff += len;
            toff += len;
        } else if (op == 1) {
            int64_t n_ambi = 0;
            for (int64_t j = 0; j < len; j++)
                if (qseq[qoff + j] > 3) n_ambi++;
            blen += len - n_ambi;
            n_ambi_tot += n_ambi;
            s -= (double)q + (log_gap
                ? (double)e * (double)mg_log2f((float)(1.0 + (double)len))
                : (double)e);
            if (s < 0) s = 0.0;
            qoff += len;
        } else if (op == 2) {
            int64_t n_ambi = 0;
            for (int64_t j = 0; j < len; j++)
                if (tseq[toff + j] > 3) n_ambi++;
            blen += len - n_ambi;
            n_ambi_tot += n_ambi;
            s -= (double)q + (log_gap
                ? (double)e * (double)mg_log2f((float)(1.0 + (double)len))
                : (double)e);
            if (s < 0) s = 0.0;
            toff += len;
        } else if (op == 3) {
            toff += len;
        }
    }
    out[0] = blen;
    out[1] = mlen;
    out[2] = n_ambi_tot;
    out[3] = (int64_t)(mx + 0.499);
    out[4] = qoff;
    out[5] = toff;
}

/* batched update_extra_scan over flat buffers: record i reads
 * qbuf[qoffs[i]..], tbuf[toffs[i]..], cigbuf[cigoffs[i] .. +cign[i]] and
 * writes out[i*6 .. i*6+5]. One library call per mapped batch. */
void update_extra_batch(const uint8_t *qbuf, const int64_t *qoffs,
                        const uint8_t *tbuf, const int64_t *toffs,
                        const uint32_t *cigbuf, const int64_t *cigoffs,
                        const int64_t *cign, int64_t n,
                        int64_t a, int64_t b, int64_t q, int64_t e,
                        int log_gap, int64_t *out) {
    for (int64_t i = 0; i < n; i++)
        update_extra_scan(qbuf + qoffs[i], tbuf + toffs[i],
                          cigbuf + cigoffs[i], cign[i],
                          a, b, q, e, log_gap, out + i * 6);
}

/* mm_fix_cigar (reference align.c:93-172): left-shift gaps whose preceding
 * match tail equals the gap tail, squash I/D alternations, drop zero-length
 * runs, merge equal neighbours, and strip one leading I/D. cig is packed
 * len<<4|op, modified in place; returns the new op count and reports the
 * stripped leading op/len via lead_op/lead_len (0 = none). */
static int64_t fix_cigar_c(uint32_t *cig, int64_t n,
                           const uint8_t *qseq, const uint8_t *tseq,
                           int64_t *lead_op, int64_t *lead_len) {
    *lead_op = 0;
    *lead_len = 0;
    if (n <= 1) return n;
    int64_t toff = 0, qoff = 0;
    int to_shrink = 0;
    for (int64_t k = 0; k < n; k++) {
        int64_t len = cig[k] >> 4;
        int op = cig[k] & 0xf;
        if (len == 0) to_shrink = 1;
        if (op == 0) {
            toff += len;
            qoff += len;
        } else if (op == 1 || op == 2) {
            if (k > 0 && k < n - 1 && (cig[k - 1] & 0xf) == 0
                    && (cig[k + 1] & 0xf) == 0) {
                int64_t prev_len = cig[k - 1] >> 4;
                int64_t l = 0;
                if (op == 1) {
                    while (l < prev_len &&
                           qseq[qoff - 1 - l] == qseq[qoff + len - 1 - l]) l++;
                } else {
                    while (l < prev_len &&
                           tseq[toff - 1 - l] == tseq[toff + len - 1 - l]) l++;
                }
                if (l > 0) {
                    cig[k - 1] -= (uint32_t)(l << 4);
                    cig[k + 1] += (uint32_t)(l << 4);
                    qoff -= l;
                    toff -= l;
                }
                if (l == prev_len) to_shrink = 1;
            }
            if (op == 1) qoff += len; else toff += len;
        } else if (op == 3) {
            toff += len;
        }
    }
    /* squash I/D alternations like 5I6D7I (align.c:127-146) */
    int64_t k = 0;
    while (k + 2 < n) {
        int opk = cig[k] & 0xf, opk1 = cig[k + 1] & 0xf;
        if (opk > 0 && opk + opk1 == 3) {
            int64_t s1 = 0, s2 = 0, l = k;
            while (l < n) {
                int op = cig[l] & 0xf;
                int64_t ln = cig[l] >> 4;
                if (op == 1 || op == 2 || ln == 0) {
                    if (op == 1) s1 += ln;
                    else if (op == 2) s2 += ln;
                    l++;
                } else break;
            }
            if (s1 > 0 && s2 > 0 && l - k > 2) {
                cig[k] = ((uint32_t)s1 << 4) | 1u;
                cig[k + 1] = ((uint32_t)s2 << 4) | 2u;
                for (int64_t kk = k + 2; kk < l; kk++) cig[kk] &= 0xfu;
                to_shrink = 1;
            }
            k = l + 1;
        } else {
            k++;
        }
    }
    if (to_shrink) {
        int64_t m = 0;
        for (int64_t i = 0; i < n; i++) {
            if ((cig[i] >> 4) == 0) continue;
            if (m > 0 && (cig[m - 1] & 0xf) == (cig[i] & 0xf))
                cig[m - 1] += (cig[i] >> 4) << 4;
            else
                cig[m++] = cig[i];
        }
        n = m;
    }
    if (n > 0 && ((cig[0] & 0xf) == 1 || (cig[0] & 0xf) == 2)) {
        *lead_op = cig[0] & 0xf;
        *lead_len = cig[0] >> 4;
        for (int64_t i = 1; i < n; i++) cig[i - 1] = cig[i];
        n--;
    }
    return n;
}

/* fused mm_fix_cigar + rescoring scan over a whole batch. cigbuf and cign
 * are modified in place; out has 8 slots per record:
 * blen mlen n_ambi dp_max qoff toff lead_op lead_len. */
void update_extra_full_batch(const uint8_t *qbuf, const int64_t *qoffs,
                             const uint8_t *tbuf, const int64_t *toffs,
                             uint32_t *cigbuf, const int64_t *cigoffs,
                             int64_t *cign, int64_t nrec,
                             int64_t a, int64_t b, int64_t q, int64_t e,
                             int log_gap, int64_t *out) {
    for (int64_t i = 0; i < nrec; i++) {
        int64_t lead_op, lead_len;
        int64_t n2 = fix_cigar_c(cigbuf + cigoffs[i], cign[i],
                                 qbuf + qoffs[i], tbuf + toffs[i],
                                 &lead_op, &lead_len);
        cign[i] = n2;
        int64_t qs = lead_op == 1 ? lead_len : 0;
        int64_t ts = lead_op == 2 ? lead_len : 0;
        update_extra_scan(qbuf + qoffs[i] + qs, tbuf + toffs[i] + ts,
                          cigbuf + cigoffs[i], n2, a, b, q, e, log_gap,
                          out + i * 8);
        out[i * 8 + 6] = lead_op;
        out[i * 8 + 7] = lead_len;
    }
}
