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

/* 2-bit pack of an encoded code matrix + N bitmask, the H2D compression
 * of the fused step's combined input tensor (the TPU tunnel is ~100 MB/s;
 * 4 bases/byte + 1 bit/base N-mask cuts the per-batch upload ~2.6x).
 * codes: [n, lmax] u8 (0..3 base, 4 N, 255 pad). packed: [n, lmax/4] u8
 * (pad/N packs as 0). nmask: [n, lmax/8] u8 little-endian bits (1 = N).
 * The device reconstructs pad from lens. lmax must be a multiple of 8. */
void pack_codes_batch(const uint8_t *codes, int64_t n, int64_t lmax,
                      uint8_t *packed, uint8_t *nmask) {
    const int64_t pb = lmax / 4, nb = lmax / 8;
    for (int64_t i = 0; i < n; i++) {
        const uint8_t *row = codes + i * lmax;
        uint8_t *pr = packed + i * pb;
        uint8_t *nr = nmask + i * nb;
        for (int64_t j = 0; j < pb; j++) {
            const uint8_t *c4 = row + 4 * j;
            pr[j] = (uint8_t)((c4[0] & 3) | ((c4[1] & 3) << 2)
                              | ((c4[2] & 3) << 4) | ((c4[3] & 3) << 6));
        }
        for (int64_t j = 0; j < nb; j++) {
            const uint8_t *c8 = row + 8 * j;
            uint8_t m = 0;
            for (int k = 0; k < 8; k++)
                if (c8[k] == 4) m |= (uint8_t)(1u << k);
            nr[j] = m;
        }
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
            /* >=3 entries are holes/padding — skip, merging runs across */
            for (int64_t j = 0; j < smax; j++) {
                uint8_t op = row[j];
                if (op >= 3) continue;
                if (m > 0 && m <= max_runs && (dst[m - 1] & 0xf) == op)
                    dst[m - 1] += 1u << 4;
                else { if (m < max_runs) dst[m] = (1u << 4) | op; m++; }
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

/* ------------------------------------------------------------------ *
 * sr_finish_batch: the whole short-read host finish in one call.
 *
 * Consumes the fused device step's packed output tensor directly and
 * emits final SAM text per read: op-stream RLE (ksw_backtrack host half),
 * CIGAR fix-ups + rescoring (align.c:93-172, 259-318), clip/min_dp_max
 * filters and score insertion sort (map.c:956-979), mm_set_sam_params
 * (hit.c:494-557), and mm_write_sam3 field/tag formatting
 * (format.c:412-602, write_tags format.c:292-324).
 *
 * Reads whose records cannot be finished in the fixed envelope get
 * done[i] = 0 and are finished by the Python oracle path instead.
 * ------------------------------------------------------------------ */

#include <stdio.h>

#define SRF_MAX_CIG 1024
#define SRF_MAX_REGS 16

typedef struct {
    int32_t rid, qs, qe, rs, re, rev;
    int32_t mapq, id, parent, sam_pri, proper_frag;
    int64_t score, dp_score, dp_max, blen, mlen, n_ambi;
    uint32_t cig[SRF_MAX_CIG];
    int64_t n_cig;
} srf_reg_t;

static inline char *srf_put_u64(char *p, uint64_t v) {
    char tmp[24]; int n = 0;
    do { tmp[n++] = (char)('0' + v % 10); v /= 10; } while (v);
    while (n) *p++ = tmp[--n];
    return p;
}
static inline char *srf_put_i64(char *p, int64_t v) {
    if (v < 0) { *p++ = '-'; return srf_put_u64(p, (uint64_t)(-v)); }
    return srf_put_u64(p, (uint64_t)v);
}
static inline char *srf_put_mem(char *p, const char *s, int64_t l) {
    memcpy(p, s, (size_t)l); return p + l;
}
static inline char *srf_put_str(char *p, const char *s) {
    while (*s) *p++ = *s++;
    return p;
}

static const char srf_cigar_str[] = "MIDNSHP=XB";

/* Upper bound on one srf_write_sam record: every variable-length piece
 * (qname, seq, qual, rname, CIGAR text at <=12 chars/op incl. clips, SA
 * entries at rname + <=128 chars each) plus 256 bytes of fixed fields and
 * tags. Guards the out_buf advance — srf_write_sam has no internal check. */
static int64_t srf_rec_bound(const srf_reg_t *r, srf_reg_t *const *regs,
                             int64_t n_regs, int64_t name_len, int64_t qlen,
                             int64_t qual_len, const int64_t *ref_name_offs) {
    int64_t need = name_len + qlen + qual_len + 256;
    if (r == NULL) return need;
    need += ref_name_offs[r->rid + 1] - ref_name_offs[r->rid];
    need += (r->n_cig + 2) * 12;
    if (r->parent == r->id && r->n_cig && n_regs > 1)
        for (int64_t i = 0; i < n_regs; i++) {
            const srf_reg_t *q = regs[i];
            if (q == r || q->parent != q->id || !q->n_cig) continue;
            need += ref_name_offs[q->rid + 1] - ref_name_offs[q->rid] + 128;
        }
    return need;
}

/* mm_event_identity (align.c:961-966) */
static double srf_event_identity(const srf_reg_t *r) {
    int64_t n_gap = 0, n_gapo = 0;
    for (int64_t i = 0; i < r->n_cig; i++) {
        int op = r->cig[i] & 0xf;
        if (op == 1 || op == 2) { n_gapo++; n_gap += r->cig[i] >> 4; }
    }
    int64_t denom = r->blen + r->n_ambi - n_gap + n_gapo;
    return denom ? (double)r->mlen / (double)denom : 0.0;
}

/* mm_set_sam_params (hit.c:494-557) on the sorted reg array */
static void srf_set_sam_params(srf_reg_t **regs, int64_t n, int64_t qlen,
                               int64_t match_a, int64_t max_nb_sec) {
    for (int64_t i = 0; i < n; i++) regs[i]->id = (int32_t)i;
    int64_t supp_threshold = (int64_t)(0.8 * (double)(regs[0]->qe - regs[0]->qs));
    int64_t nb_sec = 0, dp_max2 = 0;
    regs[0]->sam_pri = 1;
    regs[0]->parent = regs[0]->id;
    for (int64_t i = 1; i < n; i++) {
        regs[i]->sam_pri = 0;
        if (regs[i]->qe - regs[i]->qs > supp_threshold) {
            nb_sec++;
            regs[i]->mapq = 0;
            regs[i]->parent = regs[i]->id + 1;
            dp_max2 = regs[i]->score;
        } else {
            regs[i]->mapq = 60;
            regs[i]->parent = regs[i]->id;
        }
    }
    for (int64_t i = 1; i + 1 < n; i++) {       /* hit.c:515-532 */
        if (regs[i]->parent != regs[i]->id) {
            for (int64_t j = i + 1; j < n; j++) {
                if (regs[j]->parent == regs[j]->id) {
                    srf_reg_t *t = regs[i]; regs[i] = regs[j]; regs[j] = t;
                    break;
                } else if (regs[i]->score < regs[j]->score) {
                    srf_reg_t *t = regs[i]; regs[i] = regs[j]; regs[j] = t;
                }
            }
        }
    }
    if (max_nb_sec < nb_sec) nb_sec = max_nb_sec;
    srf_reg_t *r0 = regs[0];
    if (nb_sec > 9) r0->mapq = 0;
    else if (nb_sec > 6) r0->mapq = 1;
    else if (nb_sec > 4) r0->mapq = 2;
    else if (nb_sec == 3) r0->mapq = 3;
    else if (nb_sec == 2) r0->mapq = 5;
    else if (nb_sec == 1) {
        /* hit.c:551-553 evaluates the whole chain in float (identity is
         * float; 54 * identity * ... promotes to float, int-truncated).
         * denom==0 is float div-by-zero in the reference (inf -> UB int
         * cast); mapq 60 here is a deliberate UB-avoiding deviation. */
        int dp_max = (int)r0->score;
        float identity = r0->blen
            ? (float)r0->mlen / (float)r0->blen : 0.0f;
        int denom = (int)(qlen * match_a - dp_max2);
        r0->mapq = denom
            ? (int32_t)(54.0f * identity * (float)(dp_max - (int)dp_max2)
                        / (float)denom + 5.0f)
            : 60;
    } else r0->mapq = 60;
}

/* 2-bit op stream (back-to-front) -> front-to-back packed cigar.
 * Returns run count, or -1 on overflow. */
static int64_t srf_rle(const uint8_t *opbytes, int64_t nbytes,
                       int32_t fin_i, int32_t fin_j, uint32_t *dst) {
    /* 3 entries are holes (idle backtrack iterations) — skip them and
     * merge runs across them */
    int64_t m = 0, total = nbytes * 4;
    for (int64_t j = 0; j < total; j++) {
        int op = (opbytes[j >> 2] >> ((j & 3) * 2)) & 3;
        if (op == 3) continue;
        if (m > 0 && (int)(dst[m - 1] & 0xf) == op) dst[m - 1] += 1u << 4;
        else {
            if (m >= SRF_MAX_CIG) return -1;
            dst[m++] = (1u << 4) | (uint32_t)op;
        }
    }
    if (fin_i >= 0) {
        if (m > 0 && (dst[m - 1] & 0xf) == 2) dst[m - 1] += ((uint32_t)(fin_i + 1)) << 4;
        else { if (m >= SRF_MAX_CIG) return -1; dst[m++] = ((uint32_t)(fin_i + 1) << 4) | 2; }
    }
    if (fin_j >= 0) {
        if (m > 0 && (dst[m - 1] & 0xf) == 1) dst[m - 1] += ((uint32_t)(fin_j + 1)) << 4;
        else { if (m >= SRF_MAX_CIG) return -1; dst[m++] = ((uint32_t)(fin_j + 1) << 4) | 1; }
    }
    for (int64_t x = 0, y = m - 1; x < y; x++, y--) {
        uint32_t t = dst[x]; dst[x] = dst[y]; dst[y] = t;
    }
    return m;
}

/* format one SAM record (mm_write_sam3, format.c:412-602). For paired
 * segments pass n_seg == 2, the segment index and the mate's primary reg
 * (r_next, or NULL if the mate is unmapped) to fill flags
 * 0x1/0x2/0x40/0x80/0x8/0x20 and RNEXT/PNEXT/TLEN (format.c:432-530).
 * Returns the advanced output pointer. */
static char *srf_write_sam(char *p, const srf_reg_t *r,
                           srf_reg_t *const *regs, int64_t n_regs,
                           const char *name, int64_t name_len,
                           const char *seq, int64_t qlen,
                           const char *qual, int64_t qual_len,
                           const char *ref_names_blob,
                           const int64_t *ref_name_offs,
                           int softclip, int64_t rep_len,
                           int n_seg, int seg_idx, const srf_reg_t *r_next) {
    int flag = n_seg > 1 ? 0x1 : 0;
    if (r == NULL) flag |= 0x4;
    else {
        if (r->rev) flag |= 0x10;
        if (r->parent != r->id) flag |= 0x100;
        else if (!r->sam_pri) flag |= 0x800;
    }
    if (n_seg > 1) {
        if (r != NULL && r->proper_frag) flag |= 0x2;
        if (seg_idx == 0) flag |= 0x40;
        else if (seg_idx == n_seg - 1) flag |= 0x80;
        if (r_next == NULL) flag |= 0x8;
        else if (r_next->rev) flag |= 0x20;
        /* mm_qname_len: drop a trailing /<digit> (format.c:436) */
        if (name_len >= 3 && name[name_len - 2] == '/'
                && name[name_len - 1] >= '0' && name[name_len - 1] <= '9')
            name_len -= 2;
    }
    int64_t this_rid = -1, this_pos = -1;
    p = srf_put_mem(p, name, name_len);
    *p++ = '\t';
    p = srf_put_i64(p, flag);
    *p++ = '\t';
    if (r == NULL) {
        if (r_next != NULL) {   /* unmapped end anchored at the mate */
            this_rid = r_next->rid; this_pos = r_next->rs;
            p = srf_put_mem(p, ref_names_blob + ref_name_offs[this_rid],
                            ref_name_offs[this_rid + 1] - ref_name_offs[this_rid]);
            *p++ = '\t';
            p = srf_put_i64(p, this_pos + 1);
            p = srf_put_str(p, "\t0\t*");
        } else
            p = srf_put_str(p, "*\t0\t0\t*");
    } else {
        this_rid = r->rid; this_pos = r->rs;
        p = srf_put_mem(p, ref_names_blob + ref_name_offs[r->rid],
                        ref_name_offs[r->rid + 1] - ref_name_offs[r->rid]);
        *p++ = '\t';
        p = srf_put_i64(p, r->rs + 1);
        *p++ = '\t';
        p = srf_put_i64(p, r->mapq);
        *p++ = '\t';
        if (r->n_cig == 0) *p++ = '*';
        else {
            int64_t clip0 = r->rev ? qlen - r->qe : r->qs;
            int64_t clip1 = r->rev ? r->qs : qlen - r->qe;
            char clip_char = ((flag & 0x800) && !softclip) ? 'H' : 'S';
            if (clip0) { p = srf_put_i64(p, clip0); *p++ = clip_char; }
            for (int64_t i = 0; i < r->n_cig; i++) {
                p = srf_put_i64(p, r->cig[i] >> 4);
                *p++ = srf_cigar_str[r->cig[i] & 0xf];
            }
            if (clip1) { p = srf_put_i64(p, clip1); *p++ = clip_char; }
        }
    }
    if (n_seg > 1) {   /* RNEXT / PNEXT / TLEN (format.c:509-530) */
        int64_t tlen = 0;
        *p++ = '\t';
        if (this_rid >= 0 && r_next != NULL) {
            if (this_rid == r_next->rid) {
                if (r != NULL) {
                    int64_t p5 = r->rev ? r->re - 1 : this_pos;
                    int64_t n5 = r_next->rev ? r_next->re - 1 : r_next->rs;
                    tlen = n5 - p5;
                }
                *p++ = '=';
                *p++ = '\t';
                p = srf_put_i64(p, r_next->rs + 1);
            } else {
                p = srf_put_mem(p, ref_names_blob + ref_name_offs[r_next->rid],
                                ref_name_offs[r_next->rid + 1]
                                - ref_name_offs[r_next->rid]);
                *p++ = '\t';
                p = srf_put_i64(p, r_next->rs + 1);
            }
        } else if (r_next != NULL) {
            p = srf_put_mem(p, ref_names_blob + ref_name_offs[r_next->rid],
                            ref_name_offs[r_next->rid + 1]
                            - ref_name_offs[r_next->rid]);
            *p++ = '\t';
            p = srf_put_i64(p, r_next->rs + 1);
        } else if (this_rid >= 0) {
            *p++ = '=';
            *p++ = '\t';
            p = srf_put_i64(p, this_pos + 1);
        } else {
            *p++ = '*';
            *p++ = '\t';
            *p++ = '0';
        }
        if (tlen > 0) tlen++;
        else if (tlen < 0) tlen--;
        *p++ = '\t';
        p = srf_put_i64(p, tlen);
        *p++ = '\t';
    } else
        p = srf_put_str(p, "\t*\t0\t0\t");
    /* SEQ / QUAL (format.c:533-559) */
    if (r == NULL || (flag & 0x900) == 0 || softclip) {
        if (r != NULL && r->rev) {
            for (int64_t i = qlen - 1; i >= 0; i--)
                *p++ = (char)comp_table[(uint8_t)seq[i]];
        } else p = srf_put_mem(p, seq, qlen);
        *p++ = '\t';
        if (qual_len == 0) *p++ = '*';
        else if (r != NULL && r->rev) {
            for (int64_t i = qual_len - 1; i >= 0; i--) *p++ = qual[i];
        } else p = srf_put_mem(p, qual, qual_len);
    } else if (flag & 0x100) {
        p = srf_put_str(p, "*\t*");
    } else {
        int64_t l = r->qe - r->qs;
        if (r->rev) {
            for (int64_t i = r->qe - 1; i >= r->qs; i--)
                *p++ = (char)comp_table[(uint8_t)seq[i]];
        } else p = srf_put_mem(p, seq + r->qs, l);
        *p++ = '\t';
        if (qual_len == 0) *p++ = '*';
        else if (r->rev) {
            for (int64_t i = r->qe - 1; i >= r->qs; i--) *p++ = qual[i];
        } else p = srf_put_mem(p, qual + r->qs, l);
    }
    if (r != NULL) {
        /* write_tags (format.c:292-324) */
        p = srf_put_str(p, "\tNM:i:");
        p = srf_put_i64(p, r->blen - r->mlen + r->n_ambi);
        p = srf_put_str(p, "\tms:i:");
        p = srf_put_i64(p, r->dp_max);
        p = srf_put_str(p, "\tAS:i:");
        p = srf_put_i64(p, r->dp_score);
        p = srf_put_str(p, "\tnn:i:");
        p = srf_put_i64(p, r->n_ambi);
        p = srf_put_str(p, "\ttp:A:");
        *p++ = (r->id == r->parent) ? 'P' : 'S';
        p = srf_put_str(p, "\tcm:i:0\ts1:i:");
        p = srf_put_i64(p, r->score);
        if (r->parent == r->id) p = srf_put_str(p, "\ts2:i:0");
        double div = 1.0 - srf_event_identity(r);
        if (div == 0.0) p = srf_put_str(p, "\tde:f:0");
        else p += sprintf(p, "\tde:f:%.4f", div);
        /* SA tag for co-primary alignments (format.c:566-591) */
        if (r->parent == r->id && r->n_cig && n_regs > 1) {
            int has = 0;
            for (int64_t i = 0; i < n_regs; i++)
                if (regs[i] != r && regs[i]->parent == regs[i]->id && regs[i]->n_cig)
                    has = 1;
            if (has) {
                p = srf_put_str(p, "\tSA:Z:");
                for (int64_t i = 0; i < n_regs; i++) {
                    const srf_reg_t *q = regs[i];
                    if (q == r || q->parent != q->id || !q->n_cig) continue;
                    int64_t l_M, l_I, l_D;
                    if (q->qe - q->qs < q->re - q->rs) {
                        l_M = q->qe - q->qs; l_I = 0;
                        l_D = (q->re - q->rs) - (q->qe - q->qs);
                    } else {
                        l_M = q->re - q->rs;
                        l_I = (q->qe - q->qs) - (q->re - q->rs); l_D = 0;
                    }
                    int64_t clip5 = q->rev ? qlen - q->qe : q->qs;
                    int64_t clip3 = q->rev ? q->qs : qlen - q->qe;
                    p = srf_put_mem(p, ref_names_blob + ref_name_offs[q->rid],
                                    ref_name_offs[q->rid + 1] - ref_name_offs[q->rid]);
                    *p++ = ',';
                    p = srf_put_i64(p, q->rs + 1);
                    *p++ = ',';
                    *p++ = q->rev ? '-' : '+';
                    *p++ = ',';
                    if (clip5) { p = srf_put_i64(p, clip5); *p++ = 'S'; }
                    if (l_M) { p = srf_put_i64(p, l_M); *p++ = 'M'; }
                    if (l_I) { p = srf_put_i64(p, l_I); *p++ = 'I'; }
                    if (l_D) { p = srf_put_i64(p, l_D); *p++ = 'D'; }
                    if (clip3) { p = srf_put_i64(p, clip3); *p++ = 'S'; }
                    *p++ = ',';
                    p = srf_put_i64(p, q->mapq);
                    *p++ = ',';
                    p = srf_put_i64(p, q->blen - q->mlen + q->n_ambi);
                    *p++ = ';';
                }
            }
        }
    }
    if (rep_len >= 0) {
        p = srf_put_str(p, "\trl:i:");
        p = srf_put_i64(p, rep_len);
    }
    *p++ = '\n';
    return p;
}

/* Build the filtered, score-sorted candidate reg array for ONE read from
 * its fused-step meta row (the per-candidate half of sr_finish_batch:
 * exact-match / RLE + fix_cigar + rescoring, clip/min_dp_max filters and
 * score insertion sort, map.c:873-979). Returns 0 on success, 1 when the
 * read must fall back (device fallback flag, cigar overflow, window
 * overflow). */
static int srf_build_regs(const int32_t *meta, int64_t K, int64_t Lmax,
                          const uint8_t *qcodes, int64_t qlen,
                          const uint8_t *ops_buf, int64_t ops_stride,
                          const uint8_t *ref_codes, const int64_t *ref_seq_offs,
                          int64_t a, int64_t b, int64_t q_gap, int64_t e_gap,
                          int64_t min_dp_max,
                          srf_reg_t *regs, srf_reg_t **order,
                          int64_t *n_regs_out) {
    uint8_t qwin[1024], twin[1024];
    int64_t n_regs = 0;
    if (meta[2]) return 1;   /* device fallback */
    for (int64_t c = 0; c < K; c++) {
        if (!meta[3 + 0 * K + c]) continue;              /* c_valid */
        int32_t rev = meta[3 + 2 * K + c];
        int32_t chrom = meta[3 + 3 * K + c];
        int32_t so = meta[3 + 4 * K + c];
        int32_t ts = meta[3 + 5 * K + c];
        int32_t length = meta[3 + 6 * K + c];
        /* eo/te are reconstructed, not transferred (device_step.PACK_BK):
         * the window geometry pins te - ts == eo - so == length - 1 */
        int32_t eo = so + length - 1, te = ts + length - 1;
        int32_t exact = meta[3 + 7 * K + c];
        int32_t dp_score = meta[3 + 8 * K + c];
        srf_reg_t *r = &regs[n_regs];
        /* zero the scalar head only — cig[] is big and overwritten */
        memset(r, 0, __builtin_offsetof(srf_reg_t, cig));
        r->n_cig = 0;
        r->rid = chrom; r->rev = rev;
        r->qs = so; r->qe = eo + 1; r->rs = ts; r->re = te + 1;
        const uint8_t *tw_src = ref_codes + ref_seq_offs[chrom] + ts;
        if (exact) {
            int64_t n_ambi = 0;
            for (int64_t j2 = 0; j2 <= te - ts; j2++)
                if (tw_src[j2] > 3) n_ambi++;
            r->score = r->dp_score = qlen * a;
            r->n_ambi = n_ambi;
            r->blen = r->mlen = length - n_ambi;
            r->dp_max = a * (length - n_ambi);
            r->cig[0] = ((uint32_t)length << 4);
            r->n_cig = 1;
        } else {
            int32_t fin_i = meta[3 + 9 * K + c], fin_j = meta[3 + 10 * K + c];
            int32_t oprow = meta[3 + 11 * K + c];
            if (oprow == -2) {          /* substitution-only: all-M */
                r->cig[0] = ((uint32_t)length << 4);
                r->n_cig = 1;
            } else if (oprow < 0) return 1;
            else {
                int64_t m = srf_rle(ops_buf + oprow * ops_stride,
                                    ops_stride, fin_i, fin_j, r->cig);
                if (m < 0) return 1;
                r->n_cig = m;
            }
            int64_t wl = eo - so + 1, tl = te - ts + 1;
            if (wl > (int64_t)sizeof(qwin) || tl > (int64_t)sizeof(twin))
                return 1;
            if (rev)
                for (int64_t j2 = 0; j2 < wl; j2++)
                    qwin[j2] = qcodes[eo - j2] ^ 3;
            else
                memcpy(qwin, qcodes + so, (size_t)wl);
            memcpy(twin, tw_src, (size_t)tl);
            int64_t lead_op, lead_len;
            int64_t n2 = fix_cigar_c(r->cig, r->n_cig, qwin, twin,
                                     &lead_op, &lead_len);
            r->n_cig = n2;
            int64_t qs_sh = lead_op == 1 ? lead_len : 0;
            int64_t ts_sh = lead_op == 2 ? lead_len : 0;
            if (lead_op == 1) { if (rev) r->qe -= lead_len; else r->qs += lead_len; }
            else if (lead_op == 2) r->rs += lead_len;
            int64_t out6[6];
            update_extra_scan(qwin + qs_sh, twin + ts_sh, r->cig, n2,
                              a, b, q_gap, e_gap, 0, out6);
            r->blen = out6[0]; r->mlen = out6[1]; r->n_ambi = out6[2];
            r->dp_max = out6[3];
            r->score = r->dp_score = dp_score;
        }
        /* clip + min_dp_max filter, insertion sort (map.c:956-979) */
        int64_t clip0 = r->rev ? qlen - r->qe : r->qs;
        int64_t clip1 = r->rev ? r->qs : qlen - r->qe;
        if (!(clip0 < qlen && clip1 < qlen) || r->dp_score < min_dp_max)
            continue;
        order[n_regs] = r;
        n_regs++;
        for (int64_t k = n_regs - 1;
             k > 0 && order[k]->score > order[k - 1]->score; k--) {
            srf_reg_t *t = order[k]; order[k] = order[k - 1];
            order[k - 1] = t;
        }
    }
    *n_regs_out = n_regs;
    return 0;
}

/* Finish a whole short-read batch from the fused step's packed tensor:
 * for each non-fallback read, build candidate regs (exact-match or RLE of
 * the device-backtracked op stream + fix_cigar + rescoring), apply the
 * clip/min_dp_max filters and score insertion sort (map.c:956-979), assign
 * SAM params (hit.c:494-557) and write final SAM records.
 *
 * packed row layout (pipeline/device_step.py pack_outputs/pack_ops):
 * (3 + 12*K) little-endian int32 meta columns, then K op streams of
 * 2*Lmax/4 bytes (2-bit ops, back-to-front).
 *
 * rec_offs[i]..rec_offs[i+1] spans read i's records in out_buf; done[i]=0
 * marks reads the caller must finish via the oracle (fallback flag, cigar
 * overflow). Returns total bytes used, or -1 if out_cap was too small. */
int64_t sr_finish_batch(
    const int32_t *meta_arr, const uint8_t *ops_buf, int64_t ops_stride,
    int64_t B, int64_t K, int64_t Lmax,
    const uint8_t *codes, const int64_t *lens,
    const char *names_blob, const int64_t *name_offs,
    const char *seq_blob, const int64_t *seq_offs,
    const char *qual_blob, const int64_t *qual_offs,
    const uint8_t *ref_codes, const int64_t *ref_seq_offs,
    const char *ref_names_blob, const int64_t *ref_name_offs,
    int64_t a, int64_t b, int64_t q_gap, int64_t e_gap,
    int64_t min_dp_max, int64_t max_nb_sec, int64_t no_print_2nd,
    int64_t softclip, int64_t rep_len,
    char *out_buf, int64_t out_cap,
    int64_t *rec_offs, uint8_t *done) {
    const int64_t F = 3 + 12 * K;
    const int64_t max_regs = K < SRF_MAX_REGS ? SRF_MAX_REGS : K;
    char *p = out_buf;
    char *end = out_buf + out_cap;
    srf_reg_t *regs = (srf_reg_t *)__builtin_malloc(
        sizeof(srf_reg_t) * (size_t)max_regs);
    srf_reg_t **order = (srf_reg_t **)__builtin_malloc(
        sizeof(srf_reg_t *) * (size_t)max_regs);
    if (!regs || !order) {
        if (regs) __builtin_free(regs);
        if (order) __builtin_free(order);
        return -1;
    }
    for (int64_t i = 0; i < B; i++) {
        rec_offs[i] = p - out_buf;
        const int32_t *meta = meta_arr + i * F;
        int64_t qlen = lens[i];
        const uint8_t *qcodes = codes + i * Lmax;
        int64_t n_regs = 0;
        if (srf_build_regs(meta, K, Lmax, qcodes, qlen, ops_buf, ops_stride,
                           ref_codes, ref_seq_offs, a, b, q_gap, e_gap,
                           min_dp_max, regs, order, &n_regs)) {
            done[i] = 0; continue;
        }
        done[i] = 1;
        const char *name = names_blob + name_offs[i];
        int64_t name_len = name_offs[i + 1] - name_offs[i];
        const char *seq = seq_blob + seq_offs[i];
        const char *qual = qual_blob + qual_offs[i];
        int64_t qual_len = qual_offs[i + 1] - qual_offs[i];
        if (n_regs == 0) {
            int64_t need = srf_rec_bound(NULL, NULL, 0, name_len, qlen,
                                         qual_len, ref_name_offs);
            if (end - p < need) {
                __builtin_free(regs); __builtin_free(order); return -1;
            }
            p = srf_write_sam(p, NULL, NULL, 0, name, name_len, seq, qlen,
                              qual, qual_len, ref_names_blob, ref_name_offs,
                              (int)softclip, rep_len, 1, 0, NULL);
        } else {
            srf_set_sam_params(order, n_regs, qlen, a, max_nb_sec);
            for (int64_t k = 0; k < n_regs; k++) {
                const srf_reg_t *r = order[k];
                if (no_print_2nd && r->parent != r->id) continue;
                int64_t need = srf_rec_bound(r, order, n_regs, name_len,
                                             qlen, qual_len, ref_name_offs);
                if (end - p < need) {
                    __builtin_free(regs); __builtin_free(order); return -1;
                }
                p = srf_write_sam(p, r, order, n_regs, name, name_len, seq,
                                  qlen, qual, qual_len, ref_names_blob,
                                  ref_name_offs, (int)softclip, rep_len,
                                  1, 0, NULL);
            }
        }
    }
    rec_offs[B] = p - out_buf;
    __builtin_free(regs);
    __builtin_free(order);
    return p - out_buf;
}

/* ------------------------------------------------------------------ *
 * Paired-end finish: mm_pair (pe.c:76-177) + the n_seg == 2 SAM writer.
 * ------------------------------------------------------------------ */

#include <math.h>

/* x86 cvttss2si semantics: NaN / out-of-range -> INT_MIN (matches the
 * oracle's _c_int, oracle/hit.py). */
static int32_t srf_c_int(float x) {
    if (isnan(x) || x >= 2147483648.0f || x < -2147483648.0f)
        return (int32_t)(-2147483647 - 1);
    return (int32_t)x;
}

typedef struct { int s, rev; uint64_t key; srf_reg_t *r; } srf_pair_ent_t;

/* mm_pair (pe.c:76-177): proper-pair selection + PE mapq blend, operating
 * on the two ends' score-ordered reg arrays (order[] from srf_build_regs
 * after srf_set_sam_params). GDiet regs carry hash == 0, so the score's
 * low 32 bits are 0 (same degeneracy as the Python oracle port,
 * oracle/hit.py::pair). mm_set_pe_thru (pe.c:45-63) only sets the unused
 * pe_thru field and is skipped. */
static void srf_pair(int64_t max_gap_ref, int64_t pe_bonus, int64_t sub_diff,
                     int64_t match_sc,
                     srf_reg_t **order0, int64_t n0,
                     srf_reg_t **order1, int64_t n1) {
    enum { MAXA = 2 * SRF_MAX_REGS, MAXSC = MAXA * MAXA / 2 + 4 };
    srf_pair_ent_t a[MAXA];
    int64_t sc[MAXSC];
    int64_t na = 0, nsc = 0;
    int64_t dp_thres = 0;
    int segs = 0;
    for (int s = 0; s < 2; s++) {
        srf_reg_t **ord = s ? order1 : order0;
        int64_t n = s ? n1 : n0;
        int64_t mx_dp = 0;
        for (int64_t i = 0; i < n; i++) {
            srf_reg_t *r = ord[i];
            a[na].s = s;
            a[na].rev = r->rev;
            a[na].key = ((uint64_t)(uint32_t)r->rid << 33)
                      | ((uint64_t)(uint32_t)r->rs << 1)
                      | (uint64_t)(s ^ r->rev);
            a[na].r = r;
            na++;
            if (r->dp_max > mx_dp) mx_dp = r->dp_max;
            segs |= 1 << s;
        }
        dp_thres += mx_dp;
    }
    if (segs != 3) return;
    dp_thres -= pe_bonus;
    if (dp_thres < 0) dp_thres = 0;
    /* stable insertion sort by key (the oracle's list.sort) */
    for (int64_t i = 1; i < na; i++) {
        srf_pair_ent_t t = a[i];
        int64_t j = i - 1;
        while (j >= 0 && a[j].key > t.key) { a[j + 1] = a[j]; j--; }
        a[j + 1] = t;
    }
    int64_t mx = -1;
    int64_t max_idx[2] = {-1, -1};
    int64_t last[2] = {-1, -1};
    for (int64_t i = 0; i < na; i++) {
        if (a[i].key & 1) {
            int rev_i = a[i].rev;
            if (last[rev_i] < 0) continue;
            srf_reg_t *r = a[i].r;
            srf_reg_t *q = a[last[rev_i]].r;
            if (r->rid != q->rid || (int64_t)r->rs - q->re > max_gap_ref)
                continue;
            for (int64_t j = last[rev_i]; j >= 0; j--) {
                if (a[j].rev != rev_i || a[j].s == a[i].s) continue;
                q = a[j].r;
                if (r->rid != q->rid || (int64_t)r->rs - q->re > max_gap_ref)
                    break;
                if (r->dp_max + q->dp_max < dp_thres) continue;
                int64_t score = (r->dp_max + q->dp_max) << 32;  /* hash 0 */
                if (score > mx) {
                    mx = score;
                    max_idx[a[j].s] = j;
                    max_idx[a[i].s] = i;
                }
                if (nsc < MAXSC) sc[nsc++] = score;
            }
        } else
            last[a[i].rev] = i;
    }
    /* ascending sort of sc (insertion; bounded by MAXSC) */
    for (int64_t i = 1; i < nsc; i++) {
        int64_t t = sc[i];
        int64_t j = i - 1;
        while (j >= 0 && sc[j] > t) { sc[j + 1] = sc[j]; j--; }
        sc[j + 1] = t;
    }
    if (nsc && mx > 0) {
        srf_reg_t *rr[2] = {a[max_idx[0]].r, a[max_idx[1]].r};
        rr[0]->proper_frag = rr[1]->proper_frag = 1;
        for (int s = 0; s < 2; s++) {
            srf_reg_t **ord = s ? order1 : order0;
            int64_t n = s ? n1 : n0;
            if (rr[s]->id != rr[s]->parent
                    && rr[s]->parent >= 0 && rr[s]->parent < n) {
                /* (the bounds guard is a deviation: the oracle would raise
                 * IndexError on parent == n; never observed in practice) */
                srf_reg_t *pp = ord[rr[s]->parent];
                for (int64_t i = 0; i < n; i++)
                    if (ord[i]->parent == pp->id) ord[i]->parent = rr[s]->id;
                pp->mapq = 0;
            }
            if (!rr[s]->sam_pri) {
                for (int64_t i = 0; i < n; i++) ord[i]->sam_pri = 0;
                rr[s]->sam_pri = 1;
            }
        }
        int32_t mapq_pe = rr[0]->mapq > rr[1]->mapq ? rr[0]->mapq : rr[1]->mapq;
        int64_t n_sub = 0;
        for (int64_t i = 0; i < nsc; i++)
            if ((sc[i] >> 32) + sub_diff >= (mx >> 32)) n_sub++;
        if (nsc > 1) {
            int32_t mapq_pe_alt = srf_c_int(
                6.02f * (float)((mx >> 32) - (sc[nsc - 2] >> 32))
                / (float)match_sc - 4.343f * logf((float)n_sub));
            if (mapq_pe_alt < mapq_pe) mapq_pe = mapq_pe_alt;
        }
        for (int s = 0; s < 2; s++)
            if (rr[s]->mapq < mapq_pe)
                rr[s]->mapq = srf_c_int(0.2f * (float)rr[s]->mapq
                                        + 0.8f * (float)mapq_pe + 0.499f);
        if (nsc == 1) {
            for (int s = 0; s < 2; s++)
                if (rr[s]->mapq < 2) rr[s]->mapq = 2;
        } else if ((mx >> 32) > (sc[nsc - 2] >> 32)) {
            for (int s = 0; s < 2; s++)
                if (rr[s]->mapq < 1) rr[s]->mapq = 1;
        }
    }
}

/* Finish a whole paired-end batch from the fused step's packed tensor.
 *
 * Segment layout: B rows, even = R1, odd = R2, both in MAPPING orientation
 * (the caller already applied the pe_ori revcomp, map.c:1057-1062); flip0/
 * flip1 say which segment was revcomp'd so its regs are flipped back to the
 * original read strand after pairing (runtime.py flip-back semantics).
 * codes/lens are mapping-orientation; the name/seq/qual blobs hold the
 * ORIGINAL read strings (SAM SEQ/QUAL come from those).
 *
 * Per pair: srf_build_regs both ends, srf_set_sam_params each (the normal
 * single-end finish), then srf_pair (pe.c:76-177), flip-back, and n_seg=2
 * SAM records with mate fields (format.c:432-530). done[] and rec_offs[]
 * are PER PAIR (B/2 entries); a pair whose either end cannot be finished
 * in the envelope gets done[p] = 0 and is redone by the Python path. */
int64_t pe_finish_batch(
    const int32_t *meta_arr, const uint8_t *ops_buf, int64_t ops_stride,
    int64_t B, int64_t K, int64_t Lmax,
    const uint8_t *codes, const int64_t *lens,
    const char *names_blob, const int64_t *name_offs,
    const char *seq_blob, const int64_t *seq_offs,
    const char *qual_blob, const int64_t *qual_offs,
    const uint8_t *ref_codes, const int64_t *ref_seq_offs,
    const char *ref_names_blob, const int64_t *ref_name_offs,
    int64_t a, int64_t b, int64_t q_gap, int64_t e_gap,
    int64_t min_dp_max, int64_t max_nb_sec, int64_t no_print_2nd,
    int64_t softclip, int64_t rep_len,
    int64_t flip0, int64_t flip1,
    int64_t max_gap_ref, int64_t pe_bonus,
    char *out_buf, int64_t out_cap,
    int64_t *rec_offs, uint8_t *done) {
    const int64_t F = 3 + 12 * K;
    const int64_t max_regs = K < SRF_MAX_REGS ? SRF_MAX_REGS : K;
    const int64_t P = B / 2;
    char *p = out_buf;
    char *end = out_buf + out_cap;
    srf_reg_t *regs = (srf_reg_t *)__builtin_malloc(
        sizeof(srf_reg_t) * (size_t)(2 * max_regs));
    srf_reg_t **order = (srf_reg_t **)__builtin_malloc(
        sizeof(srf_reg_t *) * (size_t)(2 * max_regs));
    if (!regs || !order) {
        if (regs) __builtin_free(regs);
        if (order) __builtin_free(order);
        return -1;
    }
    const int64_t flip[2] = {flip0, flip1};
    for (int64_t pr = 0; pr < P; pr++) {
        rec_offs[pr] = p - out_buf;
        int64_t n_regs[2];
        srf_reg_t **ord[2] = {order, order + max_regs};
        int failed = 0;
        for (int s = 0; s < 2 && !failed; s++) {
            int64_t i = 2 * pr + s;
            failed = srf_build_regs(
                meta_arr + i * F, K, Lmax, codes + i * Lmax, lens[i],
                ops_buf, ops_stride, ref_codes, ref_seq_offs,
                a, b, q_gap, e_gap, min_dp_max,
                regs + s * max_regs, ord[s], &n_regs[s]);
            if (!failed && n_regs[s] > 0)
                srf_set_sam_params(ord[s], n_regs[s], lens[i], a, max_nb_sec);
        }
        if (failed) { done[pr] = 0; continue; }
        done[pr] = 1;
        srf_pair(max_gap_ref, pe_bonus, 2 * a + b, a,
                 ord[0], n_regs[0], ord[1], n_regs[1]);
        /* flip the pe_ori-revcomp'd segment's regs back to the original
         * read strand (runtime.py:493-497) */
        for (int s = 0; s < 2; s++) {
            if (!flip[s]) continue;
            int64_t qlen = lens[2 * pr + s];
            for (int64_t i = 0; i < n_regs[s]; i++) {
                srf_reg_t *r = ord[s][i];
                int32_t qs = r->qs;
                r->qs = (int32_t)(qlen - r->qe);
                r->qe = (int32_t)(qlen - qs);
                r->rev = !r->rev;
            }
        }
        for (int s = 0; s < 2; s++) {
            int64_t i = 2 * pr + s;
            int64_t qlen = seq_offs[i + 1] - seq_offs[i];
            const char *name = names_blob + name_offs[i];
            int64_t name_len = name_offs[i + 1] - name_offs[i];
            const char *seq = seq_blob + seq_offs[i];
            const char *qual = qual_blob + qual_offs[i];
            int64_t qual_len = qual_offs[i + 1] - qual_offs[i];
            /* mate primary (get_sam_pri, format.c:379-385) */
            int m = 1 - s;
            const srf_reg_t *r_next = NULL;
            for (int64_t k = 0; k < n_regs[m]; k++)
                if (ord[m][k]->sam_pri) { r_next = ord[m][k]; break; }
            if (n_regs[s] == 0) {
                int64_t need = srf_rec_bound(NULL, NULL, 0, name_len, qlen,
                                             qual_len, ref_name_offs);
                if (end - p < need) {
                    __builtin_free(regs); __builtin_free(order); return -1;
                }
                p = srf_write_sam(p, NULL, NULL, 0, name, name_len, seq,
                                  qlen, qual, qual_len, ref_names_blob,
                                  ref_name_offs, (int)softclip, rep_len,
                                  2, s, r_next);
                continue;
            }
            for (int64_t k = 0; k < n_regs[s]; k++) {
                const srf_reg_t *r = ord[s][k];
                if (no_print_2nd && r->parent != r->id) continue;
                int64_t need = srf_rec_bound(r, ord[s], n_regs[s], name_len,
                                             qlen, qual_len, ref_name_offs);
                if (end - p < need) {
                    __builtin_free(regs); __builtin_free(order); return -1;
                }
                p = srf_write_sam(p, r, ord[s], n_regs[s], name, name_len,
                                  seq, qlen, qual, qual_len, ref_names_blob,
                                  ref_name_offs, (int)softclip, rep_len,
                                  2, s, r_next);
            }
        }
    }
    rec_offs[P] = p - out_buf;
    __builtin_free(regs);
    __builtin_free(order);
    return p - out_buf;
}

/* ------------------------------------------------------------------ *
 * Scalar banded dual affine-gap extension DP — C port of the Python
 * oracle kernel (gdiet_tpu/oracle/align.py::extd2, itself a mechanical
 * int32 emulation of ksw_extd2_sse, ksw2_extd2_sse.c:34-402) for the
 * APPROX_MAX + left-aligned + with-CIGAR configuration GDiet uses
 * everywhere (map.c:867,923-929). Bit-identical results; the oracle
 * fallback path calls this instead of the numpy loop.
 * ------------------------------------------------------------------ */

#include <stdlib.h>

#define EXTD2_NEG_INF (-0x40000000)

static void extd2_backtrack(const uint8_t *p, const int64_t *off,
                            const int64_t *off_end, int64_t n_col16,
                            int64_t i0, int64_t j0,
                            uint32_t *cig, int64_t max_cig, int64_t *n_cig) {
    int64_t i = i0, j = j0, m = 0;
    int state = 0;
    /* back-to-front with run merging, then reverse */
    while (i >= 0 && j >= 0) {
        int64_t r = i + j;
        int force_state = -1;
        if (i < off[r]) force_state = 2;
        if (i > off_end[r]) force_state = 1;
        int tmp = force_state < 0 ? p[r * n_col16 + (i - off[r])] : 0;
        if (state == 0) state = tmp & 7;
        else if (!((tmp >> (state + 2)) & 1)) state = 0;
        if (state == 0) state = tmp & 7;
        if (force_state >= 0) state = force_state;
        int op, di, dj;
        if (state == 0) { op = 0; di = dj = 1; }
        else if (state == 1 || state == 3) { op = 2; di = 1; dj = 0; }
        else { op = 1; di = 0; dj = 1; }
        if (m > 0 && (int)(cig[m - 1] & 0xf) == op) cig[m - 1] += 1u << 4;
        else if (m < max_cig) cig[m++] = (1u << 4) | (uint32_t)op;
        else { *n_cig = -1; return; }
        i -= di; j -= dj;
    }
    if (i >= 0) {
        if (m > 0 && (cig[m - 1] & 0xf) == 2) cig[m - 1] += (uint32_t)(i + 1) << 4;
        else if (m < max_cig) cig[m++] = ((uint32_t)(i + 1) << 4) | 2;
        else { *n_cig = -1; return; }
    }
    if (j >= 0) {
        if (m > 0 && (cig[m - 1] & 0xf) == 1) cig[m - 1] += (uint32_t)(j + 1) << 4;
        else if (m < max_cig) cig[m++] = ((uint32_t)(j + 1) << 4) | 1;
        else { *n_cig = -1; return; }
    }
    for (int64_t x2 = 0, y2 = m - 1; x2 < y2; x2++, y2--) {
        uint32_t t = cig[x2]; cig[x2] = cig[y2]; cig[y2] = t;
    }
    *n_cig = m;
}

int64_t extd2_approx(const uint8_t *query, int64_t qlen,
                     const uint8_t *target, int64_t tlen,
                     int64_t a_sc, int64_t b_sc, int64_t q_, int64_t e_,
                     int64_t q2_, int64_t e2_, int64_t w,
                     uint32_t *cig, int64_t max_cig, int64_t *n_cig) {
    *n_cig = 0;
    if (qlen <= 0 || tlen <= 0) return EXTD2_NEG_INF;
    int32_t q = (int32_t)q_, e = (int32_t)e_, q2 = (int32_t)q2_, e2 = (int32_t)e2_;
    if (q2 + e2 < q + e) { int32_t t = q; q = q2; q2 = t; t = e; e = e2; e2 = t; }
    int32_t sc_mch = (int32_t)a_sc;
    int32_t sc_mis = b_sc < 0 ? (int32_t)b_sc : (int32_t)-b_sc;
    int32_t sc_N = -e2;
    if (w < 0) w = qlen > tlen ? qlen : tlen;
    int64_t tlen16 = (tlen + 15) / 16;
    int64_t n_col = qlen < tlen ? qlen : tlen;
    n_col = ((n_col < w + 1 ? n_col : w + 1) + 15) / 16 + 1;
    int64_t n_col16 = n_col * 16;
    if (-sc_mis > 2 * (q + e)) return EXTD2_NEG_INF; /* sse.c:100 bail */

    int32_t long_thres = e != e2 ? (q2 - q) / (e - e2) - 1 : 0;
    if (q2 + e2 + long_thres * e2 > q + e + long_thres * e) long_thres++;
    int32_t long_diff = long_thres * (e - e2) - (q2 - q) - e2;

    int64_t npad = tlen16 * 16;
    int64_t R = qlen + tlen - 1;
    int32_t *u = malloc(sizeof(int32_t) * npad * 7);
    int64_t *off = malloc(sizeof(int64_t) * R * 2);
    uint8_t *p = malloc((size_t)R * n_col16);
    if (!u || !off || !p) { free(u); free(off); free(p); return EXTD2_NEG_INF; }
    int32_t *v = u + npad, *x = v + npad, *y = x + npad;
    int32_t *x2 = y + npad, *y2 = x2 + npad, *s = y2 + npad;
    int64_t *off_end = off + R;
    for (int64_t i = 0; i < npad; i++) {
        u[i] = v[i] = x[i] = y[i] = -q - e;
        x2[i] = y2[i] = -q2 - e2;
        s[i] = 0;
    }
    int32_t H0 = 0, last_H0_t = 0, score = EXTD2_NEG_INF;
    int64_t last_st = -1, last_en = -1;
    int zdropped = 0;

    for (int64_t r = 0; r < R; r++) {
        int64_t st = 0, en = tlen - 1;
        if (st < r - qlen + 1) st = r - qlen + 1;
        if (en > r) en = r;
        if (st < ((r - w + 1) >> 1)) st = (r - w + 1) >> 1;
        if (en > ((r + w) >> 1)) en = (r + w) >> 1;
        if (st > en) { zdropped = 1; break; }
        int64_t st0 = st, en0 = en;
        st = st / 16 * 16;
        en = (en + 16) / 16 * 16 - 1;
        int32_t x1, x21, v1;
        int32_t bu = r == 0 ? -q - e
                   : (r < long_thres ? -e : (r == long_thres ? long_diff : -e2));
        if (st > 0) {
            if (last_st <= st - 1 && st - 1 <= last_en) {
                x1 = x[st - 1]; x21 = x2[st - 1]; v1 = v[st - 1];
            } else { x1 = -q - e; x21 = -q2 - e2; v1 = -q - e; }
        } else { x1 = -q - e; x21 = -q2 - e2; v1 = bu; }
        if (en >= r) { y[r] = -q - e; y2[r] = -q2 - e2; u[r] = bu; }
        /* substitution lanes, 16-wide unaligned blocks from st0 */
        for (int64_t t0 = st0; t0 <= en0; t0 += 16) {
            int64_t hi = t0 + 16 < npad ? t0 + 16 : npad;
            for (int64_t t = t0; t < hi; t++) {
                int64_t src = qlen - 1 - r + t;
                int32_t qv = (src >= 0 && src < qlen)
                    ? (int32_t)query[qlen - 1 - src] : 0;
                int32_t sq = t < tlen ? (int32_t)target[t] : 0;
                s[t] = (sq == 4 || qv == 4) ? sc_N : (sq == qv ? sc_mch : sc_mis);
            }
        }
        /* core diff recurrence, left-to-right with carried prevs */
        uint8_t *pr = p + r * n_col16;
        int32_t xp = x1, vp = v1, x2p = x21;
        for (int64_t t = st; t <= en; t++) {
            int32_t z = s[t];
            int32_t a_ = xp + vp;
            int32_t b_ = y[t] + u[t];
            int32_t a2_ = x2p + vp;
            int32_t b2_ = y2[t] + u[t];
            uint8_t d = 0;
            if (a_ > z) { d = 1; z = a_; }
            if (b_ > z) { d = 2; z = b_; }
            if (a2_ > z) { d = 3; z = a2_; }
            if (b2_ > z) { d = 4; z = b2_; }
            if (z > sc_mch) z = sc_mch;
            int32_t u_new = z - vp;
            int32_t v_new = z - u[t];
            a_ -= z - q; b_ -= z - q; a2_ -= z - q2; b2_ -= z - q2;
            xp = x[t]; vp = v[t]; x2p = x2[t];  /* save pre-update values */
            u[t] = u_new; v[t] = v_new;
            x[t] = (a_ > 0 ? a_ : 0) - (q + e);
            y[t] = (b_ > 0 ? b_ : 0) - (q + e);
            x2[t] = (a2_ > 0 ? a2_ : 0) - (q2 + e2);
            y2[t] = (b2_ > 0 ? b2_ : 0) - (q2 + e2);
            if (a_ > 0) d |= 0x08;
            if (b_ > 0) d |= 0x10;
            if (a2_ > 0) d |= 0x20;
            if (b2_ > 0) d |= 0x40;
            pr[t - st] = d;
        }
        off[r] = st; off_end[r] = en;
        /* approximate greedy H0 (sse.c:367-383) */
        if (r > 0) {
            if (st0 <= last_H0_t && last_H0_t <= en0
                    && st0 <= last_H0_t + 1 && last_H0_t + 1 <= en0) {
                int32_t d0 = v[last_H0_t], d1 = u[last_H0_t + 1];
                if (d0 > d1) H0 += d0;
                else { H0 += d1; last_H0_t++; }
            } else if (st0 <= last_H0_t && last_H0_t <= en0) {
                H0 += v[last_H0_t];
            } else { last_H0_t++; H0 += u[last_H0_t]; }
        } else { H0 = v[0] - (q + e); last_H0_t = 0; }
        if (r == R - 1 && en0 == tlen - 1) score = H0;
        last_st = st; last_en = en;
    }
    if (!zdropped)
        extd2_backtrack(p, off, off_end, n_col16, tlen - 1, qlen - 1,
                        cig, max_cig, n_cig);
    else { score = EXTD2_NEG_INF; *n_cig = 0; }
    free(u); free(off); free(p);
    return score;
}

/* ------------------------------------------------------------------ */
/* LSD radix sort of parallel (key, val) u64 arrays, key primary / val
 * secondary, ascending — the host CSR-build analog of the reference's
 * per-bucket radix_sort_128x (index.c:225-266 via ksort.h:42), run once
 * over the whole minimizer stream instead of per hash bucket.  16-bit
 * digits; the caller passes the live bit counts of each word (from the
 * max values) so constant high digits cost nothing.  A pass whose digit
 * is constant across the array is skipped without a scatter.  Stable,
 * so equal (key,val) pairs keep stream order like np.lexsort. */
void radix_sort_kv(uint64_t *k, uint64_t *v, uint64_t *tk, uint64_t *tv,
                   int64_t n, int32_t key_bits, int32_t val_bits)
{
    enum { D = 16, NB = 1 << 16 };
    const uint64_t MASK = NB - 1;
    int64_t *cnt = (int64_t *)malloc((size_t)NB * sizeof(*cnt));
    if (!cnt || n <= 0) { free(cnt); return; }
    uint64_t *ak = k, *av = v, *bk = tk, *bv = tv;
    for (int w = 0; w < 2; w++) {
        int bits = w ? key_bits : val_bits;
        for (int sh = 0; sh < bits; sh += D) {
            const uint64_t *dig = w ? ak : av;
            memset(cnt, 0, (size_t)NB * sizeof(*cnt));
            for (int64_t i = 0; i < n; i++) cnt[(dig[i] >> sh) & MASK]++;
            if (cnt[(dig[0] >> sh) & MASK] == n) continue; /* constant digit */
            int64_t sum = 0;
            for (int64_t b = 0; b < NB; b++) {
                int64_t c = cnt[b]; cnt[b] = sum; sum += c;
            }
            for (int64_t i = 0; i < n; i++) {
                int64_t dst = cnt[(dig[i] >> sh) & MASK]++;
                bk[dst] = ak[i]; bv[dst] = av[i];
            }
            uint64_t *t;
            t = ak; ak = bk; bk = t;
            t = av; av = bv; bv = t;
        }
    }
    if (ak != k) {
        memcpy(k, ak, (size_t)n * sizeof(*k));
        memcpy(v, av, (size_t)n * sizeof(*v));
    }
    free(cnt);
}

/* ------------------------------------------------------------------ */
/* Per-read symmetric-DUST presence flags (C port of ops/sdust.py
 * sdust_core, the reference's sdust_core sdust.c:66-176, as used by the
 * query hook map.c:45-72 with window W=64). flags[i] = 1 iff read i has
 * ANY masked interval at threshold T — i.e. mm_dust_minier could drop a
 * minimizer, so the read must take the exact host path; flag 0 reads are
 * provably unaffected by -T and stay on the device path. Early-exits at
 * the first saved region. */
void sdust_flags_batch(const char *seqs, const int64_t *offsets, int64_t n,
                       int64_t T, int64_t W, uint8_t *flags)
{
    enum { WLEN = 3, WTOT = 64, WMSK = 63, WCAP = 256, PCAP = 1024 };
    typedef struct { int64_t start, finish, r, l; } perf_t;
    perf_t P[PCAP];
    int64_t w[WCAP];
    if (W > WCAP - 2) W = WCAP - 2;
    for (int64_t ri = 0; ri < n; ri++) {
        const char *s = seqs + offsets[ri];
        int64_t l_seq = offsets[ri + 1] - offsets[ri];
        int64_t cv[WTOT] = {0}, cw[WTOT] = {0};
        int64_t rv = 0, rw = 0, L = 0, np = 0;
        int64_t wf = 0, wn = 0; /* deque front index / length */
        int64_t l = 0, t = 0;
        int any = 0;
        for (int64_t i = 0; i <= l_seq && !any; i++) {
            int b = i < l_seq ? seq_nt4_table[(uint8_t)s[i]] : 4;
            if (b < 4) {
                l++;
                t = ((t << 2) | b) & WMSK;
                if (l < WLEN) continue;
                int64_t start = (l - W > 0 ? l - W : 0) + (i + 1 - l);
                /* save_masked_regions: a perfect interval fell behind the
                 * window start -> a region is emitted; that is all the
                 * flag needs */
                if (np && P[np - 1].start < start) { any = 1; break; }
                /* shift_window */
                if (wn >= W - WLEN + 1) {
                    int64_t s0 = w[wf]; wf = (wf + 1) % WCAP; wn--;
                    cw[s0]--; rw -= cw[s0];
                    if (L > wn) { L--; cv[s0]--; rv -= cv[s0]; }
                }
                w[(wf + wn) % WCAP] = t; wn++;
                L++;
                rw += cw[t]; cw[t]++;
                rv += cv[t]; cv[t]++;
                if (cv[t] * 10 > (T << 1)) {
                    for (;;) {
                        int64_t s0 = w[(wf + wn - L) % WCAP];
                        cv[s0]--; rv -= cv[s0]; L--;
                        if (s0 == t) break;
                    }
                }
                if (rw * 10 > L * T) {
                    /* find_perfect */
                    int64_t c[WTOT];
                    memcpy(c, cv, sizeof(c));
                    int64_t r = rv, max_r = 0, max_l = 0;
                    for (int64_t ii = wn - L - 1; ii >= 0; ii--) {
                        int64_t ti = w[(wf + ii) % WCAP];
                        r += c[ti]; c[ti]++;
                        int64_t new_r = r, new_l = wn - ii - 1;
                        if (new_r * 10 > T * new_l) {
                            int64_t j = 0;
                            while (j < np && P[j].start >= ii + start) {
                                if (max_r == 0 ||
                                    P[j].r * max_l > max_r * P[j].l) {
                                    max_r = P[j].r; max_l = P[j].l;
                                }
                                j++;
                            }
                            if (max_r == 0 || new_r * max_l >= max_r * new_l) {
                                max_r = new_r; max_l = new_l;
                                if (np >= PCAP) { any = 1; break; }
                                memmove(P + j + 1, P + j,
                                        (size_t)(np - j) * sizeof(*P));
                                P[j].start = ii + start;
                                P[j].finish = wn + (WLEN - 1) + start;
                                P[j].r = new_r;
                                P[j].l = new_l;
                                np++;
                            }
                        }
                    }
                }
            } else {
                if (np) { any = 1; break; } /* flush emits pending regions */
                l = 0; t = 0;
            }
        }
        if (np) any = 1; /* end-of-read flush */
        flags[ri] = (uint8_t)any;
    }
}

/* ------------------------------------------------------------------ */
/* Sequential bucketed-cuckoo insertion (index/cuckoo.py layout: 2 sides
 * x NB buckets x 4 slots). Each insert probes its bucket for a free
 * slot, else evicts a rotating victim and continues on the other side
 * (classic random-walk cuckoo, O(1) amortized). Returns 1 on success,
 * 0 when some key exceeds max_kicks (caller retries with fresh hash
 * constants). tbl_k must be prefilled with EMPTY (all-ones). */
static inline int64_t cuckoo_bucket(uint64_t key, uint64_t c, int64_t NB) {
    uint64_t t = (key * c) >> 32;
    return (int64_t)((t * (uint64_t)NB) >> 32);
}

int cuckoo_build_c(const uint64_t *keys, const uint64_t *vals, int64_t nk,
                   uint64_t *tbl_k, uint64_t *tbl_v, int64_t NB,
                   uint64_t c1, uint64_t c2, int64_t max_kicks)
{
    const uint64_t CEMPTY = ~(uint64_t)0;
    for (int64_t i = 0; i < nk; i++) {
        uint64_t ck = keys[i], cv = vals[i];
        int side = 0;
        for (int64_t kick = 0; ; kick++) {
            if (kick > max_kicks) return 0;
            int64_t b = cuckoo_bucket(ck, side ? c2 : c1, NB) + side * NB;
            uint64_t *bk = tbl_k + b * 4, *bv = tbl_v + b * 4;
            int placed = 0;
            for (int s = 0; s < 4; s++) {
                if (bk[s] == CEMPTY) { bk[s] = ck; bv[s] = cv; placed = 1; break; }
            }
            if (placed) break;
            int v = (int)((((ck >> 17) + (uint64_t)kick)) & 3);
            uint64_t tk0 = bk[v], tv0 = bv[v];
            bk[v] = ck; bv[v] = cv;
            ck = tk0; cv = tv0;
            side ^= 1;
        }
    }
    return 1;
}
