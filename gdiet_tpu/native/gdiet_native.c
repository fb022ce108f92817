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
