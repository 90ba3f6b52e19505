// mazu_host: native host-side ops for the mazu_tpu data loader.
//
// The reference implements its entire host path in native Rust; here the
// performance-critical ingestion ops (ASCII DNA -> 2-bit packing, batch
// k-merization with non-ACGT window rejection) are C++ with a ctypes ABI,
// used by mazu_tpu.io.native (NumPy fallback when the .so is absent).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmazu_host.so mazu_host.cpp

#include <cstdint>
#include <cstring>

extern "C" {

// ASCII -> 2-bit codes; non-ACGT -> 255. Returns number of invalid chars.
int64_t seq_to_codes(const char* seq, int64_t n, uint8_t* out) {
    static uint8_t lut[256];
    static bool init = false;
    if (!init) {
        memset(lut, 255, 256);
        lut['A'] = lut['a'] = 0;
        lut['C'] = lut['c'] = 1;
        lut['G'] = lut['g'] = 2;
        lut['T'] = lut['t'] = 3;
        init = true;
    }
    int64_t bad = 0;
    for (int64_t i = 0; i < n; i++) {
        uint8_t c = lut[(uint8_t)seq[i]];
        out[i] = c;
        bad += (c == 255);
    }
    return bad;
}

// Pack 2-bit codes LSB-first into u64 words (codes must be < 4).
void codes_to_words(const uint8_t* codes, int64_t n, uint64_t* words) {
    int64_t nw = (2 * n + 63) / 64;
    memset(words, 0, nw * 8);
    for (int64_t i = 0; i < n; i++) {
        words[i >> 5] |= ((uint64_t)(codes[i] & 3)) << ((i & 31) * 2);
    }
}

// Batch k-merize: emit (pos, packed word) for every window of k valid
// bases (non-ACGT restarts, CanonicalKmerIterator semantics). Returns the
// number of k-mers emitted. pos_out/word_out must have capacity n-k+1.
int64_t kmerize(const uint8_t* codes, int64_t n, int k, int64_t* pos_out,
                uint64_t* word_out) {
    if (n < k) return 0;
    int64_t out = 0;
    uint64_t word = 0;
    const uint64_t mask = (k >= 32) ? ~0ull : ((1ull << (2 * k)) - 1);
    int run = 0;  // count of consecutive valid bases ending at i
    for (int64_t i = 0; i < n; i++) {
        uint8_t c = codes[i];
        if (c > 3) {
            run = 0;
            word = 0;
            continue;
        }
        word = ((word >> 2) | ((uint64_t)c << (2 * (k - 1)))) & mask;
        if (++run >= k) {
            pos_out[out] = i - k + 1;
            word_out[out] = word;
            out++;
        }
    }
    return out;
}

// Reverse-complement k-mer words in place (LSB-first layout).
void revcomp_words(uint64_t* words, int64_t n, int k) {
    const int shift = 64 - 2 * k;
    for (int64_t i = 0; i < n; i++) {
        uint64_t x = ~words[i];
        x = ((x >> 2) & 0x3333333333333333ull) | ((x & 0x3333333333333333ull) << 2);
        x = ((x >> 4) & 0x0F0F0F0F0F0F0F0Full) | ((x & 0x0F0F0F0F0F0F0F0Full) << 4);
        x = ((x >> 8) & 0x00FF00FF00FF00FFull) | ((x & 0x00FF00FF00FF00FFull) << 8);
        x = ((x >> 16) & 0x0000FFFF0000FFFFull) | ((x & 0x0000FFFF0000FFFFull) << 16);
        x = (x >> 32) | (x << 32);
        words[i] = x >> shift;
    }
}

}  // extern "C"


#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Parallel inclusive prefix sum (int64). NumPy's cumsum runs ~100 MB/s on
// this host (no SIMD path); this two-pass blocked scan is memory-bound.
// Replaces rayon-side prefix work (reference src/util.rs:26-38 callers).
void cumsum_i64(const int64_t* in, int64_t n, int64_t* out) {
#ifdef _OPENMP
    int nt = omp_get_max_threads();
#else
    int nt = 1;
#endif
    if (n < (1 << 16) || nt == 1) {
        int64_t acc = 0;
        for (int64_t i = 0; i < n; i++) { acc += in[i]; out[i] = acc; }
        return;
    }
    int64_t block = (n + nt - 1) / nt;
    int64_t* sums = new int64_t[nt]();
#pragma omp parallel num_threads(nt)
    {
#ifdef _OPENMP
        int t = omp_get_thread_num();
#else
        int t = 0;
#endif
        int64_t a = t * block, b = a + block < n ? a + block : n;
        int64_t acc = 0;
        for (int64_t i = a; i < b; i++) { acc += in[i]; out[i] = acc; }
        sums[t] = acc;
#pragma omp barrier
        int64_t base = 0;
        for (int i = 0; i < t; i++) base += sums[i];
        if (base)
            for (int64_t i = a; i < b; i++) out[i] += base;
    }
    delete[] sums;
}

// out[offsets[i] + j] = starts[i] + j for j in [0, counts[i]) — the
// "expand ranges" primitive behind kmer_start_positions and the
// bucket-grouped occurrence scatter (replaces np.repeat+arange temps).
void expand_ranges(const int64_t* starts, const int64_t* counts,
                   const int64_t* offsets, int64_t nr, int64_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nr; i++) {
        int64_t s = starts[i], o = offsets[i], c = counts[i];
        for (int64_t j = 0; j < c; j++) out[o + j] = s + j;
    }
}

// Gathered variant: out[offsets[i] + j] = base[starts[i] + j].
void expand_ranges_gather(const int64_t* base, const int64_t* starts,
                          const int64_t* counts, const int64_t* offsets,
                          int64_t nr, int64_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nr; i++) {
        int64_t s = starts[i], o = offsets[i], c = counts[i];
        for (int64_t j = 0; j < c; j++) out[o + j] = base[s + j];
    }
}

// Build a bucket-table prefix array as a step function over the occupied
// buckets, in ONE parallel write pass: prefix[0..ub[0]] = 0, then
// prefix[ub[i]+1 .. ub[i+1]] = cum[i], tail = cum[m-1]. Replaces the
// zeros(T) + scatter + cumsum chain whose page faults dominated the
// 50Mbp build (46.5s -> one 8B*T write).
// ub: sorted occupied bucket ids; cum[i]: total occs in buckets <= ub[i].
// out has T+1 entries.
void fill_prefix_i64(const int64_t* ub, const int64_t* cum, int64_t m,
                     int64_t T, int64_t* out) {
    if (m == 0) {
        for (int64_t t = 0; t <= T; t++) out[t] = 0;
        return;
    }
#pragma omp parallel
    {
#pragma omp for schedule(static) nowait
        for (int64_t t = 0; t <= ub[0]; t++) out[t] = 0;
#pragma omp for schedule(static) nowait
        for (int64_t i = 0; i < m - 1; i++) {
            int64_t v = cum[i];
            for (int64_t t = ub[i] + 1; t <= ub[i + 1]; t++) out[t] = v;
        }
#pragma omp for schedule(static)
        for (int64_t t = ub[m - 1] + 1; t <= T; t++) out[t] = cum[m - 1];
    }
}

// Bucket-bounds PAIRS (start, end) as int32, straight from the sparse
// occupied-bucket form — the device flat2 layout. pairs[t] =
// (prefix[t], prefix[t+1]) of the step-function prefix. One write pass;
// replaces the int64-prefix -> astype(int32) -> np.stack chain (three
// multi-GB temps at 50Mbp).
void fill_pairs_i32(const int64_t* ub, const int64_t* cum, int64_t m,
                    int64_t T, int32_t* out) {
    if (m == 0) {
        for (int64_t t = 0; t < 2 * T; t++) out[t] = 0;
        return;
    }
#pragma omp parallel
    {
#pragma omp for schedule(static) nowait
        for (int64_t t = 0; t < ub[0]; t++) { out[2 * t] = 0; out[2 * t + 1] = 0; }
#pragma omp for schedule(static)
        for (int64_t i = 0; i < m; i++) {
            int32_t lo = (int32_t)(i ? cum[i - 1] : 0);
            int32_t hi = (int32_t)cum[i];
            int64_t t = ub[i];
            out[2 * t] = lo; out[2 * t + 1] = hi;
            int64_t next = (i + 1 < m) ? ub[i + 1] : T;
            for (int64_t u = t + 1; u < next; u++) {
                out[2 * u] = hi; out[2 * u + 1] = hi;
            }
        }
    }
}

// Per-class consecutive-duplicate dedup over a 2-class interleaved stream
// (parity: the reference's per-strand minimizer-occurrence dedup,
// src/kphf/sshash.rs:109-117). keep[i] = 1 iff element i differs in
// (mm, pos) from the previous element of the same class (isfw[i]).
// Block-parallel two-pass: per-block tail (last fw / last rc element),
// serial carry combine, then per-block flag pass.
void dedup_flags(const uint64_t* mm, const int64_t* pos, const uint8_t* isfw,
                 int64_t n, uint8_t* keep) {
#ifdef _OPENMP
    int nt = omp_get_max_threads();
#else
    int nt = 1;
#endif
    int64_t block = (n + nt - 1) / nt;
    // carry[t][c] = index of last element of class c in blocks < t (-1 none)
    int64_t* carry = new int64_t[(nt + 1) * 2];
    carry[0] = carry[1] = -1;
#pragma omp parallel num_threads(nt)
    {
#ifdef _OPENMP
        int t = omp_get_thread_num();
#else
        int t = 0;
#endif
        int64_t a = t * block, b = a + block < n ? a + block : n;
        int64_t last_fw = -1, last_rc = -1;
        for (int64_t i = a; i < b; i++) {
            if (isfw[i]) last_fw = i; else last_rc = i;
        }
        carry[2 * (t + 1)] = last_fw;
        carry[2 * (t + 1) + 1] = last_rc;
#pragma omp barrier
#pragma omp single
        for (int i = 1; i <= nt; i++) {
            if (carry[2 * i] < 0) carry[2 * i] = carry[2 * (i - 1)];
            if (carry[2 * i + 1] < 0) carry[2 * i + 1] = carry[2 * (i - 1) + 1];
        }
        int64_t pf = carry[2 * t], pr = carry[2 * t + 1];
        for (int64_t i = a; i < b; i++) {
            int64_t& prev = isfw[i] ? pf : pr;
            keep[i] = (prev < 0) || mm[i] != mm[prev] || pos[i] != pos[prev];
            prev = i;
        }
    }
    delete[] carry;
}

// Pack n values LSB-first at the given bit width into u64 words
// (IntVector layout). Parallel without atomics: chunks of 64 elements
// span exactly `width` words (64*width bits), so thread seams are always
// word-aligned and writes never overlap.
// 2-bit DNA packing from byte codes: word w = codes[32w..32w+32), LSB-first
// (SeqVector layout). One thread per word range — seam-free by construction.
void pack_codes2(const uint8_t* codes, int64_t n, uint64_t* words) {
    int64_t nw = (2 * n + 63) / 64;
#pragma omp parallel for schedule(static)
    for (int64_t w = 0; w < nw; w++) {
        int64_t i0 = w * 32, i1 = i0 + 32 < n ? i0 + 32 : n;
        uint64_t acc = 0;
        for (int64_t i = i0; i < i1; i++)
            acc |= (uint64_t)(codes[i] & 3) << ((i - i0) * 2);
        words[w] = acc;
    }
}

void pack_width(const uint64_t* vals, int64_t n, int width, uint64_t* words) {
    const uint64_t mask = (width >= 64) ? ~0ull : ((1ull << width) - 1);
    int64_t nchunk = (n + 63) / 64;
#pragma omp parallel for schedule(static)
    for (int64_t c = 0; c < nchunk; c++) {
        int64_t i0 = c * 64, i1 = i0 + 64 < n ? i0 + 64 : n;
        for (int64_t i = i0; i < i1; i++) {
            uint64_t v = vals[i] & mask;
            int64_t bit = i * (int64_t)width;
            int64_t wi = bit >> 6;
            int r = (int)(bit & 63);
            words[wi] |= v << r;
            if (r + width > 64) words[wi + 1] |= v >> (64 - r);
        }
    }
}

}  // extern "C"


namespace {

// End of the line starting at i (exclusive, '\n' not included).
inline int64_t mz_line_end(const char* buf, int64_t n, int64_t i) {
    const char* p = (const char*)memchr(buf + i, '\n', (size_t)(n - i));
    return p ? (int64_t)(p - buf) : n;
}

inline int64_t mz_skip_nl(int64_t n, int64_t e) { return e < n ? e + 1 : n; }

}  // namespace

extern "C" {

// FASTQ record scan (pass 1 of the fused parse+pack): count records and
// the max sequence length. Line framing matches mazu_tpu/io/fastq.py
// read_fastq exactly — lines split on '\n' only (a '\r' is sequence
// content), multi-line sequence/quality blocks, blank lines skipped at
// record boundaries. Returns R, or -1 for anything the fast path does
// not cover (malformed/truncated/empty-sequence records) — the caller
// falls back to the Python reader, which raises the proper error.
int64_t fastq_count(const char* buf, int64_t n, int64_t* out_maxlen) {
    int64_t i = 0, R = 0, maxlen = 0;
    while (i < n) {
        int64_t e = mz_line_end(buf, n, i);
        if (e == i) { i = mz_skip_nl(n, e); continue; }  // blank line
        if (buf[i] != '@') return -1;
        i = mz_skip_nl(n, e);
        int64_t slen = 0;
        bool plus = false;
        while (i < n) {
            e = mz_line_end(buf, n, i);
            if (e > i && buf[i] == '+') { plus = true; i = mz_skip_nl(n, e); break; }
            slen += e - i;
            i = mz_skip_nl(n, e);
        }
        if (!plus || slen == 0) return -1;
        int64_t qlen = 0;
        while (i < n && qlen < slen) {
            e = mz_line_end(buf, n, i);
            qlen += e - i;
            i = mz_skip_nl(n, e);
        }
        if (qlen != slen) return -1;
        if (slen > maxlen) maxlen = slen;
        R++;
    }
    *out_maxlen = maxlen;
    return R;
}

// Pass 2: fill the pack_reads device layout straight from the FASTQ text —
// per-read stride-aligned 2-bit words (LSB-first, SeqVector convention),
// 1-bit/base bad mask for non-ACGT, int32 lengths. words/badw must be
// zeroed with capacity R*stride/32 (+pad) and R*stride/64 (+pad) words.
// Returns 1 if any bad base, 0 if none, -1 on structural mismatch.
int64_t fastq_fill(const char* buf, int64_t n, int64_t R, int64_t stride,
                   uint64_t* words, uint64_t* badw, int32_t* lengths) {
    static uint8_t lut[256];
    static bool init = false;
    if (!init) {
        memset(lut, 255, 256);
        lut['A'] = lut['a'] = 0;
        lut['C'] = lut['c'] = 1;
        lut['G'] = lut['g'] = 2;
        lut['T'] = lut['t'] = 3;
        init = true;
    }
    int64_t i = 0, r = 0, has_bad = 0;
    while (i < n) {
        int64_t e = mz_line_end(buf, n, i);
        if (e == i) { i = mz_skip_nl(n, e); continue; }
        if (buf[i] != '@' || r >= R) return -1;
        i = mz_skip_nl(n, e);
        int64_t slen = 0;
        bool plus = false;
        const int64_t base = r * stride;
        while (i < n) {
            e = mz_line_end(buf, n, i);
            if (e > i && buf[i] == '+') { plus = true; i = mz_skip_nl(n, e); break; }
            for (int64_t j = i; j < e; j++) {
                uint8_t c = lut[(uint8_t)buf[j]];
                const int64_t idx = base + slen + (j - i);
                if (c == 255) {
                    badw[idx >> 6] |= 1ull << (idx & 63);
                    has_bad = 1;
                    c = 0;
                }
                words[idx >> 5] |= (uint64_t)c << ((idx & 31) * 2);
            }
            slen += e - i;
            i = mz_skip_nl(n, e);
        }
        if (!plus || slen > stride) return -1;
        lengths[r++] = (int32_t)slen;
        int64_t qlen = 0;
        while (i < n && qlen < slen) {
            e = mz_line_end(buf, n, i);
            qlen += e - i;
            i = mz_skip_nl(n, e);
        }
        if (qlen != slen) return -1;
    }
    return (r == R) ? has_bad : -1;
}

}  // extern "C"


extern "C" {

// murmur3 fmix32 (parity: mazu_tpu/kphf/boophf32.py mix32)
static inline uint32_t mz_mix32(uint32_t x) {
    x ^= x >> 16; x *= 0x85EBCA6Bu;
    x ^= x >> 13; x *= 0xC2B2AE35u;
    return x ^ (x >> 16);
}

static inline uint64_t mz_revcomp(uint64_t v, int k) {
    uint64_t x = ~v;
    x = ((x >> 2) & 0x3333333333333333ull) | ((x & 0x3333333333333333ull) << 2);
    x = ((x >> 4) & 0x0F0F0F0F0F0F0F0Full) | ((x & 0x0F0F0F0F0F0F0F0Full) << 4);
    x = ((x >> 8) & 0x00FF00FF00FF00FFull) | ((x & 0x00FF00FF00FF00FFull) << 8);
    x = ((x >> 16) & 0x0000FFFF0000FFFFull) | ((x & 0x0000FFFF0000FFFFull) << 16);
    x = (x >> 32) | (x << 32);
    return x >> (64 - 2 * k);
}

// Canonical minimizers of the k-mers starting at kpos[] in the packed
// 2-bit useq (parity: mazu_tpu/kmer.py canonical_minimizer_batch with
// hash32 ordering: strict-< leftmost-win scan over the canonical word's
// k-w+1 windows; offset j if forward-canonical else k-w-j).
void minimizer_scan32(const uint64_t* useq_words, const int64_t* kpos,
                      int64_t n, int k, int w, uint32_t seed32,
                      uint64_t* mm_out, int32_t* off_out, uint8_t* isfw_out) {
    const int n_win = k - w + 1;
    const uint64_t mk = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
    const uint64_t mw = (1ull << (2 * w)) - 1;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        const int64_t bit = kpos[i] * 2;
        const int64_t wi = bit >> 6;
        const int r = (int)(bit & 63);
        uint64_t lo = useq_words[wi];
        uint64_t hi = useq_words[wi + 1];
        uint64_t g = r ? ((lo >> r) | (hi << (64 - r))) : lo;
        g &= mk;
        const uint64_t rc = mz_revcomp(g, k);
        const bool is_fw = g <= rc;
        const uint64_t c = is_fw ? g : rc;
        uint64_t best_mv = c & mw;
        uint32_t best_sc = mz_mix32((uint32_t)best_mv ^ seed32);
        int best_j = 0;
        for (int j = 1; j < n_win; j++) {
            const uint64_t mv = (c >> (2 * j)) & mw;
            const uint32_t sc = mz_mix32((uint32_t)mv ^ seed32);
            if (sc < best_sc) { best_sc = sc; best_mv = mv; best_j = j; }
        }
        mm_out[i] = best_mv;
        off_out[i] = is_fw ? best_j : (k - w - best_j);
        isfw_out[i] = is_fw ? 1 : 0;
    }
}

}  // extern "C"


#include <atomic>

extern "C" {

// ---------------------------------------------------------------------------
// Gbp-scale build kernels (round 4): parallel radix sort of (minimizer, pos)
// pairs, BooPHF32 level construction + batched lookup, run-length bounds.
// These replace the NumPy argsort/bincount/searchsorted chain that cost
// ~11,800s of the 13,791s 3Gbp build (.ckpts/build_3g.log). Parity: each
// kernel reproduces the corresponding mazu_tpu/kphf/boophf32.py /
// kphf/sshash.py NumPy stage bit-for-bit (tested).
// ---------------------------------------------------------------------------

// LSD radix sort of u64 keys carrying one i64 value, 8-bit digits,
// parallel histogram + stable per-thread scatter. key_bits bounds the
// number of passes (minimizers are < 4^w). Scratch is allocated here
// (one double buffer, reused across passes).
void radix_sort_pairs_u64(uint64_t* keys, int64_t* vals, int64_t n,
                          int key_bits) {
    if (n <= 1) return;
#ifdef _OPENMP
    int nt = omp_get_max_threads();
#else
    int nt = 1;
#endif
    int passes = (key_bits + 7) / 8;
    uint64_t* kbuf = new uint64_t[n];
    int64_t* vbuf = new int64_t[n];
    uint64_t* src_k = keys; int64_t* src_v = vals;
    uint64_t* dst_k = kbuf; int64_t* dst_v = vbuf;
    // hist[t][d]: count of digit d in thread t's block
    int64_t* hist = new int64_t[(int64_t)nt * 256];
    int64_t block = (n + nt - 1) / nt;
    for (int p = 0; p < passes; p++) {
        int shift = p * 8;
#pragma omp parallel num_threads(nt)
        {
#ifdef _OPENMP
            int t = omp_get_thread_num();
#else
            int t = 0;
#endif
            int64_t a = t * block, b = a + block < n ? a + block : n;
            int64_t* h = hist + (int64_t)t * 256;
            for (int d = 0; d < 256; d++) h[d] = 0;
            for (int64_t i = a; i < b; i++) h[(src_k[i] >> shift) & 255]++;
#pragma omp barrier
#pragma omp single
            {
                // digit-major exclusive prefix: thread t's digit-d run
                // starts at sum of all counts of digits < d plus counts of
                // digit d in threads < t (stable order)
                int64_t acc = 0;
                for (int d = 0; d < 256; d++)
                    for (int tt = 0; tt < nt; tt++) {
                        int64_t c = hist[(int64_t)tt * 256 + d];
                        hist[(int64_t)tt * 256 + d] = acc;
                        acc += c;
                    }
            }
            for (int64_t i = a; i < b; i++) {
                int64_t o = h[(src_k[i] >> shift) & 255]++;
                dst_k[o] = src_k[i];
                dst_v[o] = src_v[i];
            }
        }
        uint64_t* tk = src_k; src_k = dst_k; dst_k = tk;
        int64_t* tv = src_v; src_v = dst_v; dst_v = tv;
    }
    if (src_k != keys) {  // odd pass count: copy back
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; i++) { keys[i] = src_k[i]; vals[i] = src_v[i]; }
    }
    delete[] hist;
    delete[] kbuf;
    delete[] vbuf;
}

// Run-length bounds of a sorted u64 stream: count of distinct runs
// (pass 1, starts == nullptr) and the run start indices (pass 2).
// Parity: np.flatnonzero(mms[1:] != mms[:-1]) prepended with 0.
int64_t run_bounds_u64(const uint64_t* mms, int64_t n, int64_t* starts) {
    if (n == 0) return 0;
#ifdef _OPENMP
    int nt = omp_get_max_threads();
#else
    int nt = 1;
#endif
    int64_t block = (n + nt - 1) / nt;
    int64_t* cnt = new int64_t[nt + 1];
    cnt[0] = 0;
#pragma omp parallel num_threads(nt)
    {
#ifdef _OPENMP
        int t = omp_get_thread_num();
#else
        int t = 0;
#endif
        int64_t a = t * block, b = a + block < n ? a + block : n;
        int64_t c = 0;
        for (int64_t i = a; i < b; i++)
            c += (i == 0) || (mms[i] != mms[i - 1]);
        cnt[t + 1] = c;
#pragma omp barrier
#pragma omp single
        for (int i = 1; i <= nt; i++) cnt[i] += cnt[i - 1];
        if (starts) {
            int64_t o = cnt[t];
            for (int64_t i = a; i < b; i++)
                if ((i == 0) || (mms[i] != mms[i - 1])) starts[o++] = i;
        }
    }
    int64_t m = cnt[nt];
    delete[] cnt;
    return m;
}

// xorshift128-ish chain step (parity: boophf32.py chain_next)
static inline uint32_t mz_chain_next(uint32_t& s0, uint32_t& s1) {
    uint32_t t = s1 ^ (s1 << 13);
    t ^= t >> 17;
    t ^= s0 ^ (s0 >> 5);
    uint32_t h = t + s0;
    s0 = s1;
    s1 = t;
    return h;
}

// One BooPHF32 level: advance each remaining key's chain state, mark
// singleton positions in the level bitmap, flag dropped (singleton) keys.
// words (u32[n_bits/32], zeroed by caller) receives the singleton bitmap
// == NumPy's (bincount(pos) == 1) scatter. seen2 is internal scratch.
// drop[i]=1 iff key i landed on a singleton slot (leaves the rem set).
void boophf32_level(const uint64_t* keys, uint32_t* s0, uint32_t* s1,
                    int64_t n, int64_t n_bits, uint32_t* words,
                    uint8_t* drop) {
    const uint32_t mask = (uint32_t)(n_bits - 1);
    int64_t nw = n_bits / 32;
    std::atomic<uint32_t>* A = (std::atomic<uint32_t>*)words;
    uint32_t* Braw = new uint32_t[nw]();
    std::atomic<uint32_t>* B = (std::atomic<uint32_t>*)Braw;
    uint32_t* pos = new uint32_t[n];
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        uint32_t h = mz_chain_next(s0[i], s1[i]);
        uint32_t p = h & mask;
        pos[i] = p;
        uint32_t bit = 1u << (p & 31);
        uint32_t old = A[p >> 5].fetch_or(bit, std::memory_order_relaxed);
        if (old & bit) B[p >> 5].fetch_or(bit, std::memory_order_relaxed);
    }
    // words := seen-once & ~seen-twice == exactly-once (singletons)
#pragma omp parallel for schedule(static)
    for (int64_t w = 0; w < nw; w++) words[w] &= ~Braw[w];
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        uint32_t p = pos[i];
        drop[i] = (words[p >> 5] >> (p & 31)) & 1u;
    }
    delete[] Braw;
    delete[] pos;
}

// Stable compaction of (keys, s0, s1) where drop[i]==0 into the output
// arrays; returns the kept count.
int64_t compact_kept(const uint64_t* keys, const uint32_t* s0,
                     const uint32_t* s1, const uint8_t* drop, int64_t n,
                     uint64_t* out_keys, uint32_t* out_s0, uint32_t* out_s1) {
#ifdef _OPENMP
    int nt = omp_get_max_threads();
#else
    int nt = 1;
#endif
    int64_t block = (n + nt - 1) / nt;
    int64_t* cnt = new int64_t[nt + 1];
    cnt[0] = 0;
#pragma omp parallel num_threads(nt)
    {
#ifdef _OPENMP
        int t = omp_get_thread_num();
#else
        int t = 0;
#endif
        int64_t a = t * block, b = a + block < n ? a + block : n;
        int64_t c = 0;
        for (int64_t i = a; i < b; i++) c += !drop[i];
        cnt[t + 1] = c;
#pragma omp barrier
#pragma omp single
        for (int i = 1; i <= nt; i++) cnt[i] += cnt[i - 1];
        int64_t o = cnt[t];
        for (int64_t i = a; i < b; i++)
            if (!drop[i]) { out_keys[o] = keys[i]; out_s0[o] = s0[i]; out_s1[o] = s1[i]; o++; }
    }
    int64_t m = cnt[nt];
    delete[] cnt;
    return m;
}

// Batched BooPHF32 lookup over the padded device-array layout (parity:
// boophf32.py boophf32_lookup / device_arrays): words = per-level
// bitmaps padded to 256-bit blocks and concatenated; ranks = per-level
// 256-bit-block prefix counts (global value offsets baked in); final
// hash = sorted fh_keys + fh_vals. out[i] = value or -1 (definite miss).
void boophf32_lookup_batch(const uint32_t* words, const uint32_t* ranks,
                           int n_levels, const int64_t* n_bits,
                           const int64_t* word_off, const int64_t* rank_off,
                           const uint64_t* fh_keys, const uint32_t* fh_vals,
                           int64_t n_fh, const uint64_t* keys, int64_t n,
                           int32_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        uint64_t key = keys[i];
        uint32_t lo = (uint32_t)key, hi = (uint32_t)(key >> 32);
        uint32_t s0 = mz_mix32(lo ^ 0x9E3779B9u);
        uint32_t s1 = mz_mix32(hi ^ 0x85EBCA6Bu) ^ lo;
        int32_t res = -1;
        for (int li = 0; li < n_levels; li++) {
            uint32_t h = mz_chain_next(s0, s1);
            uint32_t p = h & (uint32_t)(n_bits[li] - 1);
            const uint32_t* w = words + word_off[li];
            if ((w[p >> 5] >> (p & 31)) & 1u) {
                uint32_t r = ranks[rank_off[li] + (p >> 8)];
                uint32_t wi = p >> 5;
                for (uint32_t b = (p >> 8) << 3; b < wi; b++)
                    r += (uint32_t)__builtin_popcount(w[b]);
                uint32_t off = p & 31;
                if (off) r += (uint32_t)__builtin_popcount(w[wi] & (~0u >> (32 - off)));
                res = (int32_t)r;
                break;
            }
        }
        if (res < 0 && n_fh > 0) {
            int64_t a = 0, b = n_fh;
            while (a < b) {
                int64_t mid = (a + b) >> 1;
                if (fh_keys[mid] < key) a = mid + 1; else b = mid;
            }
            if (a < n_fh && fh_keys[a] == key) res = (int32_t)fh_vals[a];
        }
        out[i] = res;
    }
}

// Canonical minimizer scan with ON-THE-FLY k-mer positions: ranges
// (starts[r], counts[r]) generate kpos = starts[r]+j without the 8B/kmer
// kpos array (a pure ~24 GB page-fault cost at 3Gbp), and the occurrence
// position (kpos + offset) is written directly. Parity: minimizer_scan32
// over expand_ranges(starts, counts).
void minimizer_scan32_ranges(const uint64_t* useq_words,
                             const int64_t* starts, const int64_t* counts,
                             const int64_t* offsets, int64_t nr, int k,
                             int w, uint32_t seed32, uint64_t* mm_out,
                             int64_t* occ_pos_out, uint8_t* isfw_out) {
    const int n_win = k - w + 1;
    const uint64_t mk = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
    const uint64_t mw = (1ull << (2 * w)) - 1;
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t r = 0; r < nr; r++) {
        const int64_t s = starts[r], c = counts[r], o = offsets[r];
        for (int64_t j = 0; j < c; j++) {
            const int64_t kpos = s + j;
            const int64_t bit = kpos * 2;
            const int64_t wi = bit >> 6;
            const int rr = (int)(bit & 63);
            uint64_t lo = useq_words[wi];
            uint64_t hi = useq_words[wi + 1];
            uint64_t g = rr ? ((lo >> rr) | (hi << (64 - rr))) : lo;
            g &= mk;
            const uint64_t rc = mz_revcomp(g, k);
            const bool is_fw = g <= rc;
            const uint64_t cn = is_fw ? g : rc;
            uint64_t best_mv = cn & mw;
            uint32_t best_sc = mz_mix32((uint32_t)best_mv ^ seed32);
            int best_j = 0;
            for (int jj = 1; jj < n_win; jj++) {
                const uint64_t mv = (cn >> (2 * jj)) & mw;
                const uint32_t sc = mz_mix32((uint32_t)mv ^ seed32);
                if (sc < best_sc) { best_sc = sc; best_mv = mv; best_j = jj; }
            }
            mm_out[o + j] = best_mv;
            occ_pos_out[o + j] = kpos + (is_fw ? best_j : (k - w - best_j));
            isfw_out[o + j] = is_fw ? 1 : 0;
        }
    }
}

// Batched k-merize over many reads in one call (round 5: the serving
// map path was paying per-read ctypes dispatch — 16K reads cost more
// host time than the query kernel). codes = concatenated read codes;
// read r spans [bounds[r], bounds[r+1]); its windows are written
// compacted at cap_off[r] (capacity len-k+1); counts[r] = emitted.
void kmerize_batch(const uint8_t* codes, const int64_t* bounds,
                   int64_t n_reads, int k, const int64_t* cap_off,
                   int64_t* pos_out, uint64_t* word_out, int64_t* counts) {
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t r = 0; r < n_reads; r++) {
        counts[r] = kmerize(codes + bounds[r], bounds[r + 1] - bounds[r], k,
                            pos_out + cap_off[r], word_out + cap_off[r]);
    }
}

}  // extern "C"
