// Native data-loading kernels (the host-side hot path of construction and
// query batching — the role kseq + KMer packing play in the reference's C++
// pipeline, re-designed for the array layout this framework uses).
//
// Exposed via a plain C ABI and loaded with ctypes; every function operates
// on caller-allocated numpy buffers.
//
// Build: make native  (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstddef>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#ifdef __BMI2__
#include <immintrin.h>
#endif

extern "C" {

// Encode a FASTA/FASTQ text buffer into DNA codes ($=0,A=1,C=2,G=3,T=4,
// invalid/separator=5).  Sequences are concatenated, each followed by one
// separator code.  Returns the number of code bytes written; record start
// offsets (into the code array) are written to record_offsets (capacity
// max_records), record count to n_records.
int64_t fasta_encode(const uint8_t *data, int64_t size,
                     uint8_t *codes, int64_t *record_offsets,
                     int64_t max_records, int64_t *n_records) {
    static uint8_t table[256];
    static bool init = false;
    if (!init) {
        memset(table, 5, sizeof(table));
        table['A'] = table['a'] = 1;
        table['C'] = table['c'] = 2;
        table['G'] = table['g'] = 3;
        table['T'] = table['t'] = 4;
        table['U'] = table['u'] = 4;
        init = true;
    }

    int64_t out = 0;
    int64_t recs = 0;
    int64_t i = 0;
    bool fastq = size > 0 && data[0] == '@';
    while (i < size) {
        // header line
        if (data[i] == '>' || data[i] == '@') {
            if (recs > 0)
                codes[out++] = 5;  // separator after previous record
            if (recs >= max_records)
                return -1;
            record_offsets[recs++] = out;
            while (i < size && data[i] != '\n') ++i;
            ++i;
            if (fastq) {
                // sequence line(s) until '+'
                int64_t seq_len = 0;
                while (i < size && data[i] != '+') {
                    if (data[i] != '\n' && data[i] != '\r') {
                        codes[out++] = table[data[i]];
                        ++seq_len;
                    }
                    ++i;
                }
                // skip the '+' line, then quality lines until the quality
                // length matches the sequence length (kseq semantics —
                // wrapped quality blocks span multiple lines and may start
                // with '@')
                while (i < size && data[i] != '\n') ++i;
                ++i;
                int64_t qlen = 0;
                while (i < size && qlen < seq_len) {
                    if (data[i] != '\n' && data[i] != '\r')
                        ++qlen;
                    ++i;
                }
                // consume the trailing newline of the last quality line
                while (i < size && (data[i] == '\n' || data[i] == '\r')) ++i;
            }
            continue;
        }
        if (data[i] != '\n' && data[i] != '\r')
            codes[out++] = table[data[i]];
        ++i;
    }
    if (recs > 0)
        codes[out++] = 5;
    *n_records = recs;
    return out;
}

// Pack every k-window of `codes` (length n) into W=ceil(k/16) uint64 nibble
// words in BOSS one-swapped co-lex priority order (priority p < k-1 maps to
// char index i+k-2-p; priority k-1 maps to i+k-1).  Invalid windows (any
// code > 4) are filled with 0xFF.. sentinel keys.  Rolling update: each
// window is derived from its predecessor with shifts.
void pack_windows_boss(const uint8_t *codes, int64_t n, int32_t k,
                       uint64_t *out /* (n-k+1) * W */) {
    const int32_t W = (k + 15) / 16;
    const int64_t n_win = n - k + 1;
    if (n_win <= 0)
        return;

    // validity via running count of invalid codes
    int64_t bad = 0;
    for (int32_t j = 0; j < k; ++j)
        bad += codes[j] > 4;

    // priority sequence for window i: codes[i+k-2], ..., codes[i], codes[i+k-1]
    // nibble-packed MSB-first into W words
    for (int64_t i = 0; i < n_win; ++i) {
        if (i > 0) {
            bad -= codes[i - 1] > 4;
            bad += codes[i + k - 1] > 4;
        }
        uint64_t *row = out + i * W;
        if (bad > 0) {
            for (int32_t w = 0; w < W; ++w)
                row[w] = ~0ULL;
            continue;
        }
        int32_t p = 0;
        for (int32_t w = 0; w < W; ++w) {
            uint64_t acc = 0;
            for (int32_t slot = 0; slot < 16 && p < k; ++slot, ++p) {
                int64_t ci = p < k - 1 ? i + k - 2 - p : i + k - 1;
                acc |= (uint64_t)codes[ci] << (60 - 4 * slot);
            }
            row[w] = acc;
        }
    }
}

// Same, but packing into uint32 words (8 nibbles each) — the device layout.
void pack_windows_boss32(const uint8_t *codes, int64_t n, int32_t k,
                         uint32_t *out /* (n-k+1) * W32 */) {
    const int32_t W = (k + 7) / 8;
    const int64_t n_win = n - k + 1;
    if (n_win <= 0)
        return;
    int64_t bad = 0;
    for (int32_t j = 0; j < k; ++j)
        bad += codes[j] > 4;
    for (int64_t i = 0; i < n_win; ++i) {
        if (i > 0) {
            bad -= codes[i - 1] > 4;
            bad += codes[i + k - 1] > 4;
        }
        uint32_t *row = out + i * W;
        if (bad > 0) {
            for (int32_t w = 0; w < W; ++w)
                row[w] = ~0U;
            continue;
        }
        int32_t p = 0;
        for (int32_t w = 0; w < W; ++w) {
            uint32_t acc = 0;
            for (int32_t slot = 0; slot < 8 && p < k; ++slot, ++p) {
                int64_t ci = p < k - 1 ? i + k - 2 - p : i + k - 1;
                acc |= (uint32_t)codes[ci] << (28 - 4 * slot);
            }
            row[w] = acc;
        }
    }
}

// Symmetric DUST low-complexity test over a raw byte window (Morgulis et
// al. 2006; the reference seeder calls sdust with T=20 W=64,
// aligner_seeder_methods.cpp:22).  Returns 1 if some interval of at most
// W-2 triplets has pair score * 10 > T * (l - 1).
int dust_low_complexity(const uint8_t *window, int64_t n, int32_t T,
                        int32_t W) {
    if (n < 3)
        return 0;
    int64_t max_span = W - 2;
    // triplet codes per maximal ACGT run, processed in overlapping slabs so
    // runs longer than the buffer are still fully scanned (slab overlap
    // max_span-1 keeps every start's full window intact)
    int trips_buf[4096];
    if (max_span > 2048)
        max_span = 2048;  // slab invariant: overlap < buffer (W<=64 in refs)
    int64_t ri = 0;
    int t = 0, valid = 0;
    // scan starts [0, lim) of trips_buf[0..ri)
    auto scan = [&](int64_t lim) -> int {
        for (int64_t i = 0; i < lim; ++i) {
            int counts[64] = {0};
            int64_t pairs = 0;
            int64_t jend = i + max_span < ri ? i + max_span : ri;
            for (int64_t j = i; j < jend; ++j) {
                int c = counts[trips_buf[j]];
                pairs += c;
                counts[trips_buf[j]] = c + 1;
                int64_t l = j - i + 1;
                if (l > 1 && pairs * 10 > (int64_t)T * (l - 1))
                    return 1;
            }
        }
        return 0;
    };
    for (int64_t p = 0; p <= n; ++p) {
        int b = -1;
        if (p < n) {
            uint8_t ch = window[p];
            switch (ch) {
                case 'A': case 'a': b = 0; break;
                case 'C': case 'c': b = 1; break;
                case 'G': case 'g': b = 2; break;
                case 'T': case 't': b = 3; break;
            }
        }
        if (b < 0) {
            // end of run: scan every remaining start
            if (scan(ri))
                return 1;
            ri = 0;
            valid = 0;
            continue;
        }
        t = ((t << 2) | b) & 63;
        ++valid;
        if (valid >= 3) {
            if (ri == 4096) {
                // slab full: starts [0, ri-max_span] have complete windows;
                // shift the unscanned tail down and keep filling
                if (scan(ri - max_span + 1))
                    return 1;
                int64_t keep = max_span - 1;
                memmove(trips_buf, trips_buf + (ri - keep),
                        keep * sizeof(int));
                ri = keep;
            }
            trips_buf[ri++] = t;
        }
    }
    return 0;
}

// Pack (N, K) uint8 code matrices into (N, W) uint64 nibble words with an
// arbitrary column priority order (most significant first) — the generic
// batch variant of pack_windows_boss used by construction and host lookups.
void pack_rows64(const uint8_t *chars, int64_t N, int32_t K,
                 const int32_t *order, uint64_t *out /* N * W */,
                 int32_t n_threads) {
    const int32_t W = (K + 15) / 16;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = chars + i * K;
            uint64_t *o = out + i * W;
            int32_t p = 0;
            for (int32_t w = 0; w < W; ++w) {
                uint64_t acc = 0;
                for (int32_t slot = 0; slot < 16 && p < K; ++slot, ++p) {
                    acc |= (uint64_t)row[order[p]] << (60 - 4 * slot);
                }
                o[w] = acc;
            }
        }
    };
    if (n_threads <= 1 || N < (1 << 16)) {
        work(0, N);
        return;
    }
    // data-parallel ingest: row ranges across worker threads (the role of
    // the reference's KmerCollector worker pool, kmer_collector.cpp:27-100)
    std::vector<std::thread> ths;
    int64_t per = (N + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
        int64_t lo = t * per, hi = std::min<int64_t>(lo + per, N);
        if (lo < hi)
            ths.emplace_back(work, lo, hi);
    }
    for (auto &th : ths)
        th.join();
}

// --------------------------------------------------------------------------
// C-speed reference-equivalent batch query baseline.
//
// The reference engine (ratschlab/metagraph) could not be built in this
// environment (its external-libraries/ submodules are empty and there is no
// network egress), so this implements the same per-core work its batch query
// path performs (src/cli/query.cpp:1304 batched query + annotated_dbg.cpp
// sum_rows label counting): open-addressing hash lookup per k-mer window,
// then per-sequence per-label occurrence counting over a column-major row
// bitmap.  Word-at-a-time popcount iteration makes this *faster* than the
// reference's per-column bit tests — a conservative (hard-to-beat) baseline.

static inline uint64_t refbase_hash(const uint32_t *key, int32_t W) {
    uint64_t h = 0x9E3779B97F4A7C15ull;
    for (int32_t w = 0; w < W; ++w) {
        h ^= key[w];
        h *= 0xFF51AFD7ED558CCDull;
        h ^= h >> 33;
    }
    return h;
}

// Build an open-addressing (linear probing) table.  M must be a power of two
// > n.  Empty slots are marked by tids == 0xFFFFFFFF.
void refbase_build(const uint32_t *keys, const uint32_t *ids, int64_t n,
                   int32_t W, uint32_t *tkeys, uint32_t *tids, int64_t M) {
    memset(tids, 0xFF, M * sizeof(uint32_t));
    for (int64_t i = 0; i < n; ++i) {
        uint64_t slot = refbase_hash(keys + i * W, W) & (uint64_t)(M - 1);
        while (tids[slot] != 0xFFFFFFFFu)
            slot = (slot + 1) & (uint64_t)(M - 1);
        memcpy(tkeys + slot * W, keys + i * W, W * sizeof(uint32_t));
        tids[slot] = ids[i];
    }
}

static void refbase_query_range(
        const uint32_t *tkeys, const uint32_t *tids, int64_t M, int32_t W,
        const uint32_t *queries, const int32_t *seq_ids, int64_t q0,
        int64_t q1, const uint32_t *bitmap, int64_t R, int32_t Lw, int32_t L,
        int32_t *counts /* S*L */, int32_t *present /* S */) {
    for (int64_t q = q0; q < q1; ++q) {
        const uint32_t *key = queries + q * W;
        uint64_t slot = refbase_hash(key, W) & (uint64_t)(M - 1);
        uint32_t row = 0xFFFFFFFFu;
        while (tids[slot] != 0xFFFFFFFFu) {
            if (memcmp(tkeys + slot * W, key, W * sizeof(uint32_t)) == 0) {
                row = tids[slot];
                break;
            }
            slot = (slot + 1) & (uint64_t)(M - 1);
        }
        if (row == 0xFFFFFFFFu)
            continue;
        // annotation row = node - 1 (annotated_dbg.hpp:50)
        int64_t r = (int64_t)row - 1;
        if (r < 0 || r >= R)
            continue;
        int32_t s = seq_ids[q];
        ++present[s];
        const uint32_t *rw = bitmap + r * Lw;
        int32_t *cr = counts + (int64_t)s * L;
        for (int32_t w = 0; w < Lw; ++w) {
            uint32_t bits = rw[w];
            while (bits) {
                int b = __builtin_ctz(bits);
                ++cr[w * 32 + b];
                bits &= bits - 1;
            }
        }
    }
}

void refbase_query(const uint32_t *tkeys, const uint32_t *tids, int64_t M,
                   int32_t W, const uint32_t *queries, const int32_t *seq_ids,
                   int64_t Q, const uint32_t *bitmap, int64_t R, int32_t Lw,
                   int32_t L, int32_t S, int32_t *counts, int32_t *present,
                   int32_t n_threads) {
    memset(counts, 0, (int64_t)S * L * sizeof(int32_t));
    memset(present, 0, S * sizeof(int32_t));
    if (n_threads <= 1) {
        refbase_query_range(tkeys, tids, M, W, queries, seq_ids, 0, Q, bitmap,
                            R, Lw, L, counts, present);
        return;
    }
    std::vector<std::vector<int32_t>> tc(n_threads), tp(n_threads);
    std::vector<std::thread> threads;
    int64_t per = (Q + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
        tc[t].assign((int64_t)S * L, 0);
        tp[t].assign(S, 0);
        int64_t q0 = t * per, q1 = q0 + per < Q ? q0 + per : Q;
        threads.emplace_back(refbase_query_range, tkeys, tids, M, W, queries,
                             seq_ids, q0, q1, bitmap, R, Lw, L, tc[t].data(),
                             tp[t].data());
    }
    for (auto &th : threads)
        th.join();
    for (int32_t t = 0; t < n_threads; ++t) {
        for (int64_t i = 0; i < (int64_t)S * L; ++i)
            counts[i] += tc[t][i];
        for (int32_t s = 0; s < S; ++s)
            present[s] += tp[t][s];
    }
}

// Batch hash lookup only (no counting): packed window keys -> node ids
// (0 = miss).  The host (non-device) query path's map_to_nodes core — same
// table layout as refbase_query (ref query.cpp:1304 construct_query_graph's
// map step).
static void refbase_lookup_range(
        const uint32_t *tkeys, const uint32_t *tids, int64_t M, int32_t W,
        const uint32_t *queries, int64_t q0, int64_t q1, int64_t *out) {
    for (int64_t q = q0; q < q1; ++q) {
        const uint32_t *key = queries + q * W;
        uint64_t slot = refbase_hash(key, W) & (uint64_t)(M - 1);
        int64_t node = 0;
        while (tids[slot] != 0xFFFFFFFFu) {
            if (memcmp(tkeys + slot * W, key, W * sizeof(uint32_t)) == 0) {
                node = (int64_t)tids[slot];
                break;
            }
            slot = (slot + 1) & (uint64_t)(M - 1);
        }
        out[q] = node;
    }
}

void refbase_lookup(const uint32_t *tkeys, const uint32_t *tids, int64_t M,
                    int32_t W, const uint32_t *queries, int64_t Q,
                    int64_t *out, int32_t n_threads) {
    if (n_threads <= 1 || Q < (1 << 14)) {
        refbase_lookup_range(tkeys, tids, M, W, queries, 0, Q, out);
        return;
    }
    std::vector<std::thread> threads;
    int64_t per = (Q + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
        int64_t q0 = t * per, q1 = q0 + per < Q ? q0 + per : Q;
        if (q0 >= q1)
            break;
        threads.emplace_back(refbase_lookup_range, tkeys, tids, M, W,
                             queries, q0, q1, out);
    }
    for (auto &th : threads)
        th.join();
}

// Per-sequence per-label occurrence counting from PRE-MAPPED annotation rows
// (-1 = miss).  The counting half of refbase_query, for callers that already
// ran node mapping (canonical folding, rc resolution etc. happen upstream).
// seq_ids must be non-decreasing (the natural batch layout): threads split
// at sequence boundaries and write disjoint count rows — no merge needed.
static void count_rows_range(
        const int64_t *rows, const int32_t *seq_ids, int64_t q0, int64_t q1,
        const uint32_t *bitmap, int64_t R, int32_t Lw, int32_t L,
        int32_t *counts, int32_t *present) {
    for (int64_t q = q0; q < q1; ++q) {
        int64_t r = rows[q];
        if (r < 0 || r >= R)
            continue;
        int32_t s = seq_ids[q];
        ++present[s];
        const uint32_t *rw = bitmap + r * Lw;
        int32_t *cr = counts + (int64_t)s * L;
        for (int32_t w = 0; w < Lw; ++w) {
            uint32_t bits = rw[w];
            while (bits) {
                int b = __builtin_ctz(bits);
                ++cr[w * 32 + b];
                bits &= bits - 1;
            }
        }
    }
}

void count_rows(const int64_t *rows, const int32_t *seq_ids, int64_t Q,
                const uint32_t *bitmap, int64_t R, int32_t Lw, int32_t L,
                int32_t S, int32_t *counts, int32_t *present,
                int32_t n_threads) {
    memset(counts, 0, (int64_t)S * L * sizeof(int32_t));
    memset(present, 0, S * sizeof(int32_t));
    if (n_threads <= 1 || Q < (1 << 14)) {
        count_rows_range(rows, seq_ids, 0, Q, bitmap, R, Lw, L, counts,
                         present);
        return;
    }
    // split points aligned to sequence boundaries (seq_ids non-decreasing)
    std::vector<int64_t> cuts;
    cuts.push_back(0);
    int64_t per = (Q + n_threads - 1) / n_threads;
    for (int32_t t = 1; t < n_threads; ++t) {
        int64_t q = t * per;
        if (q >= Q)
            break;
        while (q < Q && q > 0 && seq_ids[q] == seq_ids[q - 1])
            ++q;                      // advance to the next sequence start
        if (q > cuts.back() && q < Q)
            cuts.push_back(q);
    }
    cuts.push_back(Q);
    std::vector<std::thread> threads;
    for (size_t t = 0; t + 1 < cuts.size(); ++t)
        threads.emplace_back(count_rows_range, rows, seq_ids, cuts[t],
                             cuts[t + 1], bitmap, R, Lw, L, counts, present);
    for (auto &th : threads)
        th.join();
}

// Stable parallel argsort of (N, W) uint64 rows (lexicographic, word 0
// most significant) — the ips4o role in the reference's SortedSet
// (sorted_set.cpp:43).  Chunk-local std::sort with the index as the final
// tiebreak (== stable), then pairwise parallel merges.
static inline bool row_less(const uint64_t *a, const uint64_t *b, int32_t w,
                            int64_t ia, int64_t ib) {
    for (int32_t j = 0; j < w; ++j) {
        if (a[j] != b[j])
            return a[j] < b[j];
    }
    return ia < ib;
}

void argsort_rows64(const uint64_t *keys, int64_t n, int32_t w,
                    int64_t *out, int32_t n_threads) {
    for (int64_t i = 0; i < n; ++i)
        out[i] = i;
    auto cmp = [&](int64_t ia, int64_t ib) {
        return row_less(keys + ia * w, keys + ib * w, w, ia, ib);
    };
    if (n_threads <= 1 || n < (1 << 15)) {
        std::sort(out, out + n, cmp);
        return;
    }
    // power-of-two chunk count for clean pairwise merge rounds
    int32_t t = 1;
    while (t * 2 <= n_threads)
        t *= 2;
    std::vector<int64_t> bounds(t + 1);
    for (int32_t i = 0; i <= t; ++i)
        bounds[i] = n * i / t;
    {
        std::vector<std::thread> threads;
        for (int32_t i = 0; i < t; ++i)
            threads.emplace_back([&, i] {
                std::sort(out + bounds[i], out + bounds[i + 1], cmp);
            });
        for (auto &th : threads)
            th.join();
    }
    std::vector<int64_t> tmp(n);
    int64_t *src = out, *dst = tmp.data();
    for (int32_t width = 1; width < t; width *= 2) {
        std::vector<std::thread> threads;
        for (int32_t i = 0; i < t; i += 2 * width) {
            int64_t lo = bounds[i];
            int64_t mid = bounds[i + width < t ? i + width : t];
            int64_t hi = bounds[i + 2 * width < t ? i + 2 * width : t];
            threads.emplace_back([&, lo, mid, hi] {
                std::merge(src + lo, src + mid, src + mid, src + hi,
                           dst + lo, cmp);
            });
        }
        for (auto &th : threads)
            th.join();
        std::swap(src, dst);
    }
    if (src != out)
        memcpy(out, src, n * sizeof(int64_t));
}

// ------------------------------------------------------------------ bitrank
// Batch rank/select over the packed-word bit vectors built by
// metagraph_tpu/succinct/bitrank.py (two-level directory: int64 superblock
// cum count every 64 words + uint16 in-superblock word offsets).  These are
// the hot host navigation primitives (BOSS rank_W/select_W/select_last);
// ~2 ns/query vs ~100 ns for the vectorized-numpy fallback.

void bitrank_rank_batch(const uint64_t *words, const int64_t *sup,
                        const uint16_t *sub, int64_t n_bits,
                        const int64_t *idx, int64_t nq, int64_t *out) {
    for (int64_t q = 0; q < nq; ++q) {
        int64_t i = idx[q];
        if (i < 0 || n_bits == 0) {
            out[q] = 0;
            continue;
        }
        if (i >= n_bits)
            i = n_bits - 1;
        int64_t w = i >> 6;
        uint64_t mask = ~0ull >> (63 - (i & 63));
        out[q] = sup[w >> 6] + sub[w]
                 + __builtin_popcountll(words[w] & mask);
    }
}

static inline int select_in_word(uint64_t word, int r) {
    // position of the r-th (1-based) set bit
#ifdef __BMI2__
    return __builtin_ctzll(_pdep_u64(1ull << (r - 1), word));
#else
    int pos = 0;
    for (;;) {
        int c = __builtin_popcountll(word & 0xFF);
        if (r <= c)
            break;
        r -= c;
        word >>= 8;
        pos += 8;
    }
    uint64_t b = word & 0xFF;
    while (--r > 0)
        b &= b - 1;
    return pos + __builtin_ctzll(b);
#endif
}

void bitrank_select_batch(const uint64_t *words, const int64_t *sup,
                          const uint16_t *sub, int64_t nw, int64_t n_sup,
                          int64_t total, const int64_t *ranks, int64_t nq,
                          int64_t *out) {
    for (int64_t q = 0; q < nq; ++q) {
        if (total == 0) {            // no set bits: clamp past the end
            out[q] = nw * 64;
            continue;
        }
        int64_t r = ranks[q];
        if (r < 1)
            r = 1;
        else if (r > total)
            r = total;
        // last superblock with prefix count < r
        int64_t lo = 0, hi = n_sup;  // search in sup[0..n_sup)
        while (hi - lo > 1) {
            int64_t mid = (lo + hi) >> 1;
            if (sup[mid] < r)
                lo = mid;
            else
                hi = mid;
        }
        int64_t rr = r - sup[lo];
        int64_t base = lo * 64;
        int64_t wend = base + 64 < nw ? base + 64 : nw;
        int64_t w = base;
        for (int64_t j = base + 1; j < wend; ++j) {
            if (sub[j] < rr)
                w = j;
            else
                break;
        }
        int64_t rw = rr - sub[w];
        out[q] = (w << 6) + select_in_word(words[w], (int)rw);
    }
}

// ------------------------------------------------------------ BOSS navigate
// Full node/edge lookup loop in native code: the k-1 range-tightening
// iterations of BOSS::index + pick_edge (ref boss.hpp:682-718), one pass per
// query over the succinct W planes.  This is the host-side map hot path
// (metagraph_tpu/succinct/boss.py map_to_edges_batch).

struct BRView {
    const uint64_t *words;
    const int64_t *sup;
    const uint16_t *sub;
    int64_t nbits, nw, nsup, total;
};

static inline int select_in_word(uint64_t word, int r);

static inline int64_t br_rank(const BRView &v, int64_t i) {
    if (i < 0)
        return 0;
    if (i >= v.nbits)
        i = v.nbits - 1;
    int64_t w = i >> 6;
    uint64_t mask = ~0ull >> (63 - (i & 63));
    return v.sup[w >> 6] + v.sub[w]
           + __builtin_popcountll(v.words[w] & mask);
}

static inline int64_t br_select(const BRView &v, int64_t r) {
    if (v.total <= 0)
        return 0;
    if (r < 1)
        r = 1;
    else if (r > v.total)
        r = v.total;
    int64_t lo = 0, hi = v.nsup;
    while (hi - lo > 1) {
        int64_t mid = (lo + hi) >> 1;
        if (v.sup[mid] < r)
            lo = mid;
        else
            hi = mid;
    }
    int64_t rr = r - v.sup[lo];
    int64_t base = lo * 64;
    int64_t wend = base + 64 < v.nw ? base + 64 : v.nw;
    int64_t w = base;
    for (int64_t j = base + 1; j < wend; ++j) {
        if (v.sub[j] < rr)
            w = j;
        else
            break;
    }
    return (w << 6) + select_in_word(v.words[w], (int)(rr - v.sub[w]));
}

void boss_map_edges_batch(
        void *const *pw, void *const *ps, void *const *pb,
        const int64_t *pn, const int64_t *pnw, const int64_t *pnsup,
        const int64_t *ptotal,
        const void *lw, const void *lsup, const void *lsub,
        int64_t ln, int64_t lnw, int64_t lnsup, int64_t ltotal,
        const int64_t *F, const int64_t *NF, int32_t alph,
        const uint8_t *kmers, int64_t Q, int32_t k, int32_t with_edge,
        int64_t *out,
        // optional suffix-range index (ref boss.hpp:288): lookups start
        // sufL levels deep for sentinel-free prefixes.  sufL == 0 disables.
        const int64_t *suf_rl, const int64_t *suf_ru, const uint8_t *suf_ok,
        int32_t sufL) {
    int64_t M = ln;  // last has one bit per W row
    BRView last{(const uint64_t *)lw, (const int64_t *)lsup,
                (const uint16_t *)lsub, ln, lnw, lnsup, ltotal};
    std::vector<BRView> planes(2 * alph);
    for (int32_t c = 0; c < 2 * alph; ++c)
        planes[c] = BRView{(const uint64_t *)pw[c], (const int64_t *)ps[c],
                           (const uint16_t *)pb[c], pn[c], pnw[c], pnsup[c],
                           ptotal[c]};
    auto rankW = [&](int64_t i, int32_t c) -> int64_t {
        // occurrences of c in W[1..i]
        return br_rank(planes[c], i) - (c == 0 && i >= 0 ? 1 : 0);
    };
    auto select_last = [&](int64_t r) -> int64_t {
        return r > 0 ? br_select(last, r) : 0;
    };
    int32_t row = k + (with_edge ? 1 : 0);
    for (int64_t q = 0; q < Q; ++q) {
        const uint8_t *codes = kmers + q * row;
        out[q] = 0;
        bool ok = true;
        for (int32_t p = 0; p < k; ++p)
            if (codes[p] >= alph) {
                ok = false;
                break;
            }
        if (!ok || (with_edge && codes[k] >= alph))
            continue;
        int32_t p0 = 1;
        int64_t rl, ru;
        bool indexed = false;
        if (sufL > 0 && sufL < k) {
            // combo id = sum_t (c_t - 1) * (alph-1)^t, sentinel-free only
            // (ref get_initial_range, boss.hpp:645-661)
            uint64_t idx = 0;
            bool nosent = true;
            for (int32_t t = sufL - 1; t >= 0; --t) {
                if (codes[t] == 0) {
                    nosent = false;
                    break;
                }
                idx = idx * (uint64_t)(alph - 1) + (uint64_t)(codes[t] - 1);
            }
            if (nosent) {
                if (!suf_ok[idx])
                    continue;            // npos (ref boss.hpp:707-708)
                rl = suf_rl[idx];
                ru = suf_ru[idx];
                p0 = sufL;
                indexed = true;
            }
        }
        if (!indexed) {
            int32_t s0 = codes[0];
            rl = F[s0] + 1 < M ? F[s0] + 1 : M;
            ru = s0 + 1 < alph ? F[s0 + 1] : M - 1;
            if (rl > ru)
                continue;
        }
        int32_t s;
        for (int32_t p = p0; p < k && ok; ++p) {
            s = codes[p];
            int64_t rk_rl = rankW(rl - 1 > 0 ? rl - 1 : 0, s) + 1;
            int64_t rk_ru = rankW(ru, s);
            if (rk_rl > rk_ru) {
                ok = false;
                break;
            }
            rl = select_last(NF[s] + rk_rl - 1) + 1;
            ru = select_last(NF[s] + rk_ru);
        }
        if (!ok)
            continue;
        if (!with_edge) {
            out[q] = ru;
            continue;
        }
        // pick_edge(ru, label) (ref boss.cpp:710-722)
        int32_t label = codes[k];
        int64_t begin =
            select_last(br_rank(last, ru - 1 > 0 ? ru - 1 : 0)) + 1;
        for (int32_t cb = 0; cb < 2; ++cb) {
            int32_t cand = label + cb * alph;
            int64_t lo = rankW(begin - 1 > 0 ? begin - 1 : 0, cand);
            int64_t hi = rankW(ru, cand);
            if (hi > lo) {
                // select_W(cand, lo + 1)
                out[q] = br_select(planes[cand],
                                   lo + 1 + (cand == 0 ? 1 : 0));
                break;
            }
        }
    }
}

// mixed-symbol variants: one call for a batch of (position, symbol) queries
// over the per-symbol W planes (BOSS rank_W/select_W hot path — avoids
// per-symbol Python grouping overhead)

void bitrank_rank_multi(void *const *words_p, void *const *sup_p,
                        void *const *sub_p, const int64_t *nbits,
                        const int64_t *idx, const int32_t *plane,
                        int64_t nq, int64_t *out) {
    for (int64_t q = 0; q < nq; ++q) {
        int32_t p = plane[q];
        const uint64_t *words = (const uint64_t *)words_p[p];
        const int64_t *sup = (const int64_t *)sup_p[p];
        const uint16_t *sub = (const uint16_t *)sub_p[p];
        int64_t i = idx[q];
        if (i < 0 || nbits[p] == 0) {
            out[q] = 0;
            continue;
        }
        if (i >= nbits[p])
            i = nbits[p] - 1;
        int64_t w = i >> 6;
        uint64_t mask = ~0ull >> (63 - (i & 63));
        out[q] = sup[w >> 6] + sub[w]
                 + __builtin_popcountll(words[w] & mask);
    }
}

void bitrank_select_multi(void *const *words_p, void *const *sup_p,
                          void *const *sub_p, const int64_t *nw,
                          const int64_t *nsup, const int64_t *total,
                          const int64_t *ranks, const int32_t *plane,
                          int64_t nq, int64_t *out) {
    for (int64_t q = 0; q < nq; ++q) {
        int32_t p = plane[q];
        const uint64_t *words = (const uint64_t *)words_p[p];
        const int64_t *sup = (const int64_t *)sup_p[p];
        const uint16_t *sub = (const uint16_t *)sub_p[p];
        if (total[p] == 0) {         // no set bits in this plane
            out[q] = nw[p] * 64;
            continue;
        }
        int64_t r = ranks[q];
        if (r < 1)
            r = 1;
        else if (r > total[p])
            r = total[p];
        int64_t lo = 0, hi = nsup[p];
        while (hi - lo > 1) {
            int64_t mid = (lo + hi) >> 1;
            if (sup[mid] < r)
                lo = mid;
            else
                hi = mid;
        }
        int64_t rr = r - sup[lo];
        int64_t base = lo * 64;
        int64_t wend = base + 64 < nw[p] ? base + 64 : nw[p];
        int64_t w = base;
        for (int64_t j = base + 1; j < wend; ++j) {
            if (sub[j] < rr)
                w = j;
            else
                break;
        }
        int64_t rw = rr - sub[w];
        out[q] = (w << 6) + select_in_word(words[w], (int)rw);
    }
}

// Fused encode + tile + 2-bit pack for the device query upload path
// (ref query.cpp:1304 batched_query_fasta's per-batch k-mer stream).
//
// Sequences arrive as raw ASCII bytes concatenated (seq_cat, seq_lens);
// each sequence is cut into tiles of T windows (TK = T+K-1 chars with
// K-1 overlap).  For every tile row this emits:
//   packed2:  TKp/4 bytes of 2-bit codes (A=0 C=1 G=2 T=3; little-endian
//             within the byte: position j -> bits 2*(j%4)); TKp = TK
//             rounded up to a multiple of 4; invalid positions are 0
//   validb:   (TK+7)/8 bytes, bit j (little) = position j holds a valid
//             ACGT char inside its sequence
//   tile_seq: owning sequence index
// The device reconstructs code = valid ? 2bit+1 : 5, identical to the
// uint8 tile layout it replaces at ~28% of the bytes.
// Returns the number of tile rows written.
int64_t tile_pack2(const uint8_t *seq_cat, const int64_t *seq_lens,
                   int64_t n_seqs, int32_t K, int32_t T,
                   uint8_t *packed2, uint8_t *validb, int32_t *tile_seq,
                   int32_t n_threads) {
    static uint8_t code2[256];
    static uint8_t vtab[256];
    static bool init2 = false;
    if (!init2) {
        memset(code2, 0, sizeof(code2));
        memset(vtab, 0, sizeof(vtab));
        code2['A'] = code2['a'] = 0;
        code2['C'] = code2['c'] = 1;
        code2['G'] = code2['g'] = 2;
        code2['T'] = code2['t'] = 3;
        code2['U'] = code2['u'] = 3;
        vtab['A'] = vtab['a'] = vtab['C'] = vtab['c'] = 1;
        vtab['G'] = vtab['g'] = vtab['T'] = vtab['t'] = 1;
        vtab['U'] = vtab['u'] = 1;
        init2 = true;
    }
    const int32_t TK = T + K - 1;
    const int32_t TKp = (TK + 3) & ~3;
    const int32_t PB = TKp / 4;           // packed bytes per row
    const int32_t VB = (TK + 7) / 8;      // valid bytes per row

    // row bookkeeping: tile row -> (seq, start offset in cat)
    std::vector<int64_t> seq_start(n_seqs + 1);
    seq_start[0] = 0;
    for (int64_t i = 0; i < n_seqs; ++i)
        seq_start[i + 1] = seq_start[i] + seq_lens[i];
    int64_t n_tiles = 0;
    std::vector<int64_t> row_of;          // per tile: global char offset
    for (int64_t i = 0; i < n_seqs; ++i) {
        int64_t nwin = seq_lens[i] - K + 1;
        if (nwin <= 0)
            continue;
        int64_t nt = (nwin + T - 1) / T;
        for (int64_t t = 0; t < nt; ++t) {
            tile_seq[n_tiles] = (int32_t)i;
            row_of.push_back(seq_start[i] + t * (int64_t)T);
            ++n_tiles;
        }
    }
    // seq end per tile for boundary masking
    std::vector<int64_t> row_end(n_tiles);
    for (int64_t r = 0; r < n_tiles; ++r)
        row_end[r] = seq_start[tile_seq[r] + 1];

    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t r = lo; r < hi; ++r) {
            const int64_t base = row_of[r];
            const int64_t end = row_end[r];
            uint8_t *pr = packed2 + r * PB;
            uint8_t *vr = validb + r * VB;
            memset(pr, 0, PB);
            memset(vr, 0, VB);
            const int32_t lim = (int32_t)(end - base) < TK
                                ? (int32_t)(end - base) : TK;
            for (int32_t j = 0; j < lim; ++j) {
                uint8_t ch = seq_cat[base + j];
                pr[j >> 2] |= code2[ch] << (2 * (j & 3));
                vr[j >> 3] |= vtab[ch] << (j & 7);
            }
        }
    };
    if (n_threads <= 1 || n_tiles < 1024) {
        work(0, n_tiles);
    } else {
        std::vector<std::thread> ths;
        int64_t per = (n_tiles + n_threads - 1) / n_threads;
        for (int32_t t = 0; t < n_threads; ++t) {
            int64_t lo = t * per;
            int64_t hi = lo + per < n_tiles ? lo + per : n_tiles;
            if (lo < hi)
                ths.emplace_back(work, lo, hi);
        }
        for (auto &th : ths)
            th.join();
    }
    return n_tiles;
}

// Stacked alignment wave kernel: the numerical core of one flat-engine wave
// (flat.py _wave; exact semantics of wave_extender.compute_wave plus the
// hull/pad/stat array ops around it, ref aligner_extender_methods.cpp:209-290).
// All arithmetic in int64 — bit-identical to the numpy int32 path, which
// never wraps given the +-100 NINF headroom.
void align_wave(
    const int32_t *gS, const int32_t *gF,   // column store bases, stride W
    const int64_t *g_cur,                   // (J) parent store rows
    const int32_t *cutc,                    // (J) parent x-drop cutoffs
    const int64_t *wsize_p,                 // (J) per-parent window size
    int64_t J, int64_t W,
    const int64_t *ch_rows,                 // (CH) child -> parent slot
    const int32_t *P, const int64_t *prof_rows,  // profile base, stride W
    const int32_t *ch_score, const uint8_t *has_del,
    const int32_t *ccut,                    // (CH) per-child cutoff
    const int64_t *ws_ch,                   // (CH) per-child WS (pad bound)
    const int32_t *diag,                    // (CH) seed diagonal
    const int32_t *pss, const int64_t *pss_rows, // partial sums, stride W
    const double *ext_cut,                  // (CH) extension score cutoff
    int64_t CH, int64_t go, int64_t ge, int64_t ninf,
    int32_t *S, int32_t *E, int32_t *F,     // (CH, W) outputs
    int32_t *smax, int32_t *mpos, int32_t *colmin, uint8_t *has_ext)
{
    const int64_t POS = 2147483647;
    // per-parent hull: [first, last] = span of cells >= cutoff
    std::vector<int64_t> blo(J), bhi(J);
    for (int64_t p = 0; p < J; ++p) {
        const int32_t *row = gS + g_cur[p] * W;
        const int32_t cut = cutc[p];
        int64_t first = 0, last = W - 1;
        for (int64_t j = 0; j < W; ++j)
            if (row[j] >= cut) { first = j; break; }
        for (int64_t j = W - 1; j >= 0; --j)
            if (row[j] >= cut) { last = j; break; }
        blo[p] = first;
        bhi[p] = last + 1 < wsize_p[p] ? last + 1 : wsize_p[p];
    }
    for (int64_t c = 0; c < CH; ++c) {
        const int64_t p = ch_rows[c];
        const int32_t *Sp = gS + g_cur[p] * W;
        const int32_t *Fpr = gF + g_cur[p] * W;
        const int32_t *pr = P + prof_rows[c] * W;
        const int32_t *ps = pss + pss_rows[c] * W;
        int32_t *Sc = S + c * W;
        int32_t *Ec = E + c * W;
        int32_t *Fc = F + c * W;
        const int64_t lo = blo[p], hi = bhi[p];
        const int64_t mlo = lo - 1 > 0 ? lo - 1 : 0, mhi = hi - 1;
        const int64_t ns = ch_score[c];
        const int64_t wlim = ws_ch[c] < W ? ws_ch[c] : W;
        const int64_t cut = ccut[c];
        const uint8_t hd = has_del[c];
        const double xcut = ext_cut[c];
        int64_t run = INT64_MIN;        // running max of B[0..j-1]
        int64_t best = ninf, cmin = POS;
        uint8_t hx = 0;
        for (int64_t j = 0; j < W; ++j) {
            int64_t M;
            if (j >= 1) {
                const int64_t spm =
                    (j - 1 >= mlo && j - 1 <= mhi) ? Sp[j - 1] : ninf;
                M = (spm == ninf) ? ninf : spm + pr[j] + ns;
            } else {
                M = ninf;
            }
            int64_t Fv = ninf;
            if (hd) {
                const bool inb = (j >= lo && j <= hi);
                const int64_t spf = inb ? Sp[j] : ninf;
                const int64_t fp = inb ? Fpr[j] : ninf;
                const int64_t dop = (spf == ninf) ? ninf : spf + go;
                const int64_t dex = (fp == ninf) ? ninf : fp + ge;
                Fv = dop > dex ? dop : dex;
                Fv = (Fv == ninf) ? ninf : Fv + ns;
            }
            if (Fv > M) M = Fv;
            int64_t Ev = ninf;
            if (j >= 1) {
                const int64_t idxge = j * ge;
                Ev = (run <= ninf - idxge) ? ninf : run + idxge;
            }
            const int64_t B = M + go - (j + 1) * ge;
            if (B > run) run = B;
            int64_t Sv = M > Ev ? M : Ev;
            if (Sv < cut) Sv = ninf;
            if (!((j >= lo && j <= hi) || Sv != ninf)) Ev = ninf;
            if (j >= wlim) { Sv = ninf; Ev = ninf; Fv = ninf; }
            Sc[j] = (int32_t)Sv;
            Ec[j] = (int32_t)Ev;
            Fc[j] = (int32_t)Fv;
            if (Sv > best) best = Sv;
            if (Sv != ninf && Sv < cmin) cmin = Sv;
            if (!hx && (double)(Sv + (int64_t)ps[j]) >= xcut) hx = 1;
        }
        // max position: first index minimizing |j - diag| among S == best
        // (pad cells rank as +inf, matching the numpy dist mask)
        int64_t bmp = 0, bdist = POS + 1;
        const int64_t dg = diag[c];
        for (int64_t j = 0; j < W; ++j) {
            if (Sc[j] != (int32_t)best) continue;
            const int64_t d = (j >= wlim) ? POS
                : (j > dg ? j - dg : dg - j);
            if (d < bdist) { bdist = d; bmp = j; }
        }
        smax[c] = (int32_t)best;
        mpos[c] = (int32_t)bmp;
        colmin[c] = (int32_t)(cmin == POS ? POS : cmin);
        has_ext[c] = hx;
    }
}

}  // extern "C"
