// Bucketed sorted-array range search for the host match prefilter
// (ops/exact_prefilter.py NeighborhoodIndex).
//
// The dist<=1 neighborhood tables hold ~5-7M sorted uint64 keys (~50 MB);
// numpy's searchsorted walks ~21 cache-missing binary-search steps per query
// (~0.5 us/query measured -> 1.7 s per 131K-read slice, which would starve
// the device pipeline). Here a precomputed top-bits bucket table (built in
// numpy, one searchsorted over 2^18 boundaries) narrows each query to ~10
// table entries, so a lookup is one cached offset load plus a short binary
// search inside one or two cachelines: measured ~25 ns/query, ~20x numpy.
//
// Replaces the per-query work the reference's trie DFS would do on its
// in-memory dict-of-children (scTagger.py:566-588) with a cache-friendly
// flat layout; threads split the query array statically.

#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct Args {
    const uint64_t* table;
    int64_t n_table;
    const int64_t* off;   // n_buckets + 1 entries
    int shift;            // bucket = key >> shift
    const uint64_t* q;
    int64_t* out_lo;      // first index of key in table, -1 if absent
    int32_t* out_cnt;     // number of equal entries
};

void search_span(const Args& a, int64_t s, int64_t e) {
    for (int64_t i = s; i < e; i++) {
        uint64_t key = a.q[i];
        uint64_t b = key >> a.shift;
        int64_t lo = a.off[b];
        int64_t hi = a.off[b + 1];
        int64_t hi0 = hi;
        // lower_bound in [lo, hi)
        while (hi > lo) {
            int64_t mid = lo + ((hi - lo) >> 1);
            if (a.table[mid] < key)
                lo = mid + 1;
            else
                hi = mid;
        }
        if (lo >= hi0 || a.table[lo] != key) {
            a.out_lo[i] = -1;
            a.out_cnt[i] = 0;
            continue;
        }
        // dups per key are few; same-bucket keys, so hi0 bounds the run
        int64_t cnt = 1;
        while (lo + cnt < hi0 && a.table[lo + cnt] == key) cnt++;
        a.out_lo[i] = lo;
        a.out_cnt[i] = (int32_t)cnt;
    }
}

}  // namespace

extern "C" {

// table: sorted uint64 keys (n_table entries). off: int64[n_buckets + 1]
// bucket boundaries (off[b] = first index with key >> shift == b,
// off[n_buckets] = n_table). All outputs caller-allocated.
void sctag_range_search_u64(const uint64_t* table, int64_t n_table,
                            const int64_t* off, int shift, const uint64_t* q,
                            int64_t n_q, int nthreads, int64_t* out_lo,
                            int32_t* out_cnt) {
    Args a{table, n_table, off, shift, q, out_lo, out_cnt};
    if (nthreads < 1) nthreads = 1;
    if (nthreads == 1 || n_q < (1 << 15)) {
        search_span(a, 0, n_q);
        return;
    }
    std::vector<std::thread> pool;
    int64_t per = (n_q + nthreads - 1) / nthreads;
    for (int t = 1; t < nthreads; t++) {
        int64_t s = per * t;
        if (s >= n_q) break;
        int64_t e = s + per < n_q ? s + per : n_q;
        pool.emplace_back([&a, s, e] { search_span(a, s, e); });
    }
    search_span(a, 0, per < n_q ? per : n_q);
    for (auto& t : pool) t.join();
}

}  // extern "C"
