// Host dist<=2 adapter scan for stage 1 (models/adapter.py, r5).
//
// Generalizes the d<=1 scan (adapter_d1.cpp) one tier further: a read whose
// adapter min-distance is 0, 1 OR 2 on exactly one strand resolves fully
// host-side. At a 1%-per-base error rate this covers ~99.99% of reads with
// an adapter (vs 98.8% for d<=1); at 5% (real ONT) ~91% vs ~61%.
//
// Method: 3-part pigeonhole screen + exact banded verify.
//   * Screen: split the m-char pattern P = A.B.C (|A| = |B| = m/3). Any
//     occurrence with <= 2 edits leaves at least ONE part intact (each
//     edit damages at most one part), and an intact part occurs EXACTLY in
//     the text. Six rolling-key compares per char (A/B/C x fwd/rc) find
//     those exact part occurrences.
//   * Candidates: a part hit ending at t implies candidate occurrence ENDS
//     t + (suffix length after the part) + delta, delta in [-2, 2] (net
//     indel shift of the edits in the suffix; edits before the part never
//     move the end). Part C (the suffix itself) contributes {t} .. {t+-0}:
//     its suffix is empty, so end == t exactly? No: edits AFTER the
//     pattern cannot exist, so yes end == t. (A: 5 candidates, B: 5, C: 1.)
//   * Verify (exact, per candidate end j): banded (|i-j| <= 2) global edit
//     DP of P vs each window length l in {m-2 .. m+2} ending at j, clamped
//     at 3. Per-char equality goes through the STRICT table, so junk bytes
//     mismatch everything (a junk byte inside the window is a legal
//     substitution edit, exactly as edlib scores it). dist_j = min over l;
//     an alignment with <= 2 edits cannot consume any other window length,
//     so the per-end distances are EXACT for d <= 2.
//   * Reverse-strand starts: minimal optimal start per end = j - L* + 1
//     where L* is the LARGEST window length achieving the read's min
//     distance at that end (edlib's furthest reverse-SHW position; for a
//     min-d read no window scores < d anywhere, so "achieving <= d" ==
//     "achieving == d").
//
// Outputs per read: location counts + up to kmax slots per strand per tier
// (fwd: end positions; rc: tier-0 ends, tier-1/2 starts), and a flags byte
// (bit0 = candidate overflow => caller defers the read to the device).
// Counts may exceed kmax (caller defers). TIER-2 outputs are populated
// ONLY when both strands' tier-0/1 sets are empty — the one case the
// caller's decision cascade can consume them (any 0/1 minimum decides the
// read without distinguishing the other strand's "2" from ">2").
// Requires 9 <= m <= 32.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include "adapter_verify.h"

namespace {

struct Pat2 {
    uint8_t codes[32];
    int m;
    int off[3], w[3];       // part offsets / widths: A, B, C
    uint64_t key[3], mask[3];
    int tail[3];            // m - (off + w): suffix length after each part
};

void build_pat2(const uint8_t* codes, int m, Pat2& p) {
    std::memcpy(p.codes, codes, (size_t)m);
    p.m = m;
    int wa = m / 3, wb = m / 3;
    p.off[0] = 0;
    p.w[0] = wa;
    p.off[1] = wa;
    p.w[1] = wb;
    p.off[2] = wa + wb;
    p.w[2] = m - wa - wb;
    for (int s = 0; s < 3; s++) {
        uint64_t k = 0;
        for (int i = 0; i < p.w[s]; i++) k = (k << 2) | codes[p.off[s] + i];
        p.key[s] = k;
        p.mask[s] = (1ull << (2 * p.w[s])) - 1;
        p.tail[s] = m - (p.off[s] + p.w[s]);
    }
}

// banded global edit distance (band |i - j| <= 2) of pat[0..m) vs the text
// window t[s..s+l), clamped at 3. l in [m-2, m+2].
int banded_ed(const uint8_t* t, const uint8_t* table, const uint8_t* pat,
              int m, int64_t s, int l) {
    // row i: D[i][j] for j in [i-2, i+2]; store 5 cells per row
    int prev[5], cur[5];
    const int INF = 9;
    // row 0: D[0][j] = j for j in [0, min(l, 2)] (band offset d == j)
    for (int d = -2; d <= 2; d++)
        prev[d + 2] = (d >= 0 && d <= l) ? d : INF;
    for (int i = 1; i <= m; i++) {
        for (int d = -2; d <= 2; d++) {
            int j = i + d;
            if (j < 0 || j > l) {
                cur[d + 2] = INF;
                continue;
            }
            int best = INF;
            if (j > 0 && prev[d + 2] < INF) {  // diagonal (i-1, j-1)
                best = prev[d + 2] +
                       ((table[t[s + j - 1]] == pat[i - 1]) ? 0 : 1);
            }
            if (d + 1 <= 2 && prev[d + 3] + 1 < best)  // up (i-1, j)
                best = prev[d + 3] + 1;
            if (d - 1 >= -2 && cur[d + 1] + 1 < best)  // left (i, j-1)
                best = cur[d + 1] + 1;
            cur[d + 2] = best > INF ? INF : best;
        }
        std::memcpy(prev, cur, sizeof(cur));
    }
    int d = l - m;  // D[m][l] lives at band offset l - m
    int v = (d >= -2 && d <= 2) ? prev[d + 2] : INF;
    return v > 3 ? 3 : v;
}

// per-candidate-end verdict: dist over window lengths m-2..m+2 ending at j
// (0..2, or 3 = more) and L* = largest length achieving it.
int verify_end2(const uint8_t* t, int64_t len, const uint8_t* table,
                const Pat2& P, int64_t j, int* lstar) {
    int m = P.m;
    int best = 3, bl = 0;
    for (int l = m + 2; l >= m - 2; l--) {
        if (l < 1 || j < l - 1) continue;
        int d = banded_ed(t, table, P.codes, m, j - l + 1, l);
        if (d < best) {
            best = d;
            bl = l;
            if (best == 0) break;
        }
    }
    *lstar = bl;
    return best;
}

// cheap <=1-edit verdict: the shared sctag_verify_le1 (adapter_verify.h);
// phase 1 of the tiered scan below.
inline int verify_end1(const uint8_t* t, int64_t len, const uint8_t* table,
                       const Pat2& P, int64_t j, int* lstar) {
    (void)len;
    return sctag_verify_le1(t, table, P.codes, P.m, j, lstar);
}

constexpr int CAND_CAP = 192;

struct D2Args {
    const uint8_t* buf;
    const int64_t* offs;
    const uint8_t* table;
    Pat2 pf, pr;
    int kmax;
    int32_t* cnt[6];        // f0 r0 f1 r1 f2 r2
    int64_t* ends[3];       // ends0/1/2, each (n, 2*kmax)
    uint8_t* flags;
};

void scan_read2(const D2Args& a, int64_t r) {
    const uint8_t* p = a.buf + a.offs[r];
    const int64_t len = a.offs[r + 1] - a.offs[r];
    const Pat2& PF = a.pf;
    const Pat2& PR = a.pr;
    const int m = PF.m;
    int64_t cf[CAND_CAP], cr[CAND_CAP];
    int ncf = 0, ncr = 0;
    bool ovf = false;
    uint64_t reg = 0;
    const uint8_t* tab = a.table;
    auto push = [&](int64_t* c, int& n, int64_t e) {
        if (e < m - 3 || e >= len) return;
        if (n < CAND_CAP) c[n++] = e;
        else ovf = true;
    };
    for (int64_t j = 0; j < len; j++) {
        reg = (reg << 2) | (tab[p[j]] & 3);
        // 6 masked compares; junk bytes alias into the 2-bit alphabet here,
        // so a fire is only a CANDIDATE (verify re-checks through the full
        // table) and a genuine exact part can never be missed
        for (int s = 0; s < 3; s++) {
            bool ff = (reg & PF.mask[s]) == PF.key[s];
            bool rf = (reg & PR.mask[s]) == PR.key[s];
            if (!(ff | rf)) continue;
            int t0 = PF.tail[s];  // same part geometry both strands
            // [-2, +2] for EVERY part: the suffix after the part can gain
            // or lose up to 2 chars; for part C (tail 0) trailing
            // insertions still shift the end by up to +2, and spurious
            // negatives are simply verified away
            for (int d = -2; d <= 2; d++) {
                if (ff) push(cf, ncf, j + t0 + d);
                if (rf) push(cr, ncr, j + t0 + d);
            }
        }
    }
    a.flags[r] = ovf ? 1 : 0;
    if (ovf) {
        for (int i = 0; i < 6; i++) a.cnt[i][r] = 0;
        return;
    }
    // Phase 1 (cheap): tier-0/1 sets via the lcp/lcs verify. Tier-2 only
    // matters when BOTH strands' tier-0/1 are empty (any 0/1-tier minimum
    // decides the read without knowing whether the other strand's >=2 is
    // exactly 2 or more — equal minima tie, smaller wins), so the banded
    // pass runs only then: ~1% of real reads instead of every candidate.
    bool any01 = false;
    for (int strand = 0; strand < 2; strand++) {
        const Pat2& P = strand ? PR : PF;
        int64_t* cand = strand ? cr : cf;
        int nc = strand ? ncr : ncf;
        std::sort(cand, cand + nc);
        int c[3] = {0, 0, 0};
        for (int i = 0; i < nc; i++) {
            if (i && cand[i] == cand[i - 1]) continue;
            int lstar;
            int d = verify_end1(p, len, tab, P, cand[i], &lstar);
            if (d > 1) continue;
            int64_t* slot =
                a.ends[d] + r * 2 * a.kmax + (strand ? a.kmax : 0);
            if (c[d] < a.kmax) {
                // fwd tiers and rc tier 0 record END positions (rc d0
                // start is exactly end - m + 1, derived by the caller);
                // rc tiers 1/2 record the minimal optimal START directly
                slot[c[d]] = (strand && d > 0) ? cand[i] - lstar + 1
                                               : cand[i];
            }
            c[d]++;
        }
        for (int d = 0; d < 2; d++) a.cnt[2 * d + strand][r] = c[d];
        a.cnt[4 + strand][r] = 0;
        if (c[0] | c[1]) any01 = true;
    }
    if (any01) return;
    // Phase 2 (banded): exact tier-2 end sets, both strands
    for (int strand = 0; strand < 2; strand++) {
        const Pat2& P = strand ? PR : PF;
        int64_t* cand = strand ? cr : cf;
        int nc = strand ? ncr : ncf;
        int c2 = 0;
        int64_t* slot = a.ends[2] + r * 2 * a.kmax + (strand ? a.kmax : 0);
        for (int i = 0; i < nc; i++) {
            if (i && cand[i] == cand[i - 1]) continue;
            int lstar;
            int d = verify_end2(p, len, tab, P, cand[i], &lstar);
            if (d != 2) continue;  // phase 1 proved nothing is < 2
            if (c2 < a.kmax)
                slot[c2] = strand ? cand[i] - lstar + 1 : cand[i];
            c2++;
        }
        a.cnt[4 + strand][r] = c2;
    }
}

void scan_span2(const D2Args& a, int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; r++) scan_read2(a, r);
}

}  // namespace

extern "C" {

// Outputs caller-allocated: f0/r0/f1/r1/f2/r2 int32[n], ends0/1/2
// int64[n*2*kmax] ([0,kmax) fwd | [kmax,2*kmax) rc), flags uint8[n].
// pat_fwd/pat_rc: m uint8 codes in 0..3. Requires 9 <= m <= 32.
void sctag_adapter_scan2(const uint8_t* buf, const int64_t* offs, int64_t n,
                         const uint8_t* table, const uint8_t* pat_fwd,
                         const uint8_t* pat_rc, int m, int kmax, int nthreads,
                         int32_t* f0, int32_t* r0, int32_t* f1, int32_t* r1,
                         int32_t* f2, int32_t* r2, int64_t* ends0,
                         int64_t* ends1, int64_t* ends2, uint8_t* flags) {
    D2Args a;
    a.buf = buf;
    a.offs = offs;
    a.table = table;
    build_pat2(pat_fwd, m, a.pf);
    build_pat2(pat_rc, m, a.pr);
    a.kmax = kmax;
    a.cnt[0] = f0;
    a.cnt[1] = r0;
    a.cnt[2] = f1;
    a.cnt[3] = r1;
    a.cnt[4] = f2;
    a.cnt[5] = r2;
    a.ends[0] = ends0;
    a.ends[1] = ends1;
    a.ends[2] = ends2;
    a.flags = flags;
    if (nthreads < 1) nthreads = 1;
    if (nthreads == 1 || n < 1024) {
        scan_span2(a, 0, n);
        return;
    }
    std::vector<std::thread> pool;
    int64_t per = (n + nthreads - 1) / nthreads;
    for (int t = 1; t < nthreads; t++) {
        int64_t s = per * t;
        if (s >= n) break;
        int64_t e = s + per < n ? s + per : n;
        pool.emplace_back([&a, s, e] { scan_span2(a, s, e); });
    }
    scan_span2(a, 0, per < n ? per : n);
    for (auto& t : pool) t.join();
}

}  // extern "C"
