// Shared <=1-edit exact verify for the host adapter prefilters
// (adapter_d1.cpp, adapter_d2.cpp) — ONE home for the d<=1 verdict
// semantics so the reverse-SHW tie-break (PARITY.md: derived from
// edlib.cpp, revisit if real-edlib outputs ever disagree) can never
// diverge between the scanners.
#pragma once

#include <cstdint>

// Distance of pat[0..m) vs the text window ending at j (inclusive):
// 0 (exact), 1 (and *lstar = the LARGEST achieving window length in
// {m-1, m, m+1} — the minimal optimal start is j - *lstar + 1), or
// 2 (= "2 or more"). Per-char equality goes through the code table, so
// non-ACGT bytes mismatch everything (a junk byte inside the window is a
// legal substitution edit, exactly as edlib scores it).
inline int sctag_verify_le1(const uint8_t* t, const uint8_t* table,
                            const uint8_t* pat, int m, int64_t j,
                            int* lstar) {
    auto lcp = [&](int64_t s, int L) {
        int i = 0;
        while (i < L && i < m && table[t[s + i]] == pat[i]) i++;
        return i;
    };
    auto lcs = [&](int64_t s, int L) {
        int k = 0;
        while (k < L && k < m && table[t[s + L - 1 - k]] == pat[m - 1 - k])
            k++;
        return k;
    };
    // L == m: exact or one substitution
    int sub_hit = 0;
    if (j >= m - 1) {
        int64_t s = j - m + 1;
        int i = lcp(s, m);
        if (i == m) return 0;
        int k = 0;
        while (k < m - i - 1 && table[t[s + m - 1 - k]] == pat[m - 1 - k])
            k++;
        if (i + k >= m - 1) sub_hit = 1;
    }
    // L == m+1: window has one extra char (insertion into the pattern)
    if (j >= m) {
        int64_t s = j - m;
        if (lcp(s, m + 1) + lcs(s, m + 1) >= m) {
            *lstar = m + 1;
            return 1;
        }
    }
    if (sub_hit) {
        *lstar = m;
        return 1;
    }
    // L == m-1: window lost one pattern char (deletion)
    if (j >= m - 2 && m >= 2) {
        int64_t s = j - m + 2;
        if (lcp(s, m - 1) + lcs(s, m - 1) >= m - 1) {
            *lstar = m - 1;
            return 1;
        }
    }
    return 2;
}
