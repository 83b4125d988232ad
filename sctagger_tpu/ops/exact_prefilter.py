"""Host exact-match prefilter for the stage-3 matcher.

A segment whose min infix edit distance over all patterns is ZERO has its
complete reference tie set determined by exact substring hits alone: dist 0
means the pattern occurs verbatim in the segment (SURVEY.md §3.4 — the trie
records a read at distance mr-error_left==0 exactly when a window equals the
barcode, scTagger.py:566-588), so

    min == 0  <=>  some length-bl window of the segment equals some pattern,
    tie set at 0 == the distinct patterns occurring as windows.

That is computable on the HOST with vectorized 2-bit-packed window lookups at
~10x the device's dense-DP match rate, so the production matcher resolves
dist-0 reads here and ships only the remainder to the device — on real ONT
data (and the flagship bench distribution) that is ~40% of reads. The device
path's semantics for surviving reads are unchanged; for resolved reads this
module reproduces the fused kernel's outputs exactly: min=0, tie count =
number of distinct dist-0 patterns, slots ascending by pattern id (the
reference's (bid, strand) sort order, scTagger.py:789).

Only used for bl <= 32 (2-bit keys fit one uint64); the multi-word path
(bl > 32) skips the prefilter.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class ExactHits:
    """CSR tie sets for reads with at least one exact (dist-0) hit.

    Read ``rids[i]`` has the sorted distinct pattern ids
    ``pids[offsets[i]:offsets[i+1]]``, all at edit distance 0.
    """

    rids: np.ndarray  # (M,) int64, ascending
    offsets: np.ndarray  # (M+1,) int64
    pids: np.ndarray  # (total,) int64, ascending within each read


def _pack_rows(codes: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Every k-window of each row packed into one integer (2 bits/base).

    codes: (N, L) values 0..4 (4 = pad/invalid). Returns (keys (N, W) uint32
    for k <= 16 else uint64, bad (N, W) bool) with W = L-k+1; ``bad`` marks
    windows containing an invalid code. Callers mask by row length
    separately.

    Layout note: the rolling update walks COLUMNS with (N,)-shaped state —
    window j's key is window j-1's shifted left two bits — instead of
    materializing k strided (N, W) temporaries, which thrash this kernel's
    page-fault cliff (CLAUDE.md: fresh multi-MB malloc pages fault at
    ~500us/page; measured 4-6s vs ~0.2s at N=262144)."""
    assert k <= 32, k
    n, L = codes.shape
    W = L - k + 1
    wdt = np.uint32 if k <= 16 else np.uint64
    if W <= 0:
        return np.zeros((n, 0), wdt), np.zeros((n, 0), bool)
    nbits = 2 * k
    keys = np.zeros((n, W), dtype=wdt)
    bad = np.zeros((n, W), dtype=bool)
    key = np.zeros(n, dtype=wdt)
    tmp = np.zeros(n, dtype=wdt)
    last_bad = np.full(n, -1, dtype=np.int32)  # small: first-touch ok
    isbad = np.zeros(n, dtype=bool)
    for j in range(L):
        col = codes[:, j]
        np.left_shift(key, wdt(2), out=key)
        if nbits < key.dtype.itemsize * 8:  # drop bits older than the window
            key &= wdt((1 << nbits) - 1)
        np.bitwise_and(col.astype(wdt), wdt(3), out=tmp)
        np.bitwise_or(key, tmp, out=key)
        np.greater(col, 3, out=isbad)
        last_bad[isbad] = j
        if j >= k - 1:
            w = j - k + 1
            keys[:, w] = key
            np.greater_equal(last_bad, w, out=bad[:, w])
    return keys, bad


def exact_tie_probe(
    seg_codes: np.ndarray, lengths: np.ndarray, pat_codes: np.ndarray
) -> ExactHits:
    """All (read, pattern) exact-substring pairs, deduplicated across windows.

    seg_codes: (R, L) uint8 codes (values 0..4; pad only past each row's
    length). lengths: (R,) real lengths. pat_codes: (P, bl) codes 0..3 —
    duplicate pattern rows are allowed (e.g. a barcode equal to another's
    revcomp) and each duplicate id is reported, matching the dense kernel.
    """
    P, bl = pat_codes.shape
    pat_keys, pat_bad = _pack_rows(pat_codes, bl)  # (P, 1)
    assert not pat_bad.any(), "patterns must be fully encoded (codes 0..3)"
    pat_keys = pat_keys[:, 0]
    order = np.argsort(pat_keys, kind="stable")
    sorted_keys = pat_keys[order]
    sorted_pids = order.astype(np.int64)

    keys, bad = _pack_rows(seg_codes, bl)  # (R, W)
    R, W = keys.shape
    if W == 0 or P == 0:
        z = np.zeros(0, np.int64)
        return ExactHits(z, np.zeros(1, np.int64), z)
    valid = (~bad) & (np.arange(W)[None, :] + bl <= lengths[:, None])

    flat = keys[valid]
    wread = np.broadcast_to(np.arange(R, dtype=np.int64)[:, None], (R, W))[
        valid
    ]
    lo = np.searchsorted(sorted_keys, flat, side="left")
    # right bounds only for actual hits (misses dominate): second search runs
    # on the ~5% hit subset instead of every window
    ishit = sorted_keys[np.minimum(lo, sorted_keys.size - 1)] == flat
    ii = np.flatnonzero(ishit)
    if ii.size == 0:
        z = np.zeros(0, np.int64)
        return ExactHits(z, np.zeros(1, np.int64), z)
    hi = np.searchsorted(sorted_keys, flat[ii], side="right")
    counts = hi - lo[ii]
    total = int(counts.sum())
    # expand [lo, hi) ranges: table_pos = repeat(lo - exclusive_cumsum, counts)
    # + arange(total)
    excl = np.cumsum(counts) - counts
    table_pos = np.repeat(lo[ii] - excl, counts) + np.arange(total)
    pids = sorted_pids[table_pos]
    reads = np.repeat(wread[ii], counts)

    # dedup (read, pid) pairs — the same pattern can hit several windows
    srt = np.lexsort((pids, reads))
    r, p = reads[srt], pids[srt]
    keep = np.ones(r.size, bool)
    keep[1:] = (r[1:] != r[:-1]) | (p[1:] != p[:-1])
    r, p = r[keep], p[keep]
    rids, tie_counts = np.unique(r, return_counts=True)
    offsets = np.zeros(rids.size + 1, np.int64)
    np.cumsum(tie_counts, out=offsets[1:])
    return ExactHits(rids, offsets, p)
