"""Adapter-location range detection + alignment filtering (host, parity-exact).

These are the tiny, sequential, parity-critical pieces of stage 1 that stay on
host (SURVEY.md §7): the iterative peak-extraction over the global location
histogram (reference get_ranges, scTagger.py:199-233) and the per-read range
filter (filter_aln, scTagger.py:287-304). The device kernels supply the raw
per-read distances and location sets; everything here is numpy.

Reproduced quirks (SURVEY.md §7 "hard parts"):
  * the +-20 neighborhood windows are right-exclusive (F[p-20 : p+20]);
  * leftward expansion cannot reach histogram index 0 (`i-1 > 0` test);
  * AUTO-detected ranges treat the right edge e as NON-member
    (arange(s, e), scTagger.py:261) while PRESET -g ranges include it
    (arange(s, e+1), scTagger.py:122) — `include_end` flag below;
  * the failing peak iteration still prints its stderr line (incl. the
    reference's "strend" typo, scTagger.py:214).
"""

from __future__ import annotations

import sys

import numpy as np


def find_peak_ranges(data: np.ndarray, quiet: bool = False) -> list[tuple[int, int]]:
    """Iterative histogram peak extraction (reference get_ranges semantics)."""
    data = np.asarray(data)
    if data.size == 0:
        return []
    min_l = int(data.min())
    max_l = int(data.max())
    F = np.bincount(data - min_l, minlength=max_l - min_l + 1).astype(np.float64)
    return find_peak_ranges_hist(F, min_l, quiet=quiet)


def find_peak_ranges_hist(
    F: np.ndarray, min_l: int, quiet: bool = False
) -> list[tuple[int, int]]:
    """Peak extraction over a prebuilt location histogram.

    ``F[i]`` = count of locations at value ``min_l + i``. This is the entry
    point for multi-host runs, where per-host bincounts are psum-merged
    before detection so every host derives identical ranges (the reference's
    global two-pass barrier, SURVEY.md §3.1)."""
    ranges: list[tuple[int, int]] = []
    F = np.asarray(F, dtype=np.float64).copy()
    if F.size == 0 or F.sum() == 0:
        return ranges
    T = F.sum()
    n = len(F)
    while True:
        peak = int(np.argmax(F))
        neigh = F[max(0, peak - 20) : min(peak + 20, n)].sum()
        if not quiet:
            print(
                f"--> {neigh / T: 5.2%} of strend reads fall around {min_l + peak}",
                file=sys.stderr,
            )
        if neigh < 0.01 * T:
            break
        # chain expansion left/right while bins exceed 0.1% of total; the
        # left walk stops before index 0 (reference `i-1 > 0`)
        first = last = peak
        i = peak
        while i - 1 > 0 and F[i - 1] > T * 0.001:
            i -= 1
            first = i
        i = peak
        while i + 1 < n and F[i + 1] > T * 0.001:
            i += 1
            last = i
        F[max(0, first - 20) : min(last + 20, n)] = 0
        ranges.append((min_l + first, min_l + last))
    return ranges


def detect_ranges(
    locs_f: np.ndarray, locs_r: np.ndarray, quiet: bool = False
) -> list[list[tuple[int, int]]]:
    """Per-strand range detection over all adapter locations of reads with
    0 <= d <= 5 (reference get_possible_ranges, scTagger.py:236-252)."""
    ranges_f = find_peak_ranges(locs_f, quiet=quiet)
    if not quiet:
        print(f"Found these ranges on + strand:\t{ranges_f}", file=sys.stderr)
    ranges_r = find_peak_ranges(locs_r, quiet=quiet)
    if not quiet:
        print(f"Found these ranges on - strand:\t{ranges_r}", file=sys.stderr)
    return [ranges_f, ranges_r]


class RangeMembership:
    """Vectorized loc -> range-id mapping for one strand.

    ``include_end=False`` reproduces the auto-detected membership
    (positions s..e-1 only); ``include_end=True`` the preset -g membership
    (positions s..e). Locations outside every range map to -1.
    """

    def __init__(self, ranges: list[tuple[int, int]], include_end: bool):
        self.ranges = list(ranges)
        self.include_end = include_end
        self.starts = np.array([r[0] for r in self.ranges], dtype=np.int64)
        self.ends = np.array([r[1] for r in self.ranges], dtype=np.int64)

    def ids(self, locs: np.ndarray) -> np.ndarray:
        locs = np.asarray(locs, dtype=np.int64)
        out = np.full(locs.shape, -1, dtype=np.int64)
        for idx in range(len(self.ranges)):
            s, e = self.starts[idx], self.ends[idx]
            hit = (locs >= s) & ((locs <= e) if self.include_end else (locs < e))
            out[hit] = idx
        return out


def filter_alignments(
    strands: np.ndarray,  # (N,) int8: 0='+', 1='-', -1=NA
    dists: np.ndarray,  # (N,) int32, -1 for NA reads
    flat_locs: np.ndarray,  # (M,) int64 all locs concatenated read-major
    loc_counts: np.ndarray,  # (N,) int64 locs per read (0 for NA reads)
    memberships: list[RangeMembership],  # [forward, reverse]
    num_bp_after: int,
):
    """Vectorized filter_aln (scTagger.py:287-304).

    Valid read: every loc maps to a range and all to the SAME range id.
    Returns (dist, loc, s, e) arrays; loc/s/e are int64, with the invalid
    marker dist=-1 (loc printed as 'NA' by the writer) and s=e=-1.
    """
    n = strands.shape[0]
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(loc_counts, out=offs[1:])

    ids = np.empty_like(flat_locs)
    read_of = np.repeat(np.arange(n), loc_counts)
    for strand_val, mem in ((0, memberships[0]), (1, memberships[1])):
        sel = strands[read_of] == strand_val
        ids[sel] = mem.ids(flat_locs[sel])

    has_locs = loc_counts > 0
    starts = offs[:-1]
    # all ids equal & != -1, computed per read via segmented min/max
    with np.errstate(invalid="ignore"):
        seg_min = np.full(n, -1, dtype=np.int64)
        seg_max = np.full(n, -1, dtype=np.int64)
        seg_lmin = np.zeros(n, dtype=np.int64)
        seg_lmax = np.zeros(n, dtype=np.int64)
        nz = np.flatnonzero(has_locs)
        if nz.size:
            seg_min[nz] = np.minimum.reduceat(ids, starts[nz])
            seg_max[nz] = np.maximum.reduceat(ids, starts[nz])
            seg_lmin[nz] = np.minimum.reduceat(flat_locs, starts[nz])
            seg_lmax[nz] = np.maximum.reduceat(flat_locs, starts[nz])
    valid = has_locs & (seg_min == seg_max) & (seg_min != -1) & (strands >= 0)

    out_dist = np.where(valid, dists, -1).astype(np.int64)
    is_fwd = strands == 0
    s_fwd = np.maximum(0, seg_lmin - 2)
    e_fwd = seg_lmax + num_bp_after
    s_rev = seg_lmin - num_bp_after
    e_rev = np.minimum(0, seg_lmax + 2)
    out_s = np.where(valid, np.where(is_fwd, s_fwd, s_rev), -1)
    out_e = np.where(valid, np.where(is_fwd, e_fwd, e_rev), -1)
    out_loc = np.where(valid, np.where(is_fwd, out_s, out_e), 0)
    return out_dist, out_loc, out_s, out_e, valid
