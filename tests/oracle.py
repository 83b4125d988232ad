"""Brute-force O(n*m) dynamic-programming oracles for edit-distance tests.

These are trusted, independent implementations of the exact semantics the
kernels must reproduce (classic Wagner-Fischer DP). Deliberately simple and
slow; used only on small randomized inputs.
"""

from __future__ import annotations

import numpy as np


def hw_score_columns(pattern: str, text: str) -> np.ndarray:
    """Infix ("HW") per-position scores.

    Returns scores[j] = min over s<=j of ed(pattern, text[s..j]) for each text
    position j (0-based, inclusive end) — DP with free leading text gap:
    D[0][j] = 0, D[i][0] = i. Character equality is exact (N != A etc.).
    """
    m, n = len(pattern), len(text)
    D = np.zeros((m + 1, n + 1), dtype=np.int64)
    D[:, 0] = np.arange(m + 1)
    for j in range(1, n + 1):
        D[0, j] = 0
        for i in range(1, m + 1):
            cost = 0 if pattern[i - 1] == text[j - 1] else 1
            D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1, D[i - 1, j - 1] + cost)
    return D[m, 1:]


def shw_score_columns(pattern: str, text: str) -> np.ndarray:
    """Prefix ("SHW") per-position scores: leading text gap penalized.

    D[0][j] = j, D[i][0] = i; returns scores[j] = D[m][j+1].
    """
    m, n = len(pattern), len(text)
    D = np.zeros((m + 1, n + 1), dtype=np.int64)
    D[:, 0] = np.arange(m + 1)
    for j in range(1, n + 1):
        D[0, j] = j
        for i in range(1, m + 1):
            cost = 0 if pattern[i - 1] == text[j - 1] else 1
            D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1, D[i - 1, j - 1] + cost)
    return D[m, 1:]


def hw_best(pattern: str, text: str) -> int:
    """Best infix edit distance (= min over hw_score_columns, or m if empty)."""
    if len(text) == 0:
        return len(pattern)
    return int(hw_score_columns(pattern, text).min())


def edlib_hw_locations(pattern: str, text: str) -> tuple[int, list[tuple[int, int]]]:
    """Reproduce edlib align(HW, 'locations') semantics for tests.

    Returns (distance, [(start, end), ...]) with one location per optimal END
    position (0-based inclusive), where each start is the MINIMAL optimal
    start for that end (edlib takes the last/furthest position of its reverse
    SHW pass, which yields the smallest start — edlib.cpp obtainAlignmentTraceback).
    Empty text => distance = len(pattern), no locations (edlib returns end=-1
    start=0 in that case; the pipeline never hits it with real reads).
    """
    m, n = len(pattern), len(text)
    if n == 0:
        return m, []
    scores = hw_score_columns(pattern, text)
    best = int(scores.min())
    locs = []
    for e in np.flatnonzero(scores == best):
        e = int(e)
        # reverse SHW: reversed pattern vs reversed text[0..e]
        rshw = shw_score_columns(pattern[::-1], text[: e + 1][::-1])
        k = int(np.flatnonzero(rshw == rshw.min()).max())
        locs.append((e - k, e))
    return best, locs


def random_dna(rng: np.random.Generator, n: int, alphabet: str = "ACGT") -> str:
    return "".join(rng.choice(list(alphabet), size=n))


def mutate(rng: np.random.Generator, s: str, n_ops: int) -> str:
    """Apply n random edit operations to s."""
    s = list(s)
    for _ in range(n_ops):
        op = rng.integers(3)
        if not s:
            op = 2
        if op == 0 and s:  # substitute
            i = rng.integers(len(s))
            s[i] = "ACGT"[rng.integers(4)]
        elif op == 1 and s:  # delete
            i = rng.integers(len(s))
            del s[i]
        else:  # insert
            i = rng.integers(len(s) + 1)
            s.insert(int(i), "ACGT"[rng.integers(4)])
    return "".join(s)
