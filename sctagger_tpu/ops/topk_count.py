"""Device-side key counting + frequency ordering (SURVEY.md §7 kernel d).

Replaces the reference's Counter + sorted() (scTagger.py:473-476, 828) with
an XLA sort/segment-reduce: one multi-operand sort groups the keys, scatter
adds produce per-unique counts and first-occurrence positions, and a second
two-key sort orders by (count desc, first_pos asc) — exactly Python's stable
`sorted(..., key=count, reverse=True)` over insertion-ordered Counter items.

Pure jnp: XLA's sorts are already tuned for TPU; there is nothing for a
custom kernel to beat here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit)
def _count_and_rank(keys, valid):
    """keys: (N,) int32-bitcast uint32; valid: (N,) bool.

    Returns (unique_padded, counts_padded, first_padded, rank_order, n_unique)
    where the first three are (N,) arrays whose first n_unique entries are the
    unique keys with counts/first positions, and rank_order is the permutation
    of [0, N) ordering unique slots by (count desc, first asc).
    """
    n = keys.shape[0]
    # validity is a leading SORT KEY (not an in-band sentinel value), so every
    # uint32 key — including 0xFFFFFFFF, a real all-T 16-mer — counts correctly
    inv = (~valid).astype(jnp.int32)
    k = keys.astype(jnp.uint32)
    idx = jnp.arange(n, dtype=jnp.int32)
    s_inv, sk, si = jax.lax.sort((inv, k, idx), num_keys=2)
    ok = s_inv == 0  # valid entries sort first
    is_start = ok & jnp.concatenate(
        [jnp.ones((1,), bool), sk[1:] != sk[:-1]]
    )
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    seg = jnp.where(ok, seg, n - 1)  # dump invalids on a dead slot
    ones = ok.astype(jnp.int32)
    counts = jnp.zeros((n,), jnp.int32).at[seg].add(ones, mode="drop")
    first = jnp.full((n,), n, jnp.int32).at[seg].min(
        jnp.where(ok, si, n), mode="drop"
    )
    uniq = jnp.zeros((n,), jnp.uint32).at[seg].max(
        jnp.where(ok, sk, 0), mode="drop"
    )
    n_unique = is_start.sum()
    # rank by (count desc, first asc); empty slots (count 0) sink to the end
    neg_counts = -counts
    _, _, order = jax.lax.sort(
        (neg_counts, first, jnp.arange(n, dtype=jnp.int32)), num_keys=2
    )
    return uniq, counts, first, order, n_unique


def count_and_rank(keys: np.ndarray, valid: np.ndarray | None = None):
    """Host wrapper: returns (keys_ranked, counts_ranked) numpy arrays,
    ordered by count desc with ties by first occurrence."""
    n = keys.shape[0]
    if n == 0:
        return np.empty(0, np.uint32), np.empty(0, np.int64)
    if valid is None:
        valid = np.ones(n, bool)
    uniq, counts, first, order, n_unique = jax.tree.map(
        np.asarray,
        _count_and_rank(
            jnp.asarray(keys.view(np.int32)), jnp.asarray(valid)
        ),
    )
    u = int(n_unique)
    ranked = order[:u]
    return uniq[ranked].astype(np.uint32), counts[ranked].astype(np.int64)
