"""Exact multi-pattern k-mer lookup (replaces pyahocorasick, scTagger.py:801-826).

All reference patterns are fixed-length barcodes (16bp), so Aho-Corasick
degenerates to "is this window in the dictionary": every k-length window of a
segment packs into one uint32 (2 bits/base) and probes a sorted key array via
vectorized binary search — HBM-friendly, no automaton pointer chasing.

Dictionary semantics reproduced exactly:
  * values: forward barcode i -> i, revcomp -> -i, added in that order with
    later adds OVERWRITING (a word that is both some forward barcode and some
    revcomp keeps the revcomp value, scTagger.py:803-807);
  * a window containing any non-ACGT byte matches nothing (exact char match);
  * per segment, >1 window hit => ambiguous (handled by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.packing import (
    CODE_PAD,
    STRICT_TABLE,
    encode_rows,
    encode_seqs,
    pack_kmers_from_codes,
    seq_lengths,
)
from ..utils import full_fast


def build_key_table(words_fwd: list[str], words_rc: list[str]):
    """Pack fwd (values +i) then rc (values -i) words; later entries win.

    Returns (sorted_keys uint32, values int64). Raises ValueError if any word
    is not pure uppercase ACGT of uniform length <= 16 (callers fall back to
    the host dict path).
    """
    n = len(words_fwd)
    k = len(words_fwd[0]) if n else 0
    all_words = words_fwd + words_rc
    codes, lens = encode_seqs(all_words, pad_to=k, table=STRICT_TABLE)
    if (lens != k).any() or (codes > 3).any():
        raise ValueError("non-ACGT or ragged whitelist; use host fallback")
    keys, _ = pack_kmers_from_codes(codes, lens, k)
    keys = keys[:, 0]
    values = np.concatenate(
        [np.arange(n, dtype=np.int64), -np.arange(n, dtype=np.int64)]
    )
    # keep-LAST duplicate semantics: reverse, then unique keeps first
    rev_keys = keys[::-1]
    rev_vals = values[::-1]
    uniq, first_idx = np.unique(rev_keys, return_index=True)
    return uniq.astype(np.uint32), rev_vals[first_idx]


@functools.partial(jax.jit)
def _probe(sorted_keys, values, qkeys, qvalid):
    pos = jnp.searchsorted(sorted_keys, qkeys)
    pos = jnp.minimum(pos, sorted_keys.shape[0] - 1)
    hit = (sorted_keys[pos] == qkeys) & qvalid & (sorted_keys.shape[0] > 0)
    val = jnp.where(hit, values[pos], 0)
    return hit, val


def probe_segments(
    segments: list[str],
    sorted_keys: np.ndarray,
    values: np.ndarray,
    k: int,
    chunk: int = 65536,
):
    """For each segment: (n_hits, value-of-single-hit-or-0, first window pos).

    Hits are counted over every k-window (end positions ascending, matching
    A.iter order). Returns (counts (N,), single_val (N,)) where single_val is
    meaningful only when counts == 1.
    """
    n = len(segments)
    counts = np.zeros(n, dtype=np.int64)
    single_val = np.zeros(n, dtype=np.int64)
    sk = jnp.asarray(sorted_keys.view(np.uint32))
    vv = jnp.asarray(values.astype(np.int32))
    # one padded length for every chunk: a single compiled probe shape
    # (each distinct shape costs a full remote compile on the axon backend)
    L = max(int(seq_lengths(segments).max(initial=0)) if n else k, k)
    for s in range(0, n, chunk):
        idx = np.arange(s, min(s + chunk, n), dtype=np.int64)
        codes, lens = encode_rows(segments, idx, pad_to=L, table=STRICT_TABLE)
        pad = chunk - idx.size
        if pad and s > 0:  # pad final chunk to the single compiled shape
            codes = np.concatenate(
                [codes, full_fast((pad, L), CODE_PAD, codes.dtype)]
            )
            lens = np.concatenate([lens, np.zeros(pad, np.int32)])
        qkeys, qvalid = pack_kmers_from_codes(codes, lens, k)
        if qkeys.size == 0:
            continue
        hit, val = _probe(
            sk, vv, jnp.asarray(qkeys.view(np.uint32)), jnp.asarray(qvalid)
        )
        hit = np.asarray(hit)
        val = np.asarray(val, dtype=np.int64)
        real = min(chunk, n - s)
        c = hit.sum(axis=1)[:real]
        counts[s : s + real] = c
        # value of the single hit: sum over the row works when exactly 1 hit
        single_val[s : s + real] = np.where(
            c == 1, (val * hit).sum(axis=1)[:real], 0
        )
    return counts, single_val


def host_dict_fallback(segments, words_fwd, words_rc):
    """Generic Aho-Corasick-equivalent for non-uniform/non-ACGT whitelists.

    Same per-segment (count, single value) contract as probe_segments, but
    supports arbitrary equal-or-mixed-length patterns via per-length window
    dict probes. Slow host path; only exercised on exotic inputs.
    """
    table: dict[str, int] = {}
    for i, w in enumerate(words_fwd):
        table[w] = i
    for i, w in enumerate(words_rc):
        table[w] = -i
    lens = sorted({len(w) for w in table})
    n = len(segments)
    counts = np.zeros(n, dtype=np.int64)
    single_val = np.zeros(n, dtype=np.int64)
    for r, seg in enumerate(segments):
        hits = []
        for e in range(len(seg)):
            for k in lens:
                if e + 1 >= k:
                    w = seg[e - k + 1 : e + 1]
                    if w in table:
                        hits.append(table[w])
        counts[r] = len(hits)
        if len(hits) == 1:
            single_val[r] = hits[0]
    return counts, single_val
