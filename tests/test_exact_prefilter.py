"""Exact-match prefilter (ops/exact_prefilter.py) vs brute force, and
match_segments parity with the prefilter on vs off."""

import numpy as np
import pytest

from sctagger_tpu.core import LENIENT_TABLE, encode_seqs, rev_compl
from sctagger_tpu.models.matcher import _build_patterns, match_segments
from sctagger_tpu.ops.exact_prefilter import exact_tie_probe

from oracle import random_dna


def _brute_hits(segs, pats):
    """dict read -> sorted distinct pattern ids occurring as substrings."""
    out = {}
    for r, s in enumerate(segs):
        ids = sorted({i for i, p in enumerate(pats) if p in s})
        if ids:
            out[r] = ids
    return out


@pytest.mark.parametrize("bl", [12, 16, 20, 31])
def test_probe_vs_brute_force(bl):
    rng = np.random.default_rng(bl)
    pats = [random_dna(rng, bl) for _ in range(40)]
    pats[3] = pats[0]  # duplicate pattern id
    pats[7] = rev_compl(pats[1])  # rc collision
    segs = []
    for r in range(300):
        body = random_dna(rng, int(rng.integers(bl - 3, 3 * bl)))
        if rng.random() < 0.6:
            p = pats[int(rng.integers(len(pats)))]
            at = int(rng.integers(0, max(1, len(body) - 2)))
            body = body[:at] + p + body[at:]
        if rng.random() < 0.1:
            body = body[: len(body) // 2] + "N" + body[len(body) // 2 :]
        segs.append(body)
    seg_codes, lens = encode_seqs(
        segs, pad_to=max(len(s) for s in segs), table=LENIENT_TABLE
    )
    pat_codes, _ = encode_seqs(pats, pad_to=bl, table=LENIENT_TABLE)
    got = exact_tie_probe(seg_codes, lens, pat_codes)

    # brute force on the LENIENT view (N matches 'A' in trie semantics)
    lenient = [
        bytes(LENIENT_TABLE[np.frombuffer(s.encode(), np.uint8)]) for s in segs
    ]
    lpats = [
        bytes(LENIENT_TABLE[np.frombuffer(p.encode(), np.uint8)]) for p in pats
    ]
    want = _brute_hits(lenient, lpats)
    assert list(got.rids) == sorted(want)
    for i, rid in enumerate(got.rids):
        ids = got.pids[got.offsets[i] : got.offsets[i + 1]]
        assert list(ids) == want[int(rid)], rid


def test_probe_empty_and_short():
    pat_codes, _ = encode_seqs(["ACGTACGTACGTACGT"], pad_to=16,
                               table=LENIENT_TABLE)
    seg_codes, lens = encode_seqs(["ACG", ""], pad_to=8, table=LENIENT_TABLE)
    got = exact_tie_probe(seg_codes, lens, pat_codes)
    assert got.rids.size == 0 and got.pids.size == 0


def test_match_segments_prefilter_parity(monkeypatch):
    """match_segments with the prefilter on == off, including tie overflow
    (duplicated barcodes force >TIES_K dist-0 ties)."""
    rng = np.random.default_rng(11)
    base = [random_dna(rng, 16) for _ in range(10)]
    barcodes = base + [base[0]] * 10  # 11 copies -> dist-0 ties > TIES_K
    segs = []
    for r in range(400):
        body = random_dna(rng, 24)
        roll = rng.random()
        if roll < 0.5:  # exact plant -> prefilter path
            b = base[int(rng.integers(len(base)))]
            segs.append(body[:4] + b + body[4:8])
        elif roll < 0.8:  # 1-2 errors -> device/fallback path
            b = list(base[int(rng.integers(len(base)))])
            for _ in range(int(rng.integers(1, 3))):
                b[int(rng.integers(16))] = "ACGT"[int(rng.integers(4))]
            segs.append(body[:4] + "".join(b) + body[4:8])
        else:
            segs.append(body)

    def run():
        r = match_segments(segs, barcodes, max_error=2)
        return (
            r.rids.tolist(),
            r.dists.tolist(),
            r.tie_counts.tolist(),
            [r.ties_of(i).tolist() for i in range(r.rids.size)],
        )

    monkeypatch.setenv("SCTAG_EXACT_PREFILTER", "1")
    on = run()
    monkeypatch.setenv("SCTAG_EXACT_PREFILTER", "0")
    off = run()
    assert on == off
    # the prefilter really resolved something: some read has dist 0
    assert 0 in on[1]
    # and overflow tie sets exist (>TIES_K from the duplicated barcodes)
    from sctagger_tpu.ops.match_pallas import TIES_K

    assert max(on[2]) > TIES_K


def test_match_segments_streaming_kernel_path(monkeypatch):
    """The TPU-path streaming dispatcher (per-slice probe, survivor
    repacking across slice boundaries, partial flush per bucket) in pallas
    interpret mode == the jnp fallback path, with the prefilter on and off.

    PASS1_CHUNK is shrunk to one kernel block so several slices stream
    through the carry buffer."""
    import sctagger_tpu.models.matcher as matcher

    monkeypatch.setattr(matcher, "PASS1_CHUNK", 1024)
    rng = np.random.default_rng(23)
    base = [random_dna(rng, 16) for _ in range(12)]
    barcodes = base + [base[0]] * 10  # overflow ties on exact reads
    segs = []
    for r in range(2600):
        body = random_dna(rng, 24 if r % 5 else 40)  # two length buckets
        roll = rng.random()
        if roll < 0.5:
            b = base[int(rng.integers(len(base)))]
            segs.append(body[:4] + b + body[4:8])
        elif roll < 0.8:
            b = list(base[int(rng.integers(len(base)))])
            for _ in range(int(rng.integers(1, 3))):
                b[int(rng.integers(16))] = "ACGT"[int(rng.integers(4))]
            segs.append(body[:4] + "".join(b) + body[4:8])
        else:
            segs.append(body)

    def run(fk):
        r = matcher.match_segments(segs, barcodes, max_error=2,
                                   force_kernel=fk)
        return (
            r.rids.tolist(),
            r.dists.tolist(),
            r.tie_counts.tolist(),
            [r.ties_of(i).tolist() for i in range(r.rids.size)],
        )

    monkeypatch.setenv("SCTAG_EXACT_PREFILTER", "1")
    kern_on = run(True)
    ref = run(False)
    assert kern_on == ref
    monkeypatch.setenv("SCTAG_EXACT_PREFILTER", "0")
    kern_off = run(True)
    assert kern_off == ref


def test_match_segments_prefilter_all_exact(monkeypatch):
    """Every read resolved by the prefilter: no device chunks at all."""
    rng = np.random.default_rng(5)
    barcodes = [random_dna(rng, 16) for _ in range(8)]
    segs = ["AC" + b + "GT" for b in barcodes]
    monkeypatch.setenv("SCTAG_EXACT_PREFILTER", "1")
    r = match_segments(segs, barcodes, max_error=2)
    assert r.rids.tolist() == list(range(len(segs)))
    assert (r.dists == 0).all()
