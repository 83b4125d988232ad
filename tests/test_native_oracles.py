"""Fuzz the reference-class C++ oracles (tools/refbench.cpp) against the
trusted Python DP/dict oracles.

These C++ implementations serve two roles: (1) honest native-speed baselines
for tools/measure_reference.py (the reference's real deps, edlib and
pyahocorasick, are not installable here), and (2) an INDEPENDENT third
implementation of the edit-distance/locations semantics — the Pallas/jnp
kernels, the Python DP oracle, and this C++ all agreeing narrows the
shared-mistake risk on the edlib start tie-break (PARITY.md)."""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))

import native_oracles as no

from oracle import edlib_hw_locations, mutate, random_dna


@pytest.fixture(scope="module")
def lib():
    return no.load()


def test_hw_locations_fuzz_vs_dp_oracle(lib):
    rng = np.random.default_rng(11)
    for _ in range(400):
        m = int(rng.integers(1, 33))
        q = random_dna(rng, m)
        n = int(rng.integers(0, 120))
        t = random_dna(rng, n)
        if rng.random() < 0.6 and n > 0:
            p = int(rng.integers(0, n))
            t = t[:p] + mutate(rng, q, int(rng.integers(0, 4))) + t[p:]
        want_d, want_l = edlib_hw_locations(q, t)
        got_d, got_l = no.hw_locations(q, t, lib)
        assert (got_d, got_l) == (want_d, want_l), (q, t)


def test_hw_locations_long_patterns(lib):
    """m in (33, 64]: beyond the Pallas single-word limit, still one uint64."""
    rng = np.random.default_rng(12)
    for _ in range(60):
        m = int(rng.integers(33, 65))
        q = random_dna(rng, m)
        t = random_dna(rng, int(rng.integers(0, 90)))
        if rng.random() < 0.5 and t:
            p = int(rng.integers(0, len(t)))
            t = t[:p] + mutate(rng, q, int(rng.integers(0, 5))) + t[p:]
        assert no.hw_locations(q, t, lib) == edlib_hw_locations(q, t)


def test_hw_locations_adapter_cases(lib):
    """The production pattern (22bp SR adapter) on planted reads."""
    adapter = "CTACACGACGCTCTTCCGATCT"
    rng = np.random.default_rng(13)
    for _ in range(100):
        body = random_dna(rng, int(rng.integers(30, 200)))
        p = int(rng.integers(0, len(body)))
        t = body[:p] + mutate(rng, adapter, int(rng.integers(0, 4))) + body[p:]
        assert no.hw_locations(adapter, t, lib) == edlib_hw_locations(adapter, t)


def _py_iter(words, hay):
    """pyahocorasick iter() semantics (same rules as the refharness stub)."""
    lens = sorted({len(w) for w, _ in words})
    d = dict(words)
    out = []
    for e in range(len(hay)):
        for k in reversed(lens):
            if k == 0 or k > e + 1:
                continue
            w = hay[e - k + 1 : e + 1]
            if w in d:
                out.append((e, d[w]))
    return out


def test_ac_fuzz_mixed_lengths(lib):
    rng = np.random.default_rng(14)
    for _ in range(300):
        nw = int(rng.integers(1, 40))
        words = [
            (random_dna(rng, int(rng.integers(1, 9))), int(rng.integers(-50, 50)))
            for _ in range(nw)
        ]
        a = no.Automaton(lib)
        for w, v in words:
            a.add_word(w, v)
        a.make_automaton()
        hay = random_dna(rng, int(rng.integers(0, 80)))
        assert a.iter(hay) == _py_iter(words, hay)


def test_ac_reference_shape(lib):
    """The reference's exact usage: equal-length fwd+rc barcodes, value
    idx/-idx, overwrite-on-readd, ambiguity by hit count
    (scTagger.py:801-826)."""
    rng = np.random.default_rng(15)
    bcs = sorted({random_dna(rng, 16) for _ in range(200)})
    a = no.Automaton(lib)
    comp = str.maketrans("ACGT", "TGCA")
    for i, b in enumerate(bcs):
        a.add_word(b, i)
        a.add_word(b.translate(comp)[::-1], -i)
    a.make_automaton()
    # single planted hit
    seg = "AAAA" + bcs[7] + "GGGG"
    hits = a.iter(seg)
    want = _py_iter(
        [(b, i) for i, b in enumerate(bcs)]
        + [(b.translate(comp)[::-1], -i) for i, b in enumerate(bcs)],
        seg,
    )
    assert hits == want
    # overwrite: re-add with a new value
    a2 = no.Automaton(lib)
    a2.add_word("ACGTACGTACGTACGT", 1)
    a2.add_word("ACGTACGTACGTACGT", 2)
    a2.make_automaton()
    assert a2.iter("ACGTACGTACGTACGT") == [(15, 2)]


def test_ac_overflow_recollect(lib):
    """>64 hits in one haystack exercises the grow-and-retry path."""
    a = no.Automaton(lib)
    a.add_word("A", 5)
    a.make_automaton()
    hay = "A" * 200
    assert a.iter(hay) == [(i, 5) for i in range(200)]
