"""Run the ACTUAL reference scTagger.py as a golden oracle (subprocess).

The reference imports edlib/pysam/ahocorasick at module top level
(scTagger.py:15-17), but `match_trie` never calls them — so we inject stub
modules on PYTHONPATH that raise if actually used. This lets the real
reference code produce golden outputs for parity tests without those C
extensions being installed. (We execute the reference; we do not copy it.)
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

REFERENCE = "/root/reference/scTagger.py"

_STUB = (
    "class _Poison:\n"
    "    def __getattr__(self, name):\n"
    "        raise RuntimeError('stubbed native module used: ' + name)\n"
    "import sys as _sys\n"
    "_sys.modules[__name__].__class__ = type(\n"
    "    'PoisonModule', (type(_sys.modules[__name__]),),\n"
    "    {'__getattr__': lambda self, n: (_ for _ in ()).throw(\n"
    "        RuntimeError('stubbed native module attribute used: ' + n))},\n"
    ")\n"
)


# A functional edlib substitute backed by the independent DP oracle in
# oracle.py — lets the REAL reference extract_lr_bc logic run end-to-end.
# Mirrors edlib align(HW, 'locations'): one location per optimal end, start =
# end - (furthest optimal position of the reverse SHW pass).
_EDLIB_ORACLE = """
import numpy as np
from oracle import hw_score_columns, shw_score_columns

def align(query, target, mode, task):
    assert mode == 'HW', mode
    m = len(query)
    if len(target) == 0:
        return {'editDistance': m, 'locations': []}
    scores = hw_score_columns(query, target)
    best = int(scores.min())
    locs = []
    for e in np.flatnonzero(scores == best):
        e = int(e)
        rshw = shw_score_columns(query[::-1], target[:e + 1][::-1])
        k = int(np.flatnonzero(rshw == rshw.min()).max())
        locs.append((e - k, e))
    return {'editDistance': best, 'locations': locs}
"""


# A functional pysam substitute serving alignments from the JSON sidecar the
# test BAM generator writes (tests/bamgen.py) — exposes exactly the API
# surface the reference uses (scTagger.py:437-461): AlignmentFile(path,'rb'),
# .get_index_statistics() (.contig/.total), .header['SQ'] ({'SN':...}),
# .fetch(contig=...) yielding objects with .flag and .tags.
_PYSAM_ORACLE = """
import json
from types import SimpleNamespace


class _Aln:
    __slots__ = ("flag", "tags")

    def __init__(self, d):
        self.flag = d["flag"]
        self.tags = [tuple(t) for t in d.get("tags", [])]


class AlignmentFile:
    def __init__(self, path, mode="rb"):
        with open(path + ".pysam.json") as f:
            self._d = json.load(f)

    def get_index_statistics(self):
        return [
            SimpleNamespace(contig=c, total=len(self._d["alns"].get(c, [])))
            for c in self._d["contigs"]
        ]

    @property
    def header(self):
        return {"SQ": [{"SN": c} for c in self._d["contigs"]]}

    def fetch(self, contig=None):
        for a in self._d["alns"].get(contig, []):
            yield _Aln(a)
"""


# A pysam substitute that DECODES THE REAL BAM in Python (BGZF inflate via
# zlib — C speed, like htslib — plus a Python record walk). Used for honest
# stage-2 baseline MEASUREMENT: per-record overhead is a few x real pysam's
# C record objects (documented in tools/measure_reference.py), while the
# reference's own per-record Python loop (scTagger.py:457-462) is identical.
# Contig stats/header come from the tiny JSON sidecar (the .bai analog);
# the decoded file is cached per path so N fetch() calls cost ONE decode
# pass total, matching pysam's index-seek cost model.
_PYSAM_BAM = """
import json
import struct
import zlib

_CACHE = {}


def _decode(path):
    if path in _CACHE:
        return _CACHE[path]
    with open(path, 'rb') as f:
        raw = f.read()
    out = []
    i = 0
    while i < len(raw):
        xlen = struct.unpack_from('<H', raw, i + 10)[0]
        bsize = None
        j, end = i + 12, i + 12 + xlen
        while j < end:
            slen = struct.unpack_from('<H', raw, j + 2)[0]
            if raw[j] == 66 and raw[j + 1] == 67:  # 'BC'
                bsize = struct.unpack_from('<H', raw, j + 4)[0] + 1
            j += 4 + slen
        out.append(zlib.decompress(raw[i + 12 + xlen : i + bsize - 8], -15))
        i += bsize
    data = b''.join(out)
    assert data[:4] == b'BAM\\x01', data[:4]
    p = 4
    l_text = struct.unpack_from('<i', data, p)[0]; p += 4 + l_text
    n_ref = struct.unpack_from('<i', data, p)[0]; p += 4
    names = []
    for _ in range(n_ref):
        ln = struct.unpack_from('<i', data, p)[0]; p += 4
        names.append(data[p : p + ln - 1].decode()); p += ln + 4
    by_contig = {c: [] for c in names}
    n = len(data)
    while p < n:
        bs = struct.unpack_from('<i', data, p)[0]
        rec = data[p + 4 : p + 4 + bs]
        p += 4 + bs
        ref_id = struct.unpack_from('<i', rec, 0)[0]
        if 0 <= ref_id < n_ref:
            by_contig[names[ref_id]].append(rec)
    _CACHE[path] = (names, by_contig)
    return _CACHE[path]


class _Aln:
    __slots__ = ('_rec',)

    def __init__(self, rec):
        self._rec = rec

    @property
    def flag(self):
        return struct.unpack_from('<H', self._rec, 14)[0]

    @property
    def tags(self):
        rec = self._rec
        l_rn = rec[8]
        n_cig = struct.unpack_from('<H', rec, 12)[0]
        l_seq = struct.unpack_from('<i', rec, 16)[0]
        p = 32 + l_rn + 4 * n_cig + (l_seq + 1) // 2 + l_seq
        out = []
        n = len(rec)
        while p < n:
            tag = rec[p : p + 2].decode()
            vt = rec[p + 2 : p + 3]
            p += 3
            if vt == b'Z' or vt == b'H':
                e = rec.index(0, p)
                out.append((tag, rec[p:e].decode()))
                p = e + 1
            elif vt in b'cC':
                out.append((tag, rec[p])); p += 1
            elif vt in b'sS':
                out.append((tag, struct.unpack_from('<h' if vt == b's' else '<H', rec, p)[0])); p += 2
            elif vt in b'iI':
                out.append((tag, struct.unpack_from('<i' if vt == b'i' else '<I', rec, p)[0])); p += 4
            elif vt == b'f':
                out.append((tag, struct.unpack_from('<f', rec, p)[0])); p += 4
            elif vt == b'A':
                out.append((tag, chr(rec[p]))); p += 1
            elif vt == b'B':
                st = rec[p : p + 1]; cnt = struct.unpack_from('<i', rec, p + 1)[0]
                sz = {b'c': 1, b'C': 1, b's': 2, b'S': 2, b'i': 4, b'I': 4, b'f': 4}[st]
                p += 5 + cnt * sz
                out.append((tag, None))
            else:
                raise ValueError('aux type %r' % vt)
        return out


class AlignmentFile:
    def __init__(self, path, mode='rb'):
        self._path = path
        with open(path + '.pysam.json') as f:
            d = json.load(f)
        self._contigs = d['contigs']
        self._stats = d.get('stats')  # {contig: total}; falls back to alns

        if self._stats is None:
            self._stats = {c: len(d['alns'].get(c, [])) for c in self._contigs}

    def get_index_statistics(self):
        from types import SimpleNamespace

        return [
            SimpleNamespace(contig=c, total=self._stats[c])
            for c in self._contigs
        ]

    @property
    def header(self):
        return {'SQ': [{'SN': c} for c in self._contigs]}

    def fetch(self, contig=None):
        _, by_contig = _decode(self._path)
        for rec in by_contig.get(contig, []):
            yield _Aln(rec)
"""


# A functional ahocorasick substitute: all reference patterns are equal-length
# barcodes, so iter(haystack) reduces to a dict probe per window end; word
# values overwrite on re-add exactly like the C automaton (scTagger.py:801-826).
_AHOCORASICK_ORACLE = """
class Automaton:
    def __init__(self):
        self._d = {}
        self._lens = set()

    def add_word(self, word, value):
        self._lens.add(len(word))
        self._d[word] = value

    def make_automaton(self):
        pass

    def iter(self, haystack):
        # The real pyahocorasick yields EVERY (end_index, value) occurrence
        # (suffix links => all overlapping matches, mixed lengths included),
        # ordered by end index; longer words fire before their shorter
        # suffixes at the same end index (the current node is the longest
        # match; suffix/output links walk to shorter ones). Only the count
        # and the single-hit value are consumed by the reference, but
        # preserve that order anyway.
        lens = sorted(self._lens)
        for e in range(len(haystack)):
            for k in reversed(lens):
                if k == 0 or k > e + 1:
                    continue
                w = haystack[e - k + 1 : e + 1]
                if w in self._d:
                    yield e, self._d[w]
"""


def make_stub_dir(
    tmp_path: pathlib.Path,
    functional_edlib: bool = False,
    functional_pysam: bool = False,
    functional_ahocorasick: bool = False,
    native_edlib: bool = False,
    native_ahocorasick: bool = False,
    bam_pysam: bool = False,
):
    """``functional_*`` stubs are slow Python oracles (parity tests);
    ``native_*`` stubs are the C++ reference-class implementations
    (tools/refbench.cpp) for honest baseline MEASUREMENT."""
    stub = tmp_path / "ref_stubs"
    stub.mkdir(exist_ok=True)
    for mod in ("edlib", "pysam", "ahocorasick"):
        (stub / f"{mod}.py").write_text(_STUB)
    if functional_edlib:
        (stub / "edlib.py").write_text(_EDLIB_ORACLE)
    if functional_pysam:
        (stub / "pysam.py").write_text(_PYSAM_ORACLE)
    if bam_pysam:
        (stub / "pysam.py").write_text(_PYSAM_BAM)
    if functional_ahocorasick:
        (stub / "ahocorasick.py").write_text(_AHOCORASICK_ORACLE)
    if native_edlib or native_ahocorasick:
        sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
        import native_oracles

        if native_edlib:
            (stub / "edlib.py").write_text(native_oracles.edlib_stub_source())
        if native_ahocorasick:
            (stub / "ahocorasick.py").write_text(
                native_oracles.ahocorasick_stub_source()
            )
    return stub


def run_reference(
    args: list[str],
    tmp_path: pathlib.Path,
    timeout=600,
    **stub_kwargs,
) -> str:
    """Run `scTagger.py <args>`; returns stdout. Raises on nonzero exit.
    ``stub_kwargs`` are forwarded to make_stub_dir (functional_*/native_*/
    bam_pysam stub selection)."""
    stub = make_stub_dir(tmp_path, **stub_kwargs)
    env = dict(os.environ)
    tests_dir = str(pathlib.Path(__file__).parent)
    env["PYTHONPATH"] = f"{stub}{os.pathsep}{tests_dir}"
    # matplotlib may try to open a display; force a headless backend
    env["MPLBACKEND"] = "Agg"
    proc = subprocess.run(
        [sys.executable, REFERENCE, *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=timeout,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference failed ({proc.returncode}):\n{proc.stderr[-4000:]}"
        )
    return proc.stdout
