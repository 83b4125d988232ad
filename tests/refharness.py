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
):
    stub = tmp_path / "ref_stubs"
    stub.mkdir(exist_ok=True)
    for mod in ("edlib", "pysam", "ahocorasick"):
        (stub / f"{mod}.py").write_text(_STUB)
    if functional_edlib:
        (stub / "edlib.py").write_text(_EDLIB_ORACLE)
    if functional_pysam:
        (stub / "pysam.py").write_text(_PYSAM_ORACLE)
    if functional_ahocorasick:
        (stub / "ahocorasick.py").write_text(_AHOCORASICK_ORACLE)
    return stub


def run_reference(
    args: list[str],
    tmp_path: pathlib.Path,
    timeout=600,
    functional_edlib: bool = False,
    functional_pysam: bool = False,
    functional_ahocorasick: bool = False,
) -> str:
    """Run `scTagger.py <args>`; returns stdout. Raises on nonzero exit."""
    stub = make_stub_dir(
        tmp_path,
        functional_edlib=functional_edlib,
        functional_pysam=functional_pysam,
        functional_ahocorasick=functional_ahocorasick,
    )
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
