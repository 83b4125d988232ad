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


def make_stub_dir(tmp_path: pathlib.Path, functional_edlib: bool = False):
    stub = tmp_path / "ref_stubs"
    stub.mkdir(exist_ok=True)
    for mod in ("edlib", "pysam", "ahocorasick"):
        (stub / f"{mod}.py").write_text(_STUB)
    if functional_edlib:
        (stub / "edlib.py").write_text(_EDLIB_ORACLE)
    return stub


def run_reference(
    args: list[str],
    tmp_path: pathlib.Path,
    timeout=600,
    functional_edlib: bool = False,
) -> str:
    """Run `scTagger.py <args>`; returns stdout. Raises on nonzero exit."""
    stub = make_stub_dir(tmp_path, functional_edlib=functional_edlib)
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
