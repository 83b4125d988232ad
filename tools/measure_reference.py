#!/usr/bin/env python3
"""Measure the reference match_trie throughput on this host.

The reference repo publishes no benchmark numbers (BASELINE.md), so bench.py
compares against a locally measured reference rate. This tool generates the
same synthetic workload as bench.py (25K barcodes, ~24bp segments, mr=2),
runs /root/reference/scTagger.py match_trie (with poison-stub native modules
— match_trie is pure Python) single-threaded, and prints segments/s.

Update REF_SEGS_PER_SEC_1T in bench.py from this number.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))


def main(n_segs: int = 20_000, threads: int = 1):
    from bench import make_inputs
    from refharness import make_stub_dir, REFERENCE

    segs, barcodes = make_inputs(n_segs)
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="sctag_refbench_"))
    (tmp / "sr.tsv").write_text("".join(f"{b}\t10\n" for b in barcodes))
    (tmp / "lr.tsv").write_text(
        "".join(f"read{i}\t0\t5\t{s}\n" for i, s in enumerate(segs))
    )
    stub = make_stub_dir(tmp)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(stub)
    env["MPLBACKEND"] = "Agg"

    t0 = time.perf_counter()
    proc = subprocess.run(
        [
            sys.executable, REFERENCE, "match_trie",
            "-lr", str(tmp / "lr.tsv"), "-sr", str(tmp / "sr.tsv"),
            "-mr", "2", "-t", str(threads), "-o", str(tmp / "out.tsv"),
        ],
        env=env,
        capture_output=True,
        text=True,
    )
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        raise SystemExit(proc.returncode)
    print(
        f"reference match_trie: {n_segs} segments, {threads} thread(s), "
        f"{dt:.1f}s -> {n_segs / dt:.2f} segments/s"
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=20_000)
    ap.add_argument("-t", type=int, default=1)
    a = ap.parse_args()
    main(a.n, a.t)
