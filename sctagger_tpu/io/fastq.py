"""FASTQ ingestion with the reference's exact parsing semantics.

Reference (scTagger.py:159-173): per file, line index resets; line%4==0 gives
the name (first whitespace token, minus the leading '@'), line%4==1 gives the
sequence (rstripped). gzip is used when the flag is set OR the filename ends
with '.gz'.
"""

from __future__ import annotations

import gzip
import sys
from typing import Sequence


def read_fastqs(fastqs: Sequence[str], gzipped: bool = False, quiet: bool = False):
    rnames: list[str] = []
    seqs: list[str] = []
    for fastq in fastqs:
        if not quiet:
            print(f"Reading {fastq}", file=sys.stderr)
        if gzipped or fastq.endswith(".gz"):
            f = gzip.open(fastq, "rt")
        else:
            f = open(fastq, "r")
        with f:
            for idx, line in enumerate(f):
                r = idx % 4
                if r == 0:
                    rnames.append(line.split()[0][1:])
                elif r == 1:
                    seqs.append(line.rstrip())
    return rnames, seqs
