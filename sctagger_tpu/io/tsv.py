"""TSV readers/writers with byte-exact reference schemas.

Schemas (SURVEY.md §2 #10/#22):
  stage-1 LR segments : rname \t dist \t loc \t segment
  stage-2 whitelist   : barcode \t count
  stage-3 matches     : name \t e \t n_bids \t seg \t bc1,bc2,...
"""

from __future__ import annotations

import gzip
import sys


def open_maybe_gz(path: str, mode: str = "rt"):
    """Open for reading; gzip iff path ends with .gz (reference convention)."""
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode.replace("t", "") or "r")


def open_out(path: str | None, force_gzip: bool):
    """Output handle per reference conventions.

    force_gzip=True: gzip whenever a path is given (extract_lr_bc,
    extract_sr_bc, extract_sr_bc_from_lr — scTagger.py:377,504,839).
    force_gzip=False: gzip only if the path ends with 'gz' (match_trie —
    scTagger.py:770-774).
    """
    if path is None:
        return sys.stdout
    if force_gzip or path.endswith("gz"):
        return gzip.open(path, "wt+")
    return open(path, "w+")


def read_lr_segments_tsv(path: str):
    """Stage-1 output -> (names, dists, locs, segments) as parallel lists.

    All columns as raw strings; callers interpret. Mirrors both consumers:
    match_trie keeps cols 0 and 3 of every row (scTagger.py:602-628);
    extract_sr_bc_from_lr reads cols 2 and 3 and skips loc=='NA'
    (scTagger.py:812-826).
    """
    names, dists, locs, segs = [], [], [], []
    with open_maybe_gz(path) as f:
        for line in f:
            c = line.rstrip("\n").split("\t")
            names.append(c[0])
            dists.append(c[1])
            locs.append(c[2])
            segs.append(c[3])
    return names, dists, locs, segs


def read_sr_barcodes_tsv(path: str) -> list[str]:
    """Whitelist TSV -> barcodes (col 0, file order; scTagger.py:631-640)."""
    with open_maybe_gz(path) as f:
        return [line.rstrip("\n").split("\t")[0] for line in f]
