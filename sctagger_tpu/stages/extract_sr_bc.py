"""`extract_sr_bc` stage driver — SR whitelist from a Cell Ranger BAM.

Pipeline (reference scTagger.py:469-509): BAM CB counts -> sort descending
(stable w.r.t. first appearance) -> cap --max-barcode-cnt -> coverage
histogram + elbow cutoff -> gzip TSV `barcode \t count`.

Equal-count ordering note: the reference's order among equal counts is the
nondeterministic imap_unordered arrival order (scTagger.py:445,474); with
-t 1 it reduces to the sequential scan's first-appearance order, which is
what the native reader preserves — so output matches the reference's
single-thread run deterministically.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.cutoff import barcode_hist, elbow_cutoff
from ..io.bam import extract_cb_counts
from ..io.tsv import open_out


def run(args) -> None:
    print(f"\n====\nExtracting SR barcodes from {args.input}:")  # stdout, as the reference (scTagger.py:434)
    barcodes, counts, total = extract_cb_counts(args.input)

    print("\n=====\nCounting and sorting barcodes")
    order = np.argsort(-counts, kind="stable")[: args.max_barcode_cnt]
    top = [(barcodes[i], int(counts[i])) for i in order]

    hist = barcode_hist(top, total=total, step_size=args.step_size)
    last_idx = elbow_cutoff(hist, n_barcodes=len(top), thresh=args.thresh)

    if args.plotfile is not None:
        from ..plots import plot_sr_bc_coverage

        plot_sr_bc_coverage(
            distribution=hist,
            step_size=args.step_size,
            last_idx=last_idx,
            outfile=args.plotfile,
        )

    print(f"\n=====\nWriting the top {last_idx} barcodes")
    outfile = open_out(args.outfile, force_gzip=True)
    for b, c in top[:last_idx]:
        outfile.write(f"{b}\t{c}\n")
    if outfile is not sys.stdout:
        outfile.close()
