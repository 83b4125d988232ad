"""`match_trie` stage driver — TSV-parity port of the reference's flagship.

Input/behavior contract (scTagger.py:758-790):
  * barcodes: col 0 of the SR TSV, in file order (bid = line index); all must
    have uniform length == --barcode-length (asserted).
  * long reads: cols 0 and 3 of EVERY row of the LR TSV (including dist=-1
    rows, whose segment is empty and can never match).
  * output row per MATCHED read only, ascending read id:
      name \t e \t len(bids) \t seg \t bc1,bc2,...
    where the tie list is sorted by (bid, strand) with strand False (revcomp)
    before True (forward), and revcomp matches print rev_compl(barcode).
  * output gzipped only if the path ends with 'gz'.
  * --mem and --plotfile are accepted and unused (reference parity:
    scTagger.py:88-95,141 — parsed, never consumed).
"""

from __future__ import annotations

import sys

from ..core.packing import rev_compl
from ..io.tsv import open_out, read_lr_segments_tsv, read_sr_barcodes_tsv
from ..models.matcher import match_segments
from ..observability import stage_scope


def run(args) -> None:
    with stage_scope("match_trie") as stats:
        _run(args, stats)


def _run(args, stats) -> None:
    barcodes = read_sr_barcodes_tsv(args.short_read_barcodes)
    print(f"There are {len(barcodes):,} SR barcodes", file=sys.stderr)
    barcode_lens = {len(b) for b in barcodes}
    assert barcode_lens == {args.barcode_length}, barcode_lens

    names, _, _, segs = read_lr_segments_tsv(args.long_read_segments)
    print(f"There are {len(names):,} LRs", file=sys.stderr)

    stats.count("barcodes", len(barcodes))
    stats.count("reads", len(names))
    with stats.timer("match"):
        result = match_segments(
            segments=segs,
            barcodes=barcodes,
            max_error=args.max_error,
            progress=True,
        )
    stats.count("matched", int(result.rids.size))

    outfile = open_out(args.outfile, force_gzip=False)
    # pre-render both print forms of every barcode once
    fwd_strs = list(barcodes)
    rc_strs = [rev_compl(b) for b in barcodes]
    for i in range(result.rids.size):
        rid = result.rids[i]
        ties = result.ties_of(i)
        matches = ",".join(
            fwd_strs[p >> 1] if p & 1 else rc_strs[p >> 1] for p in ties
        )
        outfile.write(
            f"{names[rid]}\t{result.dists[i]}\t{ties.size}\t{segs[rid]}\t"
            f"{matches}\n"
        )
    if outfile is not sys.stdout:
        outfile.close()
