"""`extract_sr_bc_from_lr` stage driver — whitelist recovery from LR segments.

Pipeline (reference scTagger.py:792-844): read the 10x whitelist (NOTE the
reference strips exactly one trailing char per line, `l[:-1]` — reproduced) ->
exact-match every segment window against fwd+rc of every whitelist barcode ->
drop ambiguous reads (>1 hit) -> count by abs(index), fwd/rc merged ->
sort by count desc (ties keep first-increment order) -> cap, chunked
threshold cutoff -> TSV `barcode \t count` (gzipped when -o given).
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.cutoff import chunked_cutoff
from ..core.packing import rev_compl
from ..io.tsv import open_maybe_gz, open_out
from ..ops.exact_lookup import build_key_table, host_dict_fallback, probe_segments
from ..ops.topk_count import count_and_rank


def run(args) -> None:
    infile = open_maybe_gz(args.barcode_whitelist)
    print(f"Reading whiltelist barcodes from: {args.barcode_whitelist}")
    barcodes = [l[:-1] for l in infile]
    infile.close()

    barcodes_rc = [rev_compl(b) for b in barcodes]

    print(f"\n=====\nMatching exact barcodes on long-reads: {args.input}")
    segments: list[str] = []
    with open_maybe_gz(args.input) as f:
        for l in f:
            _, _, p, seg = l.rstrip("\n").split("\t")
            if p == "NA":
                continue
            segments.append(seg)

    try:
        sorted_keys, values = build_key_table(barcodes, barcodes_rc)
        counts_per_seg, single_val = probe_segments(
            segments, sorted_keys, values, k=len(barcodes[0])
        )
    except ValueError:
        print("whitelist not uniform ACGT; using host fallback", file=sys.stderr)
        counts_per_seg, single_val = host_dict_fallback(
            segments, barcodes, barcodes_rc
        )

    matched = counts_per_seg == 1
    vals = np.abs(single_val[matched]).astype(np.uint32)
    # device count + rank by (count desc, first-increment asc) — identical to
    # the reference's insertion-ordered Counter + stable reverse sort
    # (scTagger.py:826-828)
    keys_ranked, counts_ranked = count_and_rank(vals)
    print(f"\n=====\nFound {len(keys_ranked):,} unique barcodes on long-reads")
    sorted_bc = [
        (int(k), int(c)) for k, c in zip(keys_ranked, counts_ranked)
    ][: args.max_barcode_cnt]
    sorted_bc = chunked_cutoff(sorted_bc, args.step_size, args.thresh)

    print(f"\n=====\nWriting the top {len(sorted_bc)} barcodes")
    outfile = open_out(args.outfile, force_gzip=True)
    for bc, c in sorted_bc:
        outfile.write(f"{barcodes[bc]}\t{c}\n")
    if outfile is not sys.stdout:
        outfile.close()
