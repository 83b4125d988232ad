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
    n_hosts = getattr(args, "n_hosts", 1) or 1
    if n_hosts > 1:
        merged = _extract_multi(args, n_hosts)
        if merged is None:
            return  # non-zero hosts: host 0 writes the single output file
        top, total = merged
        top = top[: args.max_barcode_cnt]
    else:
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


def _extract_multi(args, n_hosts: int):
    """Sharded BAM scan over N hosts (VERDICT r1 #4): each host inflates and
    parses a contiguous compressed byte range (block-aligned in the native
    reader). Records spanning a shard boundary belong to the shard where they
    START; the spill handoff (a single int per boundary) rides the sync dir,
    so inflation — the expensive part — runs fully parallel and only the tiny
    skip offsets serialize.

    The merge reconstructs the exact single-host output: counts sum, and the
    global first-appearance index of each barcode (earlier shards' kept
    counts + local first index) reproduces the sequential Counter insertion
    order, so ranking by (count desc, first asc) is byte-identical.

    Returns (top, total) on host 0, None elsewhere."""
    import json

    from ..io.bam import bam_file_size, extract_cb_counts_range
    from ..parallel.multihost import make_host_group

    h = args.host_id
    group = make_host_group(
        args, "extract_sr_bc", [args.input],
        {"t": args.thresh, "s": args.step_size, "m": args.max_barcode_cnt},
    )
    size = bam_file_size(args.input)
    bounds = [size * i // n_hosts for i in range(n_hosts + 1)]
    skip = 0 if h == 0 else int.from_bytes(group.get_bytes(f"spill.h{h}"), "little")
    barcodes, counts, firsts, total, kept, spill = extract_cb_counts_range(
        args.input, bounds[h], bounds[h + 1], skip, parse_header=(h == 0),
    )
    if h + 1 < n_hosts:
        group.put_bytes(f"spill.h{h + 1}", int(spill).to_bytes(8, "little"))
    payload = json.dumps({
        "barcodes": barcodes,
        "counts": counts.tolist(),
        "firsts": firsts.tolist(),
        "total": total,
        "kept": kept,
    }).encode()
    parts = group.gather_bytes("srcounts", payload)
    if parts is None:
        return None
    # host 0: merge with globalized first-appearance indices
    agg: dict[str, list[int]] = {}
    total_all = 0
    kept_off = 0
    for blob in parts:
        d = json.loads(blob)
        total_all += d["total"]
        for b, c, f in zip(d["barcodes"], d["counts"], d["firsts"]):
            g = kept_off + f
            e = agg.get(b)
            if e is None:
                agg[b] = [c, g]
            else:
                e[0] += c
                if g < e[1]:
                    e[1] = g
        kept_off += d["kept"]
    ranked = sorted(agg.items(), key=lambda kv: (-kv[1][0], kv[1][1]))
    return [(b, v[0]) for b, v in ranked], total_all
