#!/usr/bin/env python3
"""Decide the ROADMAP per-block early-out experiment with data.

The fused match kernel (ops/match_pallas._match_full_kernel) can only skip
work via @pl.when on a SCALAR predicate, i.e. when a whole (BP-pattern,
BR-read) block contributes nothing for EVERY read in the block:
`all(block_min > running_min)` (strictly — block_min == running_min adds tie
slots). The DP sweep itself can never be skipped (block_min is its output),
so the skippable section is the tie machinery after the sweep.

This tool measures both factors of the expected win on the flagship bench
distribution (bench.make_inputs: 25K whitelist, ~24bp segments with planted
0-2-error barcodes — the reference match_trie workload):

  1. skip rate: fraction of (read-block, pattern-block) grid cells where the
     predicate holds, simulated on the host from the exact best-distance
     matrix (models.matcher._best_matrix_jnp_t) with the kernel's running-min
     walk (pattern axis innermost, ascending — the real visit order);
  2. ceiling: the tie section's share of kernel time, measured on hardware as
     match_min_tpu (sweep + min only) vs match_full_tpu at the bench shape
     (tools/profile_match_variants.py 'minonly' variant).

expected win <= skip_rate * tie_section_share.

Usage: python tools/earlyout_study.py [n_sample_reads]  (host CPU only)
"""
from __future__ import annotations

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    import numpy as np

    from bench import make_inputs
    from sctagger_tpu.core.packing import LENIENT_TABLE, encode_seqs
    from sctagger_tpu.models.matcher import _best_matrix_jnp_t, _build_patterns
    from sctagger_tpu.ops.myers import build_peq_multi

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    segs, barcodes = make_inputs(n_reads)
    pat = _build_patterns(barcodes, 16)
    peq = build_peq_multi(pat)
    seg_codes, _ = encode_seqs(segs, pad_to=24, table=LENIENT_TABLE)

    t0 = time.perf_counter()
    best = np.asarray(_best_matrix_jnp_t(seg_codes, peq, 16))  # (P, R) int8
    print(
        f"best matrix {best.shape} in {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )

    P, R = best.shape
    results = {}
    for br, bp in ((1024, 256), (256, 256), (128, 256), (1024, 512),
                   (128, 8)):
        n_rb = R // br
        n_pb = -(-P // bp)  # include the ragged final pattern block
        skippable = 0
        strict_after_first = 0
        for i in range(n_rb):
            blk = best[:, i * br : (i + 1) * br]
            d = np.full(br, 16, np.int32)
            for j in range(n_pb):
                bmin = blk[j * bp : (j + 1) * bp].min(axis=0)
                if (bmin > d).all():
                    skippable += 1
                    if j > 0:
                        strict_after_first += 1
                np.minimum(d, bmin, out=d)
        total = n_rb * n_pb
        results[f"br{br}_bp{bp}"] = {
            "grid_cells": total,
            "skippable": skippable,
            "skip_rate": round(skippable / total, 6),
            "strict_after_first": strict_after_first,
        }
        print(
            f"BR={br:5d} BP={bp:4d}: {skippable}/{total} blocks skippable "
            f"({100 * skippable / total:.3f}%)",
            file=sys.stderr,
        )
    out = {
        "n_reads_sampled": n_reads,
        "n_patterns": P,
        "workload": "bench.make_inputs (flagship distribution)",
        "predicate": "all(block_min > running_min) over the read block",
        "results": results,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
