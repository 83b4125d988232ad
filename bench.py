#!/usr/bin/env python3
"""Benchmark: LR segments matched per second per chip (BASELINE.json metric).

Workload: mr=2, bl=16, 25K-barcode whitelist (=> 50K fwd+rc patterns),
synthetic ~24bp segments with planted barcodes — the reference match_trie
configuration. Measures the full two-pass device match (min-distance pass +
tie-extraction pass) via models.matcher.match_segments, end to end excluding
file I/O.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "segments/s", "vs_baseline": N}

vs_baseline is against the reference match_trie throughput measured ON THIS
HOST (see tools/measure_reference.py): single-thread segments/s scaled by the
reference's declared 32-thread envelope (Snakefile:128-132) — i.e. an
idealized linear-scaling 32-core CPU reference, a deliberately generous
baseline. The repo publishes no perf numbers of its own (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference match_trie on this host: 20K segments x 25K barcodes, mr=2,
# threads=1 -> 1267.3s = 15.8 segs/s (tools/measure_reference.py, 2026-08-17).
REF_SEGS_PER_SEC_1T = 15.8
REF_THREADS = 32  # Snakefile:130 resource envelope (ideal linear scaling)


def make_inputs(n_segs: int, n_barcodes: int = 25_000, seed: int = 0,
                indels: bool | None = None):
    """Synthetic flagship workload: planted barcodes with 0-2 edits drawn
    uniformly. Default edits are SUBSTITUTION-ONLY (the historical headline
    distribution; segments stay uniformly 24bp). ``indels`` (or
    SCTAG_BENCH_INDELS=1) draws each edit uniformly from
    {substitution, deletion, insertion} instead — ragged 22-26bp segments,
    the harder distribution (recorded alongside the headline in CLAUDE.md).
    """
    if indels is None:
        indels = os.environ.get("SCTAG_BENCH_INDELS", "0") == "1"
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    # unique barcodes
    seen = set()
    while len(seen) < n_barcodes:
        chunk = alpha[rng.integers(0, 4, size=(n_barcodes, 16))]
        for row in chunk:
            seen.add(row.tobytes())
            if len(seen) >= n_barcodes:
                break
    barcodes = [b.decode() for b in sorted(seen)]

    segs = []
    bc_idx = rng.integers(0, n_barcodes, size=n_segs)
    errs = rng.integers(0, 3, size=n_segs)
    for i in range(n_segs):
        pre = alpha[rng.integers(0, 4, size=4)].tobytes().decode()
        post = alpha[rng.integers(0, 4, size=4)].tobytes().decode()
        bc = barcodes[bc_idx[i]]
        if errs[i]:
            b = bytearray(bc.encode())
            for _ in range(errs[i]):
                op = rng.integers(0, 3) if indels else 0
                p = int(rng.integers(0, len(b)))
                if op == 0:
                    b[p] = alpha[rng.integers(0, 4)]
                elif op == 1 and len(b) > 1:
                    del b[p]
                else:
                    b.insert(p, alpha[rng.integers(0, 4)])
            bc = b.decode()
        segs.append(pre + bc + post)
    return segs, barcodes


def main():
    if "--verify" in sys.argv[1:]:
        # compiled-TPU parity gate: byte-compare TPU vs CPU stage outputs
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        import tpu_parity

        sys.exit(tpu_parity.main([a for a in sys.argv[1:] if a != "--verify"]))
    # default = sustained scale (8 chunk-multiples): chunk-count quantization
    # (every device chunk pads to the fixed PASS1_CHUNK kernel shape) and the
    # prefilter's chunk savings both amortize here, matching the perf log's
    # 1M sustained rows. A/B at this size 2026-08-20: dist<=1 prefilter +
    # prep pipeline 130,310 segs/s / dist-0-only 101,027 / prefilter fully
    # off 65,027 (all recorded in CLAUDE.md; SCTAG_BENCH_INDELS=1 runs the
    # harder sub/del/ins workload, recorded at 95,568).
    n_segs = int(os.environ.get("SCTAG_BENCH_SEGS", 1_048_576))
    from sctagger_tpu.runtime import configure_jax

    configure_jax()
    import jax

    from sctagger_tpu.models.matcher import match_segments

    segs, barcodes = make_inputs(n_segs)

    # warmup with the full workload so every kernel shape (small + large
    # chunks) is compiled before the timed region
    match_segments(segs, barcodes, max_error=2)

    t0 = time.perf_counter()
    result = match_segments(segs, barcodes, max_error=2)
    dt = time.perf_counter() - t0

    rate = n_segs / dt
    baseline = REF_SEGS_PER_SEC_1T * REF_THREADS
    print(
        json.dumps(
            {
                "metric": "lr_segments_matched_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "segments/s",
                "vs_baseline": round(rate / baseline, 2),
                "detail": {
                    "n_segments": n_segs,
                    "n_barcodes": len(barcodes),
                    "mr": 2,
                    "wall_s": round(dt, 3),
                    "matched": int(result.rids.size),
                    "backend": jax.default_backend(),
                    "baseline_segs_per_sec": baseline,
                    "baseline_note": (
                        "reference match_trie measured on this host at "
                        f"{REF_SEGS_PER_SEC_1T} segs/s single-thread, scaled "
                        f"x{REF_THREADS} (ideal linear) for the Snakefile "
                        "32-thread envelope"
                    ),
                    "stages": _stage_rates(),
                },
            }
        )
    )


def _stage_rates():
    """Per-stage ours-vs-reference rates (VERDICT r1 #3), folded in from
    BENCH_STAGES.json (ours, tools/bench_stages.py) and REF_MEASURED.json
    (reference, tools/measure_reference.py) — both measured on this host
    with identical fixtures and full-CLI-wall protocol."""
    here = os.path.dirname(os.path.abspath(__file__))

    def _load(name):
        p = os.path.join(here, name)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    ours = _load("BENCH_STAGES.json")
    ref = _load("REF_MEASURED.json")
    out = {}
    for s in ("lr", "lr_sustained", "lr_sustained_q20", "sr", "alt",
              "alt_device", "alt_3m", "alt_device_3m"):
        if s not in ours:
            continue
        e = {
            "value": ours[s]["value"],
            "unit": ours[s]["unit"],
            "wall_s": ours[s]["wall_s"],
            "backend": ours[s].get("backend"),
            "measured": ours[s].get("date"),
        }
        if "phases_s" in ours[s]:
            e["phases_s"] = ours[s]["phases_s"]
        if "d0_resolved_frac" in ours[s]:
            e["d0_resolved_frac"] = ours[s]["d0_resolved_frac"]
        for k in ("best_value", "best_note", "variance_note"):
            if k in ours[s]:
                e[k] = ours[s][k]
        # variant rows share their base stage's reference baseline
        rs = {
            "alt_device": "alt", "alt_3m": "alt", "alt_device_3m": "alt",
            "lr_sustained": "lr", "lr_sustained_q20": "lr",
        }.get(s, s)
        if rs in ref:
            if rs == "lr":
                # stage-1 envelope: 32 threads (Snakefile:84-87), ideal scaling
                base = ref[rs]["value"] * 32
                e["baseline"] = f"{base:.0f} reads/s (native-Myers ref x32)"
            elif s == "sr":
                # htslib-class speed of light: single-stream BGZF inflate
                base = ref[rs]["inflate_alns_per_s"]
                e["baseline"] = (
                    f"{base:.0f} alns/s (single-stream zlib inflate bound)"
                )
            else:
                # alt stage 2 is single-threaded in the reference
                base = ref[rs]["value"]
                e["baseline"] = f"{base:.0f} rows/s (native-AC ref, 1 thread)"
            e["vs_baseline"] = round(ours[s]["value"] / base, 2)
        out[s] = e
    return out


if __name__ == "__main__":
    main()
