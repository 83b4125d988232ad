#!/usr/bin/env python3
"""Full-pipeline (Snakefile-equivalent DAG) end-to-end benchmark on one chip.

Drives pipeline/runner.py over a synthetic sample whose LR reads carry the
SR adapter + a whitelist barcode and whose BAM CB tags draw from the SAME
pool, so every rule does real work and the match stages find real hits:

  cellranger (skipped; pre-made BAM) -> extract_sr_bc -> extract_lr_bc ->
  extract_sr_bc_from_lr -> match_trie (vs SR whitelist AND LR whitelist).

Protocol (CLAUDE.md): cold = first in-process pipeline run (axon session
handshake + remote kernel compiles land here); warm = second run in the SAME
process with all outputs wiped (mtime resume disabled by deletion) — the
per-process one-offs a warmed service never repeats. Per-stage walls come
from SCTAG_STATS. Records PIPELINE_E2E.json at the repo root.
"""

from __future__ import annotations

import json
import os
import pathlib
import struct
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

ADAPTER = "CTACACGACGCTCTTCCGATCT"
FIXTURE_CACHE = pathlib.Path("/tmp/sctag_fixture_cache")


def _make_fixture(n_reads: int, n_alns: int, n_pool: int, read_len: int):
    """LR FASTQ + BAM + whitelist over one shared barcode pool (cached)."""
    import numpy as np

    from bamgen import BGZF_EOF, bam_record, bgzf_block

    FIXTURE_CACHE.mkdir(exist_ok=True)
    d = FIXTURE_CACHE / f"pipe_{n_reads}_{n_alns}_{n_pool}_{read_len}"
    fq, bam, wl = d / "lr.fastq", d / "sr.bam", d / "wl.txt"
    if fq.exists() and bam.exists() and wl.exists():
        return fq, bam, wl
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(4)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
    pool = sorted(
        {
            alpha[r].tobytes().decode()
            for r in rng.integers(0, 4, size=(n_pool + 64, 16))
        }
    )[:n_pool]
    wl.write_text("\n".join(pool) + "\n")

    with open(fq, "w") as f:
        picks = rng.integers(0, n_pool, size=n_reads)
        for i in range(n_reads):
            L = int(rng.integers(read_len // 2, read_len * 3 // 2))
            body = alpha[rng.integers(0, 4, size=L)].tobytes().decode()
            pos = int(rng.integers(0, 20))
            seq = body[:pos] + ADAPTER + pool[picks[i]] + body[pos:]
            f.write(f"@r{i} x\n{seq}\n+\n{'I' * len(seq)}\n")

    # BAM: CB tags zipf-weighted over the same pool (streaming BGZF blocks)
    weights = 1.0 / (np.arange(n_pool) + 1.0)
    weights /= weights.sum()
    header = b"BAM\x01" + struct.pack("<i", 0) + struct.pack("<i", 1)
    cb = b"chr1\x00"
    header += struct.pack("<i", len(cb)) + cb + struct.pack("<i", 10**6)
    flags = rng.choice([0, 16, 99, 147, 272, 1024], size=n_alns,
                       p=[0.3, 0.3, 0.15, 0.15, 0.05, 0.05])
    picks = rng.choice(n_pool, size=n_alns, p=weights)
    seqs = rng.integers(0, 4, size=(n_alns, 32))
    with open(bam, "wb") as f:
        buf = bytearray(header)
        for i in range(n_alns):
            buf += bam_record(
                ref_id=0, pos=i % 10**5, flag=int(flags[i]), name=f"q{i}",
                seq=alpha[seqs[i]].tobytes().decode(),
                tags=[("NM", int(i % 5)), ("CB", pool[picks[i]] + "-1")],
            )
            if len(buf) >= 60000:
                f.write(bgzf_block(bytes(buf[:60000])))
                del buf[:60000]
        while buf:
            f.write(bgzf_block(bytes(buf[:60000])))
            del buf[:60000]
        f.write(BGZF_EOF)
    return fq, bam, wl


def _wipe_outputs(outpath: pathlib.Path, sample: str) -> None:
    for p in (outpath / sample).glob("*.tsv.gz"):
        p.unlink()


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--alns", type=int, default=1_000_000)
    ap.add_argument("--pool", type=int, default=25_000)
    ap.add_argument("--read-len", type=int, default=2000)
    a = ap.parse_args()

    from sctagger_tpu.runtime import configure_jax

    configure_jax()
    import tempfile

    import jax
    import yaml

    fq, bam, wl = _make_fixture(a.reads, a.alns, a.pool, a.read_len)
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="sctag_pipe_"))
    outpath = tmp / "out"
    sample = "s1"
    # the runner expects the cellranger BAM at its canonical artifact path
    bam_dir = outpath / "cellranger-out" / sample / sample / "outs"
    bam_dir.mkdir(parents=True)
    (bam_dir / "possorted_genome_bam.bam").symlink_to(bam)
    cfg = {
        "outpath": str(outpath),
        "exec": {"scTagger": "unused"},
        "samples": {
            sample: {
                "ref": "hs",
                "whiltlist": str(wl),  # reference config spelling
                "lr_fastqs": [str(fq)],
                "sr": {"I1": str(bam), "R1": str(bam), "R2": str(bam),
                       "dir": str(tmp), "prefix": "x"},
            }
        },
        "references": {"hs": {"cellranger_ref": str(tmp)}},
    }
    cfg_path = tmp / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from sctagger_tpu.pipeline import run_pipeline

    stats_path = tmp / "stats.jsonl"
    os.environ["SCTAG_STATS"] = str(stats_path)

    t0 = time.perf_counter()
    run_pipeline(str(cfg_path))
    cold = time.perf_counter() - t0

    _wipe_outputs(outpath, sample)
    stats_path.unlink(missing_ok=True)
    t0 = time.perf_counter()
    run_pipeline(str(cfg_path))
    warm = time.perf_counter() - t0

    stages: dict[str, float] = {}
    rows = 0
    for line in stats_path.read_text().splitlines():
        r = json.loads(line)
        # match_trie runs twice (SR + LR-derived whitelists): accumulate
        stages[r["stage"]] = round(
            stages.get(r["stage"], 0.0) + r["wall_s"], 2
        )
    import gzip

    with gzip.open(outpath / sample / f"{sample}.lr_bc_matches.tsv.gz") as f:
        rows = sum(1 for _ in f)
    entry = {
        "n_lr_reads": a.reads,
        "n_bam_alignments": a.alns,
        "n_pool_barcodes": a.pool,
        "wall_cold_s": round(cold, 1),
        "wall_warm_s": round(warm, 1),
        "lr_reads_per_s_warm": round(a.reads / warm, 1),
        "stages_warm_s": stages,
        "matched_rows": rows,
        "backend": jax.default_backend(),
        "date": time.strftime("%Y-%m-%d"),
        "note": (
            "full DAG via pipeline/runner.py (BAM pre-made at the "
            "cellranger artifact path); warm = second in-process run with "
            "outputs wiped — remote-compile + handshake one-offs land in "
            "cold only"
        ),
    }
    (REPO / "PIPELINE_E2E.json").write_text(json.dumps(entry, indent=1) + "\n")
    print(json.dumps(entry))


if __name__ == "__main__":
    main()
