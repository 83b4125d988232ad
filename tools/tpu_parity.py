#!/usr/bin/env python3
"""Compiled-TPU parity gate (VERDICT r1 #2): prove the Pallas kernels that
actually run on hardware produce byte-identical stage outputs to the CPU/jnp
oracle path, with one command.

Runs the REAL CLI pipeline twice in subprocesses on a deterministic synthetic
fixture (planted adapters + barcodes):

  * TPU process: ambient axon backend -> Pallas kernel path
    (adapter_pallas scan + match_pallas fused min/ties [+ exact_lookup]);
  * CPU process: JAX_PLATFORMS=cpu -> jnp scan path (the one the golden
    tests validate byte-for-byte against the actual reference script).

and byte-compares every stage TSV. Writes TPU_PARITY.json at the repo root
and prints one JSON line. Exit code 0 iff all stages match.

Usage:
    python tools/tpu_parity.py                 # 100K reads, stages lr+match
    python tools/tpu_parity.py --reads 20000 --alt   # + extract_sr_bc_from_lr
    python bench.py --verify                   # same thing

NOTE axon remote compiles cost ~3.5-15 min per kernel shape per process; the
fixture keeps read/segment lengths inside one bucket each so the TPU run pays
~2 compiles. Subsequent same-shape runs are fast only while the server-side
cache is warm (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ADAPTER = "CTACACGACGCTCTTCCGATCT"
_COMP = bytes.maketrans(b"ACGT", b"TGCA")


def _rc(s: str) -> str:
    return s.encode().translate(_COMP)[::-1].decode()


def make_fixture(tmp: pathlib.Path, n_reads: int, n_barcodes: int, seed: int):
    """FASTQ with planted adapter+barcode (fwd and rc), SR barcode TSV, and
    a whitelist. Lengths stay in [150, 250) so stage 1 uses ONE bucket."""
    rng = np.random.default_rng(seed)
    alpha = np.frombuffer(b"ACGT", dtype=np.uint8)

    def dna(n: int) -> str:
        return alpha[rng.integers(0, 4, size=n)].tobytes().decode()

    def mut(s: str, k: int) -> str:
        b = list(s)
        for _ in range(k):
            p = int(rng.integers(len(b)))
            op = rng.random()
            if op < 0.34:
                b[p] = "ACGT"[int(rng.integers(4))]
            elif op < 0.67:
                del b[p]
            else:
                b.insert(p, "ACGT"[int(rng.integers(4))])
        return "".join(b)

    barcodes = sorted({dna(16) for _ in range(n_barcodes)})
    out = []
    for i in range(n_reads):
        bc = mut(barcodes[int(rng.integers(len(barcodes)))], int(rng.integers(0, 3)))
        body = dna(int(rng.integers(150, 240)))
        r = rng.random()
        if r < 0.44:
            pos = int(rng.integers(3, 15))
            seq = body[:pos] + mut(ADAPTER, int(rng.integers(0, 3))) + bc + body[pos:]
        elif r < 0.85:
            ins = _rc(ADAPTER + bc)
            cut = max(0, len(body) - int(rng.integers(3, 15)))
            seq = body[:cut] + ins + body[cut:]
        else:
            seq = body  # no adapter
        out.append(f"@r{i} p\n{seq}\n+\n{'I' * len(seq)}\n")
    fq = tmp / "reads.fastq"
    fq.write_text("".join(out))
    sr = tmp / "sr.tsv"
    sr.write_text("".join(f"{b}\t{9000 - j}\n" for j, b in enumerate(barcodes)))
    wl = tmp / "wl.txt"
    wl.write_text("".join(b + "\n" for b in barcodes))
    return fq, sr, wl


def _env(backend: str) -> dict:
    env = dict(os.environ)
    env.pop("SCTAG_CHECKPOINT_DIR", None)
    if backend == "cpu":
        # drop the axon sitecustomize: plain CPU jax
        env["PYTHONPATH"] = REPO
        env["JAX_PLATFORMS"] = "cpu"
    else:
        # ambient TPU env; make sure the repo wins on sys.path but the axon
        # plugin stays importable (CLAUDE.md: never drop /root/.axon_site)
        extra = env.get("PYTHONPATH", "")
        env["PYTHONPATH"] = f"{REPO}:{extra}" if extra else REPO
    return env


def _run(argv: list[str], backend: str, timeout: float,
         env_extra: dict | None = None) -> float:
    t0 = time.perf_counter()
    env = _env(backend)
    env.update(env_extra or {})
    proc = subprocess.run(
        [sys.executable, "-m", "sctagger_tpu", *argv],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{backend} run failed: {argv}\n{proc.stderr[-4000:]}"
        )
    return time.perf_counter() - t0


def _read(path: pathlib.Path) -> bytes:
    if str(path).endswith("gz"):
        return gzip.open(path, "rb").read()
    return path.read_bytes()


def run_parity(n_reads: int, n_barcodes: int, alt: bool, seed: int,
               timeout: float, keep: bool = False,
               backends=("tpu", "cpu")) -> dict:
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="sctag_parity_"))
    fq, sr, wl = make_fixture(tmp, n_reads, n_barcodes, seed)
    stages: dict[str, dict] = {}
    ok = True

    tags = ("tpu", "cpu")  # output naming stays stable even in --smoke mode
    lr = {t: tmp / f"lr_{t}.tsv.gz" for t in tags}
    mt = {t: tmp / f"match_{t}.tsv" for t in tags}
    al = {t: tmp / f"alt_{t}.tsv.gz" for t in tags}

    for t, b in zip(tags, backends):
        t_lr = _run(["extract_lr_bc", "-r", str(fq), "-o", str(lr[t])], b, timeout)
        t_mt = _run(
            ["match_trie", "-lr", str(lr[t]), "-sr", str(sr), "-mr", "2",
             "-t", "1", "-o", str(mt[t])], b, timeout,
        )
        stages.setdefault("extract_lr_bc", {})[f"wall_s_{t}"] = round(t_lr, 2)
        stages.setdefault("match_trie", {})[f"wall_s_{t}"] = round(t_mt, 2)
        if alt:
            # the "tpu" leg forces the DEVICE binary-search probe so its
            # hardware lowering is what gets byte-verified; the "cpu" leg
            # keeps the production default (host C++ hash probe, the
            # golden-validated oracle) — equality gates BOTH probes at once
            # (VERDICT r2 #3)
            t_al = _run(
                ["extract_sr_bc_from_lr", "-i", str(lr[t]), "-wl", str(wl),
                 "-o", str(al[t])], b, timeout,
                env_extra={"SCTAG_PROBE": "device"} if t == "tpu" else None,
            )
            stages.setdefault("extract_sr_bc_from_lr", {})[f"wall_s_{t}"] = (
                round(t_al, 2)
            )
            stages["extract_sr_bc_from_lr"][f"probe_{t}"] = (
                "device" if t == "tpu" else "host"
            )

    checks = [("extract_lr_bc", lr), ("match_trie", mt)]
    if alt:
        checks.append(("extract_sr_bc_from_lr", al))
    for name, paths in checks:
        a, c = _read(paths["tpu"]), _read(paths["cpu"])
        match = a == c
        stages[name]["bytes"] = len(c)
        stages[name]["rows"] = c.count(b"\n")
        stages[name]["identical"] = match
        ok &= match and len(c) > 0

    verdict = {
        "ok": bool(ok),
        "n_reads": n_reads,
        "n_barcodes": n_barcodes,
        "seed": seed,
        "stages": stages,
        "fixture_dir": str(tmp) if (keep or not ok) else None,
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    if ok and not keep:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return verdict


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--barcodes", type=int, default=500)
    ap.add_argument("--alt", action="store_true",
                    help="also gate extract_sr_bc_from_lr (exact_lookup)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="plumbing check: run BOTH legs on CPU (no TPU)")
    ap.add_argument("--out", default=None,
                    help="verdict path (default TPU_PARITY.json; a --smoke "
                         "run defaults elsewhere so it can't pose as a real "
                         "gate record)")
    args = ap.parse_args(argv)
    verdict = run_parity(
        args.reads, args.barcodes, args.alt, args.seed, args.timeout,
        keep=args.keep,
        backends=("cpu", "cpu") if args.smoke else ("tpu", "cpu"),
    )
    verdict["smoke"] = bool(args.smoke)
    out = args.out or os.path.join(
        REPO, "TPU_PARITY_SMOKE.json" if args.smoke else "TPU_PARITY.json"
    )
    pathlib.Path(out).write_text(json.dumps(verdict, indent=1) + "\n")
    print(json.dumps(verdict))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
