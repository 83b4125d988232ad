#!/usr/bin/env python3
"""Measure the ROADMAP fused-match-kernel experiments at the bench shape
(VERDICT r2 #2): base vs high-bit score accumulation (hb) vs per-block
dynamic sweep bound (dynls), each timed kernel-only on the live backend at
the 131072-segment chunk x 50048-pattern Peq the flagship bench runs.

Each variant is a distinct compiled shape (~4-15 min remote compile on axon
per process); `all` runs them sequentially in subprocesses and writes
MATCH_VARIANTS.json. Output cross-check: every variant prints the md5 of its
(d, cnt) rows — they must agree.
"""
import hashlib
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

VARIANTS = ("base", "hb", "dynls")
# extra opt-in variants (not part of `all`):
#   minonly — match_min_tpu at the bench shape: the fused kernel minus the
#   tie machinery. Its speedup over base/hb bounds ANY per-block early-out
#   win from above (the DP sweep can never be skipped; see
#   tools/earlyout_study.py). md5 covers the min row only.
#   ragged / ragged_dynls — VERDICT r3 #6: the SAME two kernels (hb on,
#   production default) on a RAGGED batch (lengths 16..64, length-sorted as
#   production dispatch does, padded to ls=64). dynls stops each block's
#   sweep at the block max length, so this is the distribution it exists
#   for; `ragged_pair` runs both in this process and writes the
#   MATCH_VARIANTS ragged rows.


def run_all():
    out = {}
    for v in VARIANTS:
        p = subprocess.run(
            [sys.executable, __file__, v], capture_output=True, text=True,
            timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            out[v] = {"error": p.stderr[-2000:]}
            print(f"{v}: FAILED\n{p.stderr[-2000:]}", file=sys.stderr)
            continue
        out[v] = json.loads(line[-1])
        print(line[-1])
    (REPO / "MATCH_VARIANTS.json").write_text(json.dumps(out, indent=1) + "\n")


def run_one(variant: str):
    from sctagger_tpu.runtime import configure_jax

    configure_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_inputs
    from sctagger_tpu.core.packing import LENIENT_TABLE, encode_seqs
    from sctagger_tpu.models.matcher import _build_patterns
    from sctagger_tpu.ops.myers import build_peq_multi
    from sctagger_tpu.ops.match_pallas import (
        DEF_BP, DEF_BR, match_full_dynls_tpu, match_full_tpu, match_min_tpu,
        prep_peq_cols, prep_segs_T,
    )

    n = 131072
    ls = 24  # the bench's segment length (4 + 16 + 4); matcher buckets to 24
    segs, barcodes = make_inputs(n)
    pat = _build_patterns(barcodes, 16)
    peq_pm = prep_peq_cols(build_peq_multi(pat), bp=DEF_BP)
    if variant.startswith("ragged"):
        # ragged batch: lengths 16..64, planted barcodes, LENGTH-SORTED as
        # the production dispatcher orders chunks — dynls' per-block bound
        # is tight exactly under this ordering
        ls = 64
        rng = np.random.default_rng(5)
        alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
        lens = np.sort(rng.integers(16, 65, size=n))
        segs = []
        for L in lens.tolist():
            s = alpha[rng.integers(0, 4, size=L)].tobytes().decode()
            if L >= 24 and rng.random() < 0.6:
                b = barcodes[int(rng.integers(len(barcodes)))]
                at = int(rng.integers(0, L - 16))
                s = s[:at] + b + s[at + 16 :]
            segs.append(s)
        maxlens = lens.reshape(n // DEF_BR, DEF_BR).max(axis=1)
        ml = jnp.asarray(maxlens.astype(np.int32).reshape(1, -1))
    seg_codes, _ = encode_seqs(segs, pad_to=ls, table=LENIENT_TABLE)
    seg_T = prep_segs_T(seg_codes, ls=ls, br=DEF_BR, r_pad=n)
    seg_d = jnp.asarray(seg_T)
    peq_d = jnp.asarray(peq_pm)

    if variant == "ragged":

        def call():
            return np.asarray(match_full_tpu(seg_d, peq_d, 16, hb=True))
    elif variant == "ragged_dynls":

        def call():
            return np.asarray(
                match_full_dynls_tpu(seg_d, peq_d, ml, 16, hb=True)
            )
    elif variant == "dynls":
        ml = jnp.asarray(np.full((1, n // DEF_BR), ls, np.int32))

        def call():
            return np.asarray(match_full_dynls_tpu(seg_d, peq_d, ml, 16))
    elif variant == "minonly":

        def call():
            return np.asarray(match_min_tpu(seg_d, peq_d, 16))
    else:

        def call():
            return np.asarray(
                match_full_tpu(seg_d, peq_d, 16, hb=(variant == "hb"))
            )

    t0 = time.perf_counter()
    out = call()
    warm = time.perf_counter() - t0
    K = 5
    t0 = time.perf_counter()
    for _ in range(K):
        out = call()
    dt = (time.perf_counter() - t0) / K
    print(json.dumps({
        "variant": variant,
        "backend": jax.default_backend(),
        "ms_per_chunk": round(dt * 1e3, 1),
        "segs_per_s_kernel": round(n / dt, 1),
        "warm_s": round(warm, 1),
        "out_md5": hashlib.md5(
            out[:1 if variant == "minonly" else 2].tobytes()
        ).hexdigest(),
        "n_segs": n, "ls": ls, "n_pat": int(peq_pm.shape[0]),
    }))


def run_ragged_pair():
    """Both ragged rows in subprocesses; merged into MATCH_VARIANTS.json."""
    data = {}
    if (REPO / "MATCH_VARIANTS.json").exists():
        data = json.loads((REPO / "MATCH_VARIANTS.json").read_text())
    for v in ("ragged", "ragged_dynls"):
        p = subprocess.run(
            [sys.executable, __file__, v], capture_output=True, text=True,
            timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if p.returncode != 0 or not line:
            data[v] = {"error": p.stderr[-2000:]}
            print(f"{v}: FAILED\n{p.stderr[-2000:]}", file=sys.stderr)
            continue
        data[v] = json.loads(line[-1])
        print(line[-1])
    (REPO / "MATCH_VARIANTS.json").write_text(json.dumps(data, indent=1) + "\n")


if __name__ == "__main__":
    v = sys.argv[1] if len(sys.argv) > 1 else "all"
    if v == "all":
        run_all()
    elif v == "ragged_pair":
        run_ragged_pair()
    else:
        run_one(v)
