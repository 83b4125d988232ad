#!/usr/bin/env python3
"""Micro-profile of the match pipeline pieces on the current backend."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from sctagger_tpu.runtime import configure_jax

configure_jax()

import jax
import jax.numpy as jnp

from bench import make_inputs
from sctagger_tpu.core.packing import LENIENT_TABLE, encode_seqs
from sctagger_tpu.models.matcher import _build_patterns, _topk_hits, PASS2_CHUNK
from sctagger_tpu.ops.myers import build_peq_multi
from sctagger_tpu.ops.match_pallas import (
    DEF_BP,
    DEF_BR,
    match_best_tpu,
    match_min_tpu,
    prep_peq_cols,
    prep_segs_T,
)


def t(label, fn, n=3):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1000:9.1f} ms")
    return dt


def main():
    print("backend:", jax.default_backend())
    n_segs = 131072
    segs, barcodes = make_inputs(n_segs)
    bl = 16

    t0 = time.perf_counter()
    pat_codes = _build_patterns(barcodes, bl)
    peq = build_peq_multi(pat_codes)
    peq_pm = prep_peq_cols(peq, bp=DEF_BP)
    print(f"{'host: build patterns+peq':40s} {(time.perf_counter()-t0)*1000:9.1f} ms")

    t0 = time.perf_counter()
    seg_codes, _ = encode_seqs(segs, pad_to=32, table=LENIENT_TABLE)
    print(f"{'host: encode 131K segs':40s} {(time.perf_counter()-t0)*1000:9.1f} ms")

    t0 = time.perf_counter()
    seg_T = prep_segs_T(seg_codes, ls=32, br=DEF_BR, r_pad=n_segs)
    print(f"{'host: prep_segs_T':40s} {(time.perf_counter()-t0)*1000:9.1f} ms")

    seg_T_d = jax.device_put(jnp.asarray(seg_T))
    peq_d = jax.device_put(jnp.asarray(peq_pm))

    d_pass1 = t(
        "pass1 kernel 131072x50176 (ls=32)",
        lambda: match_min_tpu(seg_T_d, peq_d, bl).block_until_ready(),
    )
    pairs = n_segs * peq_pm.shape[0]
    print(f"  -> {pairs/d_pass1/1e9:.2f} G pair/s; {pairs*32/d_pass1/1e12:.2f} T cell/s")

    # pass 2 shapes
    seg2 = prep_segs_T(seg_codes[:PASS2_CHUNK], ls=32, br=DEF_BR, r_pad=PASS2_CHUNK)
    seg2_d = jax.device_put(jnp.asarray(seg2))
    d_best = t(
        f"pass2 best kernel {PASS2_CHUNK}x50176",
        lambda: match_best_tpu(seg2_d, peq_d, bl).block_until_ready(),
    )
    best = match_best_tpu(seg2_d, peq_d, bl)
    target = jnp.zeros((PASS2_CHUNK,), jnp.int32)
    n_pat = len(barcodes) * 2
    d_topk = t(
        "pass2 topk_hits (k=16)",
        lambda: jax.tree.map(
            lambda x: x.block_until_ready(),
            _topk_hits(best, target, n_pat, 16),
        ),
    )
    d_xfer = t(
        "device->host transfer of cnt/idx",
        lambda: np.asarray(_topk_hits(best, target, n_pat, 16)[1]),
    )
    per_chunk = d_best + d_topk
    print(
        f"  -> pass2 per-chunk {per_chunk*1000:.0f} ms = "
        f"{PASS2_CHUNK/per_chunk:.0f} segs/s if all matched"
    )


if __name__ == "__main__":
    main()
