#!/usr/bin/env python3
"""TPU shootout: int32 vs int16 DP word in the single-sweep match kernel.

Uses the exact bench shape (ls=24, PASS1_CHUNK reads, 25K-barcode whitelist)
so results map directly onto the perf log. Times via np.asarray round trips
(block_until_ready is unreliable on axon — CLAUDE.md).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from sctagger_tpu.runtime import configure_jax

configure_jax()

import jax
import jax.numpy as jnp

from bench import make_inputs
from sctagger_tpu.core.packing import LENIENT_TABLE, encode_rows
from sctagger_tpu.models.matcher import PASS1_CHUNK, _build_patterns
from sctagger_tpu.ops.myers import build_peq_multi
from sctagger_tpu.ops.match_pallas import (
    DEF_BP,
    DEF_BR,
    match_full_tpu,
    prep_peq_cols,
    prep_segs_T,
)


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = PASS1_CHUNK
    segs, barcodes = make_inputs(n)
    bl = 16
    ls = 24  # bench segments are 4+16+4 bp

    peq = build_peq_multi(_build_patterns(barcodes, bl))
    peq_pm = prep_peq_cols(peq, bp=DEF_BP)
    codes, _ = encode_rows(segs, np.arange(n), pad_to=ls, table=LENIENT_TABLE)
    seg_T = prep_segs_T(codes, ls=ls, br=DEF_BR, r_pad=n)

    seg_d = jax.device_put(jnp.asarray(seg_T))
    peq_d = jax.device_put(jnp.asarray(peq_pm))

    results = {}
    for w16 in (False, True):
        label = "w16" if w16 else "w32"
        try:
            t0 = time.perf_counter()
            out = np.asarray(match_full_tpu(seg_d, peq_d, bl, w16=w16))
            print(f"{label}: compile+run {time.perf_counter()-t0:.1f}s",
                  flush=True)
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = np.asarray(match_full_tpu(seg_d, peq_d, bl, w16=w16))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            results[label] = (dt, out)
            print(f"{label}: steady {dt*1000:.1f} ms = {n/dt:,.0f} segs/s "
                  f"(times: {[f'{t*1000:.0f}' for t in times]})", flush=True)
        except Exception as e:  # compile failure on one variant is a result
            print(f"{label}: FAILED: {type(e).__name__}: {e}", flush=True)

    if len(results) == 2:
        np.testing.assert_array_equal(results["w32"][1], results["w16"][1])
        print("outputs identical; speedup w32/w16 = "
              f"{results['w32'][0]/results['w16'][0]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
