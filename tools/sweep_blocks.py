#!/usr/bin/env python3
"""Sweep (BR, BP) block shapes for the fused match kernel on the TPU."""

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
from sctagger_tpu.models.matcher import _build_patterns
from sctagger_tpu.ops.myers import build_peq_multi
from sctagger_tpu.ops.match_pallas import (
    match_full_tpu,
    prep_peq_cols,
    prep_segs_T,
)


def main():
    n = 131072
    segs, bcs = make_inputs(n)
    seg_codes, _ = encode_seqs(segs, pad_to=32, table=LENIENT_TABLE)
    peq = build_peq_multi(_build_patterns(bcs, 16))

    configs = [(512, 256), (256, 512), (1024, 128), (256, 256), (1024, 256),
               (512, 512), (2048, 128)]
    for br, bp in configs:
        try:
            peq_pm = jnp.asarray(prep_peq_cols(peq, bp=bp))
            seg_T = jnp.asarray(prep_segs_T(seg_codes, ls=32, br=br, r_pad=n))
            out = np.asarray(match_full_tpu(seg_T, peq_pm, 16, br=br, bp=bp))
            t0 = time.perf_counter()
            for _ in range(3):
                out = np.asarray(match_full_tpu(seg_T, peq_pm, 16, br=br, bp=bp))
            dt = (time.perf_counter() - t0) / 3
            print(f"BR={br:5d} BP={bp:4d}: {dt*1000:8.1f} ms  "
                  f"{n/dt:9.0f} segs/s", flush=True)
        except Exception as e:
            print(f"BR={br:5d} BP={bp:4d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
