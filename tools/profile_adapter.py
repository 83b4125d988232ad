#!/usr/bin/env python3
"""Adapter-kernel microprofile on the live backend (kernel vs transfer).

Uses the exact chunk shape the 50K x 2000bp stage-1 bench produces
(l_total=3072, Bp=5120; text 2-bit packed to (768, 5120)). Timings via
np.asarray round trips (block_until_ready unreliable on axon).
"""
import sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from sctagger_tpu.runtime import configure_jax
configure_jax()
import jax
import jax.numpy as jnp
from sctagger_tpu.core.packing import STRICT_TABLE, encode_str, rev_compl
from sctagger_tpu.ops.myers import build_peq_multi
from sctagger_tpu.ops.adapter_pallas import (
    _adapter_scan_call, _peq_input, adapter_scan_dispatch,
)

ADAPTER = "CTACACGACGCTCTTCCGATCT"
L, B = 3072, 5120
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=(B, 2000)).astype(np.uint8)
lengths = np.full((B,), 2000, np.int32)
pat = np.stack([encode_str(ADAPTER, STRICT_TABLE),
                encode_str(rev_compl(ADAPTER), STRICT_TABLE)])
peq2 = build_peq_multi(pat)
peq_in = _peq_input(peq2)
m = len(ADAPTER)

# host-side packed buffers (mirror adapter_scan_dispatch internals)
cp = np.zeros((B, L), np.uint8); cp[:, :2000] = codes; cp &= 3
pk = (cp[:,0::4] | (cp[:,1::4]<<2) | (cp[:,2::4]<<4) | (cp[:,3::4]<<6)).view(np.int8)
text_np = np.ascontiguousarray(pk.T)
lens_np = np.zeros((1, B), np.int32); lens_np[0] = lengths

print("backend", jax.default_backend())
t0 = time.perf_counter()
text_d = jnp.asarray(text_np); lens_d = jnp.asarray(lens_np); peq_d = jnp.asarray(peq_in)
out = np.asarray(_adapter_scan_call(text_d, lens_d, peq_d, m, L))
print("warm call", round(time.perf_counter() - t0, 2), "s")

K = 5
t0 = time.perf_counter()
for _ in range(K):
    out = np.asarray(_adapter_scan_call(text_d, lens_d, peq_d, m, L))
dt = (time.perf_counter() - t0) / K
bp = L * B
print(f"kernel+smallfetch: {dt*1e3:.1f} ms/chunk -> {bp/dt/1e6:.1f} Mbp/s (padded)")

t0 = time.perf_counter()
for i in range(K):
    tt = jnp.asarray(text_np)
    np.asarray(tt[0, :8])
dt = (time.perf_counter() - t0) / K
print(f"upload {text_np.nbytes/1e6:.1f}MB: {dt*1e3:.1f} ms -> {text_np.nbytes/dt/1e6:.1f} MB/s")

# e2e from raw codes each time (pack + upload + kernel), what the stage does
t0 = time.perf_counter()
for i in range(K):
    out = np.asarray(adapter_scan_dispatch(codes, lengths, peq2, m, b_pad=B))
dt = (time.perf_counter() - t0) / K
print(f"numpy e2e (pack+upload+kernel): {dt*1e3:.1f} ms/chunk -> {bp/dt/1e6:.1f} Mbp/s (padded)")
