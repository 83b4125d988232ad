#!/usr/bin/env python3
"""Adapter-kernel microprofile on the live backend (kernel vs transfer).

Default shape ~ the 50K x 2000bp stage-1 bench chunk (l_total=3072,
Bp=8192 reads; text 2-bit packed, v3 group-interleaved (L/4*8, Bp/8)).
Timings via np.asarray round trips (block_until_ready unreliable on axon).

Env: SCTAG_ADAPTER_LANES tunes BLOCK_LANES (register-pressure sweep);
SCTAG_PROF_B / SCTAG_PROF_L override the chunk shape.
"""
import os, sys, time, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np

from sctagger_tpu.runtime import configure_jax
configure_jax()
import jax
import jax.numpy as jnp
from sctagger_tpu.core.packing import STRICT_TABLE, encode_str, rev_compl
from sctagger_tpu.ops.myers import build_peq_multi
from sctagger_tpu.ops.adapter_pallas import (
    BLOCK_LANES, BLOCK_READS, _adapter_scan_call, _peq_input,
    adapter_scan_dispatch, adapter_scan_dispatch_packed,
)

ADAPTER = "CTACACGACGCTCTTCCGATCT"
L = int(os.environ.get("SCTAG_PROF_L", "3072"))
B = int(os.environ.get("SCTAG_PROF_B", str(BLOCK_READS)))
assert B % BLOCK_READS == 0, (B, BLOCK_READS)
READ_LEN = min(2000, L)
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=(B, READ_LEN)).astype(np.uint8)
lengths = np.full((B,), READ_LEN, np.int32)
pat = np.stack([encode_str(ADAPTER, STRICT_TABLE),
                encode_str(rev_compl(ADAPTER), STRICT_TABLE)])
peq2 = build_peq_multi(pat)
peq_in = _peq_input(peq2)
m = len(ADAPTER)

# host-side packed buffers (mirror adapter_scan_dispatch internals, v3
# group-interleaved rows: read r=(blk,g,lane) -> text[w*8+g, blk*BL+lane])
cp = np.zeros((B, L), np.uint8); cp[:, :READ_LEN] = codes; cp &= 3
pk = (cp[:,0::4] | (cp[:,1::4]<<2) | (cp[:,2::4]<<4) | (cp[:,3::4]<<6)).view(np.int8)
W = L // 4
nblk = B // BLOCK_READS
text_np = np.zeros((W * 8, nblk * BLOCK_LANES), np.int8)
text_np.reshape(W, 8, nblk, BLOCK_LANES)[...] = pk.reshape(
    nblk, 8, BLOCK_LANES, W).transpose(3, 1, 0, 2)
lens_np = np.ascontiguousarray(
    lengths.reshape(nblk, 8, BLOCK_LANES).transpose(1, 0, 2)
).reshape(8, nblk * BLOCK_LANES)

print("backend", jax.default_backend(), "lanes", BLOCK_LANES, "B", B, "L", L)
t0 = time.perf_counter()
text_d = jnp.asarray(text_np); lens_d = jnp.asarray(lens_np); peq_d = jnp.asarray(peq_in)
out = np.asarray(_adapter_scan_call(text_d, lens_d, peq_d, m, L))
print("warm call", round(time.perf_counter() - t0, 2), "s")

K = 5
bp = L * B
t0 = time.perf_counter()
for _ in range(K):
    out = np.asarray(_adapter_scan_call(text_d, lens_d, peq_d, m, L))
dt = (time.perf_counter() - t0) / K
print(f"kernel+smallfetch: {dt*1e3:.1f} ms/chunk -> {bp/dt/1e6:.1f} Mbp/s (padded)")

# kernel-only: dispatch K back-to-back (device executes FIFO), then force
# completion with a 32-byte fetch of the LAST output — the tunnel's variable
# fetch bandwidth (4-57 MB/s measured 2026-08-19) stays out of the timing
t0 = time.perf_counter()
outs = [_adapter_scan_call(text_d, lens_d, peq_d, m, L) for _ in range(K)]
np.asarray(outs[-1][0, 0, :8])
dt = (time.perf_counter() - t0) / K
print(f"kernel-only (tiny fetch): {dt*1e3:.1f} ms/chunk -> {bp/dt/1e6:.1f} Mbp/s (padded)")

t0 = time.perf_counter()
for i in range(K):
    tt = jnp.asarray(text_np)
    np.asarray(tt[0, :8])
dt = (time.perf_counter() - t0) / K
print(f"upload {text_np.nbytes/1e6:.1f}MB: {dt*1e3:.1f} ms -> {text_np.nbytes/dt/1e6:.1f} MB/s")

# e2e from raw codes each time (pack + riffle + upload + kernel)
t0 = time.perf_counter()
for i in range(K):
    out = np.asarray(adapter_scan_dispatch(codes, lengths, peq2, m, b_pad=B))
dt = (time.perf_counter() - t0) / K
print(f"numpy e2e (pack+upload+kernel): {dt*1e3:.1f} ms/chunk -> {bp/dt/1e6:.1f} Mbp/s (padded)")
