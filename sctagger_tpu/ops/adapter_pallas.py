"""Pallas TPU kernel for stage-1 adapter scanning (replaces edlib HW).

One pass over each read computes, for BOTH the adapter and its reverse
complement simultaneously (the reference runs two edlib calls per read,
scTagger.py:180-181):

  d        min infix edit distance over valid positions,
  cnt      number of optimal end positions (clipped at SLOTS_K),
  max_pos  the largest optimal end position,
  s0..s3   the first SLOTS_K optimal end positions (ascending).

The first-K collection uses reset-on-improve registers, so no (L x B) score
or mask arrays ever exist: per-read output is N_OUT ints. Reads with
cnt > SLOTS_K (multi-site adapter hits, rare) are re-processed by the jnp
mask fallback in models/adapter.py.

Layout (v2 — mirrors the roofline-speed match kernel, ops/match_pallas.py):
reads ride the LANE axis as position-major 2-D text (L, B) int8; each block
bulk-converts its (CHUNK_L, BLOCK_READS) int8 text to an int32 VMEM scratch
once, then the DP loop reads one (1, BLOCK_READS) row per character via a
dynamic sublane slice — the exact access pattern the match kernel proved
fast. The two patterns (adapter fwd + rc) sit on SUBLANES of the (8, B)
state, so one Myers step advances both strands at once. The v1 layout
((L, B/128, 8, 128) read-tiles with a per-char dynamic squeeze-index into a
3-D int8 block) ran ~500x below the VPU instruction roofline; six structural
variants of it all lost (ROADMAP.md) — the 2-D int32-scratch row access is
the structural fix.

Grid = (read_blocks, L_chunks) with the L axis innermost so the DP state
lives in scratch across chunks (TPU grids execute sequentially). Validity
(j < read_length) gates every hit so batch padding can't fabricate tie
positions (a never-matching pad char CAN tie the running min).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils import cdiv, full_fast, round_up
from .myers import high_bit

SLOTS_K = 4
N_OUT = 16  # rows [d, cnt, max, s0..s3] x 2 patterns = 14, padded to 16
CHUNK_L = 512
BLOCK_READS = 1024  # lanes per block
_NST = 6 + SLOTS_K  # state rows: pv, mv, score, d, cnt, mx, slots


def _high_const(m: int) -> jnp.ndarray:
    """Sign-safe int32 constant for bit (m-1); m=32 wraps to INT32_MIN
    (numpy 2 rejects negative ints for unsigned dtypes, so mask first)."""
    return jnp.asarray(
        np.array(high_bit(m) & 0xFFFFFFFF, np.uint64).astype(np.int32)
    )


def _kernel(
    text_ref,  # (CL/4, BR) int8: 2-bit packed, char j at row j>>2 bits 2*(j&3)
    len_ref,  # (1, BR) int32
    peq_ref,  # (8, 8) int32: row p = pattern p's Peq, cols 0..3 = base codes
    out_ref,  # (N_OUT, BR) int32
    st_ref,  # scratch (_NST, 8, BR) int32
    tx32_ref,  # scratch (CL/4, BR) int32
    *,
    m: int,
    cl: int,
    n_lchunks: int,
):
    l = pl.program_id(1)
    br = text_ref.shape[1]

    @pl.when(l == 0)
    def _():
        st_ref[0] = jnp.full((8, br), -1, jnp.int32)  # pv
        st_ref[1] = jnp.zeros((8, br), jnp.int32)  # mv
        st_ref[2] = jnp.full((8, br), m, jnp.int32)  # score
        st_ref[3] = jnp.full((8, br), m, jnp.int32)  # d (running min)
        st_ref[4] = jnp.zeros((8, br), jnp.int32)  # cnt
        st_ref[5] = jnp.full((8, br), -1, jnp.int32)  # max pos
        for k in range(SLOTS_K):
            st_ref[6 + k] = jnp.full((8, br), -1, jnp.int32)

    # Bulk int8 -> int32 once per block; the per-char dynamic sublane slice
    # below must hit an int32 tile (CLAUDE.md Mosaic gotcha + v1 postmortem).
    tx32_ref[:, :] = text_ref[:, :].astype(jnp.int32)

    lens = len_ref[0:1, :]  # (1, BR)
    high = _high_const(m)
    peq_cols = [peq_ref[:, b : b + 1] for b in range(4)]  # (8, 1) each

    def body(jq, carry):
        # One dynamic row load per FOUR characters: the packed word already
        # holds them, and unrolling quadruples the vector work per loop
        # iteration (load-to-use and loop-bookkeeping stalls amortize 4x).
        row = tx32_ref[pl.ds(jq, 1), :]  # (1, BR) packed word
        for k in range(4):
            pv, mv, score, d, cnt, mx, *slots = carry  # each (8, BR)
            c = (row >> (2 * k)) & 3  # sign-extension safe: low 2 bits
            eq = jnp.zeros((8, br), jnp.int32)
            for b in range(4):
                eq = jnp.where(c == b, peq_cols[b], eq)
            xv = eq | mv
            xh = (((eq & pv) + pv) ^ pv) | eq
            ph = mv | ~(xh | pv)
            mh = pv & xh
            score = score + ((ph & high) != 0).astype(jnp.int32)
            score = score - ((mh & high) != 0).astype(jnp.int32)
            ph = ph << 1
            mh = mh << 1
            pv = mh | ~(xv | ph)
            mv = ph & xv
            j = l * cl + jq * 4 + k
            valid = j < lens  # (1, BR), broadcasts over the pattern sublanes
            improve = valid & (score < d)
            tie = valid & (score == d)
            d = jnp.where(improve, score, d)
            mx = jnp.where(improve | tie, j, mx)
            new_slots = []
            for kk in range(SLOTS_K):
                sk = slots[kk]
                sk = jnp.where(improve, j if kk == 0 else -1, sk)
                sk = jnp.where(tie & (cnt == kk), j, sk)
                new_slots.append(sk)
            cnt = jnp.where(improve, 1, jnp.where(tie, cnt + 1, cnt))
            carry = (pv, mv, score, d, cnt, mx, *new_slots)
        return carry

    init = tuple(st_ref[i] for i in range(_NST))
    fin = jax.lax.fori_loop(0, cl // 4, body, init)
    for i in range(_NST):
        st_ref[i] = fin[i]

    @pl.when(l == n_lchunks - 1)
    def _():
        # state sublane p -> output rows [base+0..base+6] for p in (0, 1)
        for p, base in ((0, 0), (1, 7)):
            out_ref[base + 0 : base + 1, :] = st_ref[3, p : p + 1, :]
            out_ref[base + 1 : base + 2, :] = st_ref[4, p : p + 1, :]
            out_ref[base + 2 : base + 3, :] = st_ref[5, p : p + 1, :]
            for k in range(SLOTS_K):
                out_ref[base + 3 + k : base + 4 + k, :] = st_ref[
                    6 + k, p : p + 1, :
                ]
        out_ref[14:15, :] = jnp.zeros((1, br), jnp.int32)
        out_ref[15:16, :] = jnp.zeros((1, br), jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("m", "l_total", "interpret")
)
def _adapter_scan_call(text, lens, peq_in, m: int, l_total: int,
                       interpret: bool = False):
    """text: (L/4, B) int8 2-bit packed; lens: (1, B) int32; peq_in: (8, 8)
    int32 -> (N_OUT, B) int32."""
    B = text.shape[1]
    cl = min(CHUNK_L, l_total)
    assert cl % 4 == 0, cl  # the DP loop unrolls one packed word (4 chars)
    n_lchunks = cdiv(l_total, cl)
    kernel = functools.partial(_kernel, m=m, cl=cl, n_lchunks=n_lchunks)
    return pl.pallas_call(
        kernel,
        grid=(B // BLOCK_READS, n_lchunks),
        in_specs=[
            pl.BlockSpec(
                (cl // 4, BLOCK_READS), lambda i, l: (l, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, BLOCK_READS), lambda i, l: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((8, 8), lambda i, l: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (N_OUT, BLOCK_READS), lambda i, l: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N_OUT, B), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((_NST, 8, BLOCK_READS), jnp.int32),
            pltpu.VMEM((cl // 4, BLOCK_READS), jnp.int32),
        ],
        interpret=interpret,
    )(text, lens, peq_in)


def _peq_input(peq2: np.ndarray) -> np.ndarray:
    """(5, 2) base-major int32 Peq -> (8, 8) pattern-major kernel input
    (row p = pattern p's Peq over base codes; two's-complement bits kept)."""
    out = np.zeros((8, 8), dtype=np.int32)
    out[:2, :5] = np.asarray(peq2, dtype=np.int32).T
    return out


def adapter_scan_tpu(
    codes: np.ndarray,
    lengths: np.ndarray,
    peq2: np.ndarray,
    m: int,
    interpret: bool = False,
    b_pad: int | None = None,
):
    """Host wrapper. codes: (B, L) uint8 strict codes; peq2: (5, 2) int32.

    Returns two dicts (fwd, rc), each with (B,) arrays d/cnt/max and
    (B, SLOTS_K) slots. When cnt > SLOTS_K the slots cover only the first
    SLOTS_K optimal ends (caller falls back for those reads). ``b_pad`` fixes
    the padded batch size so boundary chunks reuse compiled shapes.
    """
    out = np.asarray(
        adapter_scan_dispatch(
            codes, lengths, peq2, m, interpret=interpret, b_pad=b_pad
        )
    )
    return unpack_scan_out(out, codes.shape[0])


def pad_len(L: int) -> int:
    """Kernel text length for reads up to L chars (one compiled shape per
    bucket: small lengths round to 32, long ones to whole CHUNK_L chunks)."""
    return round_up(L, 32) if L <= CHUNK_L else round_up(L, CHUNK_L)


def adapter_scan_dispatch(
    codes: np.ndarray,
    lengths: np.ndarray,
    peq2: np.ndarray,
    m: int,
    interpret: bool = False,
    b_pad: int | None = None,
    mesh=None,
):
    """Async variant: returns the device output WITHOUT syncing, so callers
    can overlap host encoding with device compute. Convert with np.asarray
    and feed unpack_scan_out(out, B). With ``mesh`` (parallel/mesh.py), the
    read lanes are sharded over the mesh's data axis (b_pad must then be a
    multiple of n_data * BLOCK_READS)."""
    B, L = codes.shape
    l_total = pad_len(L)
    # 2-bit pack (4 chars/byte) to quarter the host->device transfer. Code 4
    # (pad/junk) maps to 'A' under the &3 — harmless for SUFFIX padding (the
    # j < len gate blocks recording, and polluted DP state after a read's end
    # never reaches a valid position), but WRONG for in-sequence junk chars:
    # callers must route reads containing junk to the exact mask fallback
    # (models/adapter.py does). SeqBuffer inputs pack natively instead
    # (io/fastq.py encode_packed) and call adapter_scan_dispatch_packed.
    cp = np.zeros((B, l_total), np.uint8)
    cp[:, :L] = codes
    cp &= 3
    pk = (
        cp[:, 0::4]
        | (cp[:, 1::4] << 2)
        | (cp[:, 2::4] << 4)
        | (cp[:, 3::4] << 6)
    )
    return adapter_scan_dispatch_packed(
        pk, lengths, peq2, m, l_total,
        interpret=interpret, b_pad=b_pad, mesh=mesh,
    )


def adapter_scan_dispatch_packed(
    pk: np.ndarray,
    lengths: np.ndarray,
    peq2: np.ndarray,
    m: int,
    l_total: int,
    interpret: bool = False,
    b_pad: int | None = None,
    mesh=None,
):
    """Dispatch from pre-packed rows: pk (B, l_total//4) uint8 row-major
    (char j of row i at byte j>>2, bits 2*(j&3))."""
    B = pk.shape[0]
    assert pk.shape[1] * 4 == l_total, (pk.shape, l_total)
    Bp = round_up(max(B, 1), BLOCK_READS) if b_pad is None else b_pad
    assert Bp % BLOCK_READS == 0 and Bp >= B, (Bp, B)
    text = full_fast((l_total // 4, Bp), 0, np.int8)
    text[:, :B] = pk.view(np.int8).T  # bit-pattern copy (kernel extracts &3)
    lens = np.zeros((1, Bp), np.int32)
    lens[0, :B] = lengths
    peq_in = _peq_input(peq2)
    if mesh is not None:
        from ..parallel.mesh import shard_adapter_scan

        return shard_adapter_scan(
            mesh, jnp.asarray(text), jnp.asarray(lens), jnp.asarray(peq_in),
            m, l_total, interpret=interpret,
        )
    return _adapter_scan_call(
        jnp.asarray(text),
        jnp.asarray(lens),
        jnp.asarray(peq_in),
        m,
        l_total,
        interpret=interpret,
    )


def unpack_scan_out(out: np.ndarray, B: int):
    """(N_OUT, B_pad) kernel output -> (fwd, rc) dicts."""
    out = out.reshape(N_OUT, -1)[:, :B]

    def unpack(base):
        return {
            "d": out[base],
            "cnt": out[base + 1],
            "max": out[base + 2],
            "slots": out[base + 3 : base + 3 + SLOTS_K].T.copy(),
        }

    return unpack(0), unpack(7)
