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

Layout: reads tiled as (8, 128) vregs; text is position-major int8
(L, R/128, 128); grid = (read_blocks, L_chunks) with the L axis innermost so
the DP state lives in scratch across chunks (TPU grids execute sequentially).
Validity (j < read_length) gates every hit so batch padding can't fabricate
tie positions (a never-matching pad char CAN tie the running min).
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
BLOCK_READS = 1024  # 8 sublane groups x 128 lanes
_GRP = BLOCK_READS // 128
_NST = 5 + SLOTS_K  # scratch rows per pattern: pv, mv, score, cnt, mx, slots


def _select_eq(c, peq_row):
    """c: (8,128) int32 codes; peq_row: list of 4 python ints -> (8,128)."""
    eq = jnp.zeros_like(c)
    for b in range(4):
        eq = jnp.where(c == b, jnp.int32(peq_row[b]), eq)
    return eq


def _kernel(
    text_ref,  # (CL, GRP, 128) int8
    len_ref,  # (GRP, 128) int32
    out_ref,  # (N_OUT, GRP, 128) int32
    st_ref,  # scratch (2, _NST, 8, 128) int32
    *,
    peqs,  # [[int x4], [int x4]]
    m: int,
    cl: int,
    n_lchunks: int,
):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        for p in range(2):
            st_ref[p, 0] = jnp.full((8, 128), -1, jnp.int32)  # pv
            st_ref[p, 1] = jnp.zeros((8, 128), jnp.int32)  # mv
            st_ref[p, 2] = jnp.full((8, 128), m, jnp.int32)  # score
            st_ref[p, 3] = jnp.zeros((8, 128), jnp.int32)  # cnt
            st_ref[p, 4] = jnp.full((8, 128), -1, jnp.int32)  # max pos
            for k in range(SLOTS_K):
                st_ref[p, 5 + k] = jnp.full((8, 128), -1, jnp.int32)
        out_ref[0] = jnp.full((8, 128), m, jnp.int32)  # running min d1
        out_ref[7] = jnp.full((8, 128), m, jnp.int32)  # running min d2

    lens = len_ref[:, :]
    high = jnp.int32(high_bit(m))

    def body(jj, carry):
        s1, s2 = carry
        c = text_ref[jj].astype(jnp.int32)
        j = l * cl + jj
        valid = j < lens
        out = []
        for p, st in ((0, s1), (1, s2)):
            pv, mv, score, d, cnt, mx, *slots = st
            eq = _select_eq(c, peqs[p])
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
            improve = valid & (score < d)
            tie = valid & (score == d)
            d = jnp.where(improve, score, d)
            mx = jnp.where(improve | tie, j, mx)
            new_slots = []
            for k in range(SLOTS_K):
                sk = slots[k]
                sk = jnp.where(improve, j if k == 0 else -1, sk)
                sk = jnp.where(tie & (cnt == k), j, sk)
                new_slots.append(sk)
            cnt = jnp.where(improve, 1, jnp.where(tie, cnt + 1, cnt))
            out.append((pv, mv, score, d, cnt, mx, *new_slots))
        return tuple(out)

    def load(p, drow):
        return (
            st_ref[p, 0], st_ref[p, 1], st_ref[p, 2], out_ref[drow],
            st_ref[p, 3], st_ref[p, 4],
            *[st_ref[p, 5 + k] for k in range(SLOTS_K)],
        )

    s1, s2 = jax.lax.fori_loop(0, cl, body, (load(0, 0), load(1, 7)))

    for p, st, drow in ((0, s1, 0), (1, s2, 7)):
        pv, mv, score, d, cnt, mx, *slots = st
        st_ref[p, 0] = pv
        st_ref[p, 1] = mv
        st_ref[p, 2] = score
        out_ref[drow] = d
        st_ref[p, 3] = cnt
        st_ref[p, 4] = mx
        for k in range(SLOTS_K):
            st_ref[p, 5 + k] = slots[k]

    @pl.when(l == n_lchunks - 1)
    def _():
        for p, base in ((0, 0), (1, 7)):
            out_ref[base + 1] = st_ref[p, 3]
            out_ref[base + 2] = st_ref[p, 4]
            for k in range(SLOTS_K):
                out_ref[base + 3 + k] = st_ref[p, 5 + k]
        out_ref[14] = jnp.zeros((8, 128), jnp.int32)
        out_ref[15] = jnp.zeros((8, 128), jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("m", "l_total", "peq_tuple", "interpret")
)
def _adapter_scan_call(text, lens, m: int, l_total: int, peq_tuple,
                       interpret: bool = False):
    """text: (L, G, 128) int8; lens: (G, 128) int32 -> (N_OUT, G, 128) int32."""
    G = text.shape[1]
    peq2 = np.array(peq_tuple, dtype=np.int64).reshape(5, 2)
    peqs = [[int(peq2[b, p]) for b in range(4)] for p in range(2)]
    cl = min(CHUNK_L, l_total)
    n_lchunks = cdiv(l_total, cl)
    kernel = functools.partial(
        _kernel, peqs=peqs, m=m, cl=cl, n_lchunks=n_lchunks
    )
    return pl.pallas_call(
        kernel,
        grid=(G // _GRP, n_lchunks),
        in_specs=[
            pl.BlockSpec(
                (cl, _GRP, 128), lambda i, l: (l, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_GRP, 128), lambda i, l: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (N_OUT, _GRP, 128), lambda i, l: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N_OUT, G, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, _NST, 8, 128), jnp.int32)],
        interpret=interpret,
    )(text, lens)


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
    read tiles are sharded over the mesh's data axis (b_pad must then be a
    multiple of n_data * BLOCK_READS)."""
    B, L = codes.shape
    l_total = round_up(L, 32) if L <= CHUNK_L else round_up(L, CHUNK_L)
    Bp = round_up(max(B, 1), BLOCK_READS) if b_pad is None else b_pad
    assert Bp % BLOCK_READS == 0 and Bp >= B, (Bp, B)
    text = full_fast((l_total, Bp), 4, np.int8)
    text[:L, :B] = codes.T  # cast during copy; no intermediate .astype
    text = text.reshape(l_total, Bp // 128, 128)
    lens = np.zeros((Bp,), np.int32)
    lens[:B] = lengths
    lens = lens.reshape(Bp // 128, 128)
    peq_tuple = tuple(int(x) for x in np.asarray(peq2).reshape(-1))
    if mesh is not None:
        from ..parallel.mesh import shard_adapter_scan

        return shard_adapter_scan(
            mesh, jnp.asarray(text), jnp.asarray(lens), m, l_total, peq_tuple,
            interpret=interpret,
        )
    return _adapter_scan_call(
        jnp.asarray(text),
        jnp.asarray(lens),
        m,
        l_total,
        peq_tuple,
        interpret=interpret,
    )


def unpack_scan_out(out: np.ndarray, B: int):
    """(N_OUT, G, 128) or (N_OUT, Bp) kernel output -> (fwd, rc) dicts."""
    out = out.reshape(N_OUT, -1)[:, :B]

    def unpack(base):
        return {
            "d": out[base],
            "cnt": out[base + 1],
            "max": out[base + 2],
            "slots": out[base + 3 : base + 3 + SLOTS_K].T.copy(),
        }

    return unpack(0), unpack(7)
