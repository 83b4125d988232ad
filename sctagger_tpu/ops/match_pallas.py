"""Pallas TPU kernels for dense segment x whitelist infix edit distance.

This is the flagship compute path (BASELINE.json north-star: replaces the
reference's Python trie DFS, scTagger.py:526-716, with a dense all-pairs
bit-parallel DP on the VPU).

Layout decisions (TPU-first):
  * State arrays are (BP, BR): patterns on the sublane axis, reads (segments)
    on the lane axis. The per-character text code row (1, BR) then broadcasts
    along sublanes and the per-pattern Peq column (BP, 1) along lanes — both
    native VPU broadcasts, no transposes inside the hot loop.
  * Segments are stored position-major (Ls, R) so each DP step reads one
    contiguous row; Peq is stored pattern-major (P, 8) (columns 0..4 used,
    padded to 8 sublanes... transposed: row p = bitmasks of pattern p per
    character code).
  * Grid is (R/BR, P/BP) with the pattern axis innermost; the (1, BR) output
    block is revisited across the inner axis and min-accumulated in VMEM.

Padding: segment padding uses code 4 (matches nothing), which can never
lower an infix distance, so no validity masking is needed for the min pass.
Pattern-axis padding uses all-zero Peq (empty pattern ... distance stays m),
likewise harmless; callers slice the (P,) axis back. Read-axis padding rows
produce garbage mins that callers slice away.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

from ..utils import full_fast, round_up
from .myers import high_bit

DEF_BR = 1024  # reads per block (lanes); best of tools/sweep_blocks.py
DEF_BP = 256  # patterns per block (sublanes)

# High-bit score accumulation (DEFAULT ON; SCTAG_MATCH_HB=0 reverts): fuse
# the two per-char score carry updates into one masked-subtract + arithmetic
# shift — valid for m < 32 because the ph & mh high bits are mutually
# exclusive, so the difference is in {high, 0, -high} and >> (m-1) yields
# {1, 0, -1}. Measured +3.1% on the flagship bench shape with bit-identical
# output (MATCH_VARIANTS.json, 2026-08-20); _myers_hw_step falls back to the
# two-update form for m >= 32 or int16 words.
def _hb_default() -> bool:
    return os.environ.get("SCTAG_MATCH_HB", "1") == "1"


def _wrapped_const(value: int, wdt) -> jnp.ndarray:
    """Integer constant in word dtype ``wdt`` with two's-complement wrap
    (e.g. 1<<15 -> int16 -32768, the sign bit)."""
    npdt = np.dtype(wdt.dtype if hasattr(wdt, "dtype") else wdt)
    # Mask into the unsigned 64-bit range first: numpy 2 rejects negative
    # Python ints for unsigned dtypes (high_bit(32) == -2**31 would raise
    # OverflowError), while the masked value wraps to the same bit pattern.
    return jnp.asarray(np.array(value & ((1 << 64) - 1), np.uint64).astype(npdt))


def _myers_hw_step(pv, mv, score, eq, m: int, wdt=jnp.int32, hb: bool = False):
    high = _wrapped_const(high_bit(m), wdt)
    xv = eq | mv
    xh = (((eq & pv) + pv) ^ pv) | eq
    ph = mv | ~(xh | pv)
    mh = pv & xh
    if hb and m < 32 and wdt == jnp.int32:
        # fused carry update: ph/mh high bits are mutually exclusive
        score = score + (((ph & high) - (mh & high)) >> (m - 1))
    else:
        score = score + ((ph & high) != 0).astype(wdt)
        score = score - ((mh & high) != 0).astype(wdt)
    ph = ph << 1
    mh = mh << 1
    pv = mh | ~(xv | ph)
    mv = ph & xv
    return pv, mv, score


def _eq_from_row(c_row, peq_cols, bp, br, wdt=jnp.int32):
    """c_row: (1, BR) codes; peq_cols: list of 4 (BP, 1) columns -> (BP, BR)."""
    eq = jnp.zeros((bp, br), wdt)
    if wdt == jnp.int16:
        # Mosaic (as of jax 0.8) rejects the doubly-replicated i1 mask this
        # where() produces at 16-bit layouts ("Invalid relayout: ... replicated
        # in destination but not in source"); materializing the row to the
        # full block sidesteps it. Keep the int32 path untouched (its compiled
        # form is the production kernel).
        c_row = jnp.broadcast_to(c_row, (bp, br))
    for b in range(4):
        eq = jnp.where(c_row == b, peq_cols[b], eq)
    return eq


def _dp_sweep(
    seg32_ref, peq_ref, *, m: int, ls: int, w16: bool = False, ls_dyn=None,
    hb: bool = False,
):
    """Myers HW sweep over all ``ls`` text rows -> per-(pattern, read) best
    infix distance, (BP, BR) int32.

    ``w16`` runs the DP word in int16 — valid only for m <= 16: the m-bit
    vectors fit the halfword exactly, and Myers tolerates discarded carries
    above bit m-1 (only bits < m feed the score; carries propagate upward).
    Halves the VPU register footprint of the carried state.

    ``ls_dyn`` (traced scalar <= ls) stops the sweep at the block's real max
    segment length instead of the padded ls — rows past every segment's end
    are pad code 4 and can never lower a distance, so skipping them is exact
    (the ROADMAP per-block early-out experiment; trades the static-bound
    fori_loop for a dynamic-trip-count loop).
    """
    assert not w16 or m <= 16, m
    wdt = jnp.int16 if w16 else jnp.int32
    bp, br = peq_ref.shape[0], seg32_ref.shape[1]
    peq_cols = [peq_ref[:, b : b + 1].astype(wdt) for b in range(4)]  # (BP, 1)

    pv0 = jnp.full((bp, br), -1, wdt)
    mv0 = jnp.zeros((bp, br), wdt)
    s0 = jnp.full((bp, br), m, wdt)

    def body(j, carry):
        pv, mv, score, best = carry
        c_row = seg32_ref[pl.ds(j, 1), :].astype(wdt)  # (1, BR)
        eq = _eq_from_row(c_row, peq_cols, bp, br, wdt)
        pv, mv, score = _myers_hw_step(pv, mv, score, eq, m, wdt, hb=hb)
        return pv, mv, score, jnp.minimum(best, score)

    bound = ls if ls_dyn is None else jnp.minimum(ls_dyn, ls)
    _, _, _, best = jax.lax.fori_loop(0, bound, body, (pv0, mv0, s0, s0))
    return best.astype(jnp.int32)


def _match_min_kernel(
    seg_ref, peq_ref, out_ref, seg32_ref, *, m: int, ls: int, w16: bool = False
):
    seg32_ref[:, :] = seg_ref[:, :].astype(jnp.int32)
    best = _dp_sweep(seg32_ref, peq_ref, m=m, ls=ls, w16=w16)
    row_min = jnp.min(best, axis=0, keepdims=True)  # (1, BR)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[:, :] = row_min

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[:, :] = jnp.minimum(out_ref[:, :], row_min)


def _match_best_kernel(
    seg_ref, peq_ref, out_ref, seg32_ref, *, m: int, ls: int, w16: bool = False
):
    """Writes the full per-(pattern, read) best-distance block (pass 2)."""
    seg32_ref[:, :] = seg_ref[:, :].astype(jnp.int32)
    best = _dp_sweep(seg32_ref, peq_ref, m=m, ls=ls, w16=w16)
    out_ref[:, :] = jnp.minimum(best, 127).astype(jnp.int8)


TIES_K = 8  # in-kernel tie slots; overflow reads escalate host-side
BIG = 1 << 28


def _match_ties_kernel(
    seg_ref, peq_ref, tgt_ref, out_ref, seg32_ref, *, m: int, ls: int,
    w16: bool = False,
):
    """Per-read hit count + first-TIES_K hit pattern ids at the target
    distance, accumulated across the pattern grid axis (pass 2, fused).

    out rows: [0] total hit count, [1..TIES_K] slot pattern ids (BIG=empty).
    """
    bp, br = peq_ref.shape[0], seg_ref.shape[1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0:1, :] = jnp.zeros((1, br), jnp.int32)
        for t in range(TIES_K):
            out_ref[t + 1 : t + 2, :] = jnp.full((1, br), BIG, jnp.int32)

    seg32_ref[:, :] = seg_ref[:, :].astype(jnp.int32)
    best = _dp_sweep(seg32_ref, peq_ref, m=m, ls=ls, w16=w16)

    hits = best == tgt_ref[0:1, :]  # (BP, BR)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (bp, br), 0) + j * bp
    local = jnp.where(hits, p_iota, BIG)

    cnt = out_ref[0:1, :]
    slots = [out_ref[t + 1 : t + 2, :] for t in range(TIES_K)]
    ff = jnp.minimum(cnt, TIES_K)
    for _k in range(TIES_K):
        idx_k = jnp.min(local, axis=0, keepdims=True)  # (1, BR)
        can = (idx_k < BIG) & (ff < TIES_K)
        for t in range(TIES_K):
            slots[t] = jnp.where(can & (ff == t), idx_k, slots[t])
        ff = ff + can.astype(jnp.int32)
        local = jnp.where(local == idx_k, BIG, local)

    out_ref[0:1, :] = cnt + jnp.sum(hits.astype(jnp.int32), axis=0, keepdims=True)
    for t in range(TIES_K):
        out_ref[t + 1 : t + 2, :] = slots[t]


def _match_full_kernel(
    seg_ref, peq_ref, out_ref, seg32_ref, *, m: int, ls: int,
    w16: bool = False, hb: bool = False,
):
    """Single-sweep matcher: min distance + tie count + first-TIES_K tie
    pattern ids, all against the RUNNING min across pattern blocks
    (reset-on-improve — no separate target pass needed).

    out rows: [0] min distance, [1] tie count at that min,
              [2..TIES_K+1] tie slot pattern ids (BIG = empty).
    """
    bp, br = peq_ref.shape[0], seg_ref.shape[1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0:1, :] = jnp.full((1, br), m, jnp.int32)
        out_ref[1:2, :] = jnp.zeros((1, br), jnp.int32)
        for t in range(TIES_K):
            out_ref[t + 2 : t + 3, :] = jnp.full((1, br), BIG, jnp.int32)

    seg32_ref[:, :] = seg_ref[:, :].astype(jnp.int32)
    best = _dp_sweep(seg32_ref, peq_ref, m=m, ls=ls, w16=w16, hb=hb)

    d_old = out_ref[0:1, :]
    block_min = jnp.min(best, axis=0, keepdims=True)
    d_new = jnp.minimum(d_old, block_min)
    improved = block_min < d_old

    hits = best == d_new  # (BP, BR) vs broadcast row
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (bp, br), 0) + j * bp
    local = jnp.where(hits, p_iota, BIG)

    cnt = jnp.where(improved, 0, out_ref[1:2, :])
    slots = [
        jnp.where(improved, BIG, out_ref[t + 2 : t + 3, :])
        for t in range(TIES_K)
    ]
    ff = jnp.minimum(cnt, TIES_K)
    for _k in range(TIES_K):
        idx_k = jnp.min(local, axis=0, keepdims=True)
        can = (idx_k < BIG) & (ff < TIES_K)
        for t in range(TIES_K):
            slots[t] = jnp.where(can & (ff == t), idx_k, slots[t])
        ff = ff + can.astype(jnp.int32)
        local = jnp.where(local == idx_k, BIG, local)

    out_ref[0:1, :] = d_new
    out_ref[1:2, :] = cnt + jnp.sum(hits.astype(jnp.int32), axis=0, keepdims=True)
    for t in range(TIES_K):
        out_ref[t + 2 : t + 3, :] = slots[t]


def _match_full_dynls_kernel(
    seg_ref, peq_ref, mlen_ref, out_ref, seg32_ref, *, m: int, ls: int,
    hb: bool = False,
):
    """_match_full_kernel with the sweep stopped at the block's max segment
    length (mlen_ref = the full (1, n_read_blocks) SMEM array, indexed by
    the read-block program id: Mosaic rejects (1,1) SMEM blocks) — the
    ROADMAP early-out experiment."""
    bp, br = peq_ref.shape[0], seg_ref.shape[1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0:1, :] = jnp.full((1, br), m, jnp.int32)
        out_ref[1:2, :] = jnp.zeros((1, br), jnp.int32)
        for t in range(TIES_K):
            out_ref[t + 2 : t + 3, :] = jnp.full((1, br), BIG, jnp.int32)

    seg32_ref[:, :] = seg_ref[:, :].astype(jnp.int32)
    best = _dp_sweep(
        seg32_ref, peq_ref, m=m, ls=ls,
        ls_dyn=mlen_ref[0, pl.program_id(0)], hb=hb,
    )

    d_old = out_ref[0:1, :]
    block_min = jnp.min(best, axis=0, keepdims=True)
    d_new = jnp.minimum(d_old, block_min)
    improved = block_min < d_old

    hits = best == d_new
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (bp, br), 0) + j * bp
    local = jnp.where(hits, p_iota, BIG)

    cnt = jnp.where(improved, 0, out_ref[1:2, :])
    slots = [
        jnp.where(improved, BIG, out_ref[t + 2 : t + 3, :])
        for t in range(TIES_K)
    ]
    ff = jnp.minimum(cnt, TIES_K)
    for _k in range(TIES_K):
        idx_k = jnp.min(local, axis=0, keepdims=True)
        can = (idx_k < BIG) & (ff < TIES_K)
        for t in range(TIES_K):
            slots[t] = jnp.where(can & (ff == t), idx_k, slots[t])
        ff = ff + can.astype(jnp.int32)
        local = jnp.where(local == idx_k, BIG, local)

    out_ref[0:1, :] = d_new
    out_ref[1:2, :] = cnt + jnp.sum(hits.astype(jnp.int32), axis=0, keepdims=True)
    for t in range(TIES_K):
        out_ref[t + 2 : t + 3, :] = slots[t]


@functools.partial(
    jax.jit, static_argnames=("m", "br", "bp", "hb", "interpret")
)
def match_full_dynls_tpu(
    seg_T, peq_pm, maxlens, m: int, br: int = DEF_BR, bp: int = DEF_BP,
    hb: bool | None = None, interpret: bool = False,
):
    """match_full_tpu with a per-read-block dynamic sweep bound.

    maxlens: (1, R_pad // br) int32, the max real segment length per block
    (blocks are length-sorted upstream, so the bound is tight). Output is
    bit-identical to match_full_tpu by the pad-code argument in _dp_sweep.
    Auto-selected by the production matcher for RAGGED buckets (measured
    1.55x over the fixed sweep on lengths 16..64, MATCH_VARIANTS.json
    ragged rows; pure overhead on uniform-length buckets, -1.4%).
    """
    ls, r = seg_T.shape
    p = peq_pm.shape[0]
    grid = (r // br, p // bp)
    return pl.pallas_call(
        functools.partial(
            _match_full_dynls_kernel, m=m, ls=ls,
            hb=_hb_default() if hb is None else hb,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ls, br), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, r // br), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (TIES_K + 2, br), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((TIES_K + 2, r), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ls, br), jnp.int32)],
        interpret=interpret,
    )(seg_T, peq_pm, maxlens)


@functools.partial(
    jax.jit, static_argnames=("m", "br", "bp", "w16", "hb", "interpret")
)
def match_full_tpu(
    seg_T, peq_pm, m: int, br: int = DEF_BR, bp: int = DEF_BP,
    w16: bool = False, hb: bool | None = None, interpret: bool = False,
):
    """Single-sweep min + ties. seg_T: (Ls, R_pad) int8.

    Returns (TIES_K+2, R_pad) int32: [0] min dist, [1] tie count,
    [2..] tie slots. ``w16`` selects the int16 DP word (m <= 16 only).
    ``interpret`` runs the kernel in Pallas interpret mode (CPU tests of the
    sharded production path, parallel/mesh.py).
    """
    if w16 and not interpret and jax.default_backend() == "tpu":
        # the int16 path has NEVER compiled on v5e Mosaic (packed-i16
        # vector compares unsupported — ROADMAP.md w16 postmortem); fail
        # loudly instead of shipping an unbounded remote-compile attempt
        raise NotImplementedError(
            "w16=True cannot compile on this TPU (Mosaic lacks packed-i16 "
            "compares); use the default int32 path or interpret=True"
        )
    ls, r = seg_T.shape
    p = peq_pm.shape[0]
    grid = (r // br, p // bp)
    return pl.pallas_call(
        functools.partial(
            _match_full_kernel, m=m, ls=ls, w16=w16,
            hb=_hb_default() if hb is None else hb,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ls, br), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TIES_K + 2, br), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((TIES_K + 2, r), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ls, br), jnp.int32)],
        interpret=interpret,
    )(seg_T, peq_pm)


@functools.partial(jax.jit, static_argnames=("m", "br", "bp"))
def match_ties_tpu(seg_T, peq_pm, target, m: int, br: int = DEF_BR,
                   bp: int = DEF_BP):
    """seg_T: (Ls, R_pad) int8; target: (R_pad,) int32 min distances.

    Returns (TIES_K+1, R_pad) int32: row 0 = hit count, rows 1.. = first
    TIES_K hit pattern ids ascending (BIG where empty).
    """
    ls, r = seg_T.shape
    p = peq_pm.shape[0]
    grid = (r // br, p // bp)
    return pl.pallas_call(
        functools.partial(_match_ties_kernel, m=m, ls=ls),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ls, br), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, br), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TIES_K + 1, br), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((TIES_K + 1, r), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ls, br), jnp.int32)],
    )(seg_T, peq_pm, target.reshape(1, r))


def prep_peq_cols(peq_5p: np.ndarray, bp: int = DEF_BP) -> np.ndarray:
    """(5, P) Peq -> pattern-major (P_pad, 8) int32 for the kernels."""
    P = peq_5p.shape[1]
    out = np.zeros((round_up(max(P, 1), bp), 8), dtype=np.int32)
    out[:P, :5] = peq_5p.T
    return out


def prep_segs_T(
    seg_codes: np.ndarray, ls: int, br: int = DEF_BR, r_pad: int | None = None
) -> np.ndarray:
    """(R, L) uint8 codes -> position-major (ls, R_pad) int32, pad code 4.

    ``r_pad`` fixes the padded read count (e.g. the stage chunk size) so every
    chunk reuses one compiled kernel shape; defaults to rounding up to br.
    """
    R = seg_codes.shape[0]
    rp = round_up(max(R, 1), br) if r_pad is None else r_pad
    assert rp % br == 0 and rp >= R, (rp, br, R)
    out = full_fast((ls, rp), 4, np.int8)
    # assignment casts uint8->int8 during the copy (values are 0..4): no
    # intermediate .astype allocation, writes land in warm calloc pages
    out[: min(ls, seg_codes.shape[1]), :R] = seg_codes.T[:ls]
    return out


@functools.partial(jax.jit, static_argnames=("m", "br", "bp"))
def match_min_tpu(seg_T, peq_pm, m: int, br: int = DEF_BR, bp: int = DEF_BP):
    """Min infix distance per segment over all patterns.

    seg_T: (Ls, R_pad) int32 position-major codes (R_pad % br == 0).
    peq_pm: (P_pad, 8) int32 pattern-major Peq (P_pad % bp == 0).
    Returns (1, R_pad) int32.
    """
    ls, r = seg_T.shape
    p = peq_pm.shape[0]
    grid = (r // br, p // bp)
    return pl.pallas_call(
        functools.partial(_match_min_kernel, m=m, ls=ls),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ls, br), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, br), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, r), jnp.int32),
        scratch_shapes=[pltpu.VMEM((ls, br), jnp.int32)],
    )(seg_T, peq_pm)


@functools.partial(jax.jit, static_argnames=("m", "br", "bp"))
def match_best_tpu(seg_T, peq_pm, m: int, br: int = DEF_BR, bp: int = DEF_BP):
    """Full best-distance matrix, transposed: (P_pad, R_pad) int8."""
    ls, r = seg_T.shape
    p = peq_pm.shape[0]
    grid = (r // br, p // bp)
    return pl.pallas_call(
        functools.partial(_match_best_kernel, m=m, ls=ls),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ls, br), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, br), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, r), jnp.int8),
        scratch_shapes=[pltpu.VMEM((ls, br), jnp.int32)],
    )(seg_T, peq_pm)
