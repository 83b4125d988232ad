"""Pallas adapter-scan kernel (interpret mode) vs the jnp mask path."""

import os

import numpy as np

from sctagger_tpu.core import STRICT_TABLE, encode_seqs, encode_str, rev_compl
from sctagger_tpu.models.adapter import _hw_block
from sctagger_tpu.ops.adapter_pallas import SLOTS_K, adapter_scan_tpu
from sctagger_tpu.ops.myers import build_peq_multi

import jax.numpy as jnp

from oracle import mutate, random_dna

# compiled on hardware under SCTAG_TEST_TPU=1 (tools/tpu_suite.py)
INTERP = not bool(os.environ.get("SCTAG_TEST_TPU"))

ADAPTER = "CTACACGACGCTCTTCCGATCT"


def _expected(texts):
    m = len(ADAPTER)
    a2 = rev_compl(ADAPTER)
    peq2 = build_peq_multi(
        np.stack([encode_str(ADAPTER), encode_str(a2)])
    )
    L = max(max((len(t) for t in texts), default=1), 1)
    codes, lens = encode_seqs(texts, pad_to=L)
    d, mask = _hw_block(
        jnp.asarray(codes.astype(np.int32).T),
        jnp.asarray(peq2),
        jnp.asarray(lens.astype(np.int32)),
        m,
    )
    return codes, lens, peq2, np.asarray(d), np.asarray(mask)


def test_adapter_kernel_matches_jnp():
    rng = np.random.default_rng(50)
    texts = []
    for i in range(40):
        n = int(rng.integers(30, 700))
        t = random_dna(rng, n)
        r = rng.random()
        if r < 0.4:
            pos = int(rng.integers(0, 25))
            t = t[:pos] + mutate(rng, ADAPTER, int(rng.integers(0, 4))) + t[pos:]
        elif r < 0.8:
            pos = max(0, n - int(rng.integers(5, 30)))
            t = t[:pos] + mutate(rng, rev_compl(ADAPTER), int(rng.integers(0, 4))) + t[pos:]
        if i == 0:
            t = "A" * 40  # degenerate homopolymer read
        texts.append(t)
    texts.append("")  # empty read
    # NOTE: reads with in-sequence junk ('N') are OUTSIDE the packed kernel's
    # contract — models/adapter.scan_adapters routes them to the mask
    # fallback (covered by test_scan_kernel_path.py).

    codes, lens, peq2, d_ref, mask_ref = _expected(texts)
    fwd, rc = adapter_scan_tpu(codes, lens, peq2, len(ADAPTER), interpret=INTERP)

    for p, got in ((0, fwd), (1, rc)):
        np.testing.assert_array_equal(got["d"], np.minimum(d_ref[:, p], 22))
        for b in range(len(texts)):
            ends = np.flatnonzero(mask_ref[:, b, p])
            assert got["cnt"][b] == min(len(ends), got["cnt"][b]) or True
            # count is exact (not clipped) in the kernel
            assert got["cnt"][b] == len(ends), (b, p, ends, got["cnt"][b])
            if len(ends):
                k = min(SLOTS_K, len(ends))
                np.testing.assert_array_equal(got["slots"][b][:k], ends[:k])
                if len(ends) <= SLOTS_K:
                    # max optimal end = last slot (the mx row was removed;
                    # overflow reads recompute via the mask fallback)
                    assert got["slots"][b][len(ends) - 1] == ends[-1]


def test_adapter_kernel_multi_chunk_state():
    """Reads long enough to span several 512-char grid chunks."""
    rng = np.random.default_rng(51)
    texts = []
    for _ in range(8):
        t = random_dna(rng, int(rng.integers(1200, 2000)))
        pos = int(rng.integers(600, 1100))  # adapter in a middle chunk
        t = t[:pos] + ADAPTER + t[pos:]
        texts.append(t)
    codes, lens, peq2, d_ref, mask_ref = _expected(texts)
    fwd, rc = adapter_scan_tpu(codes, lens, peq2, len(ADAPTER), interpret=INTERP)
    np.testing.assert_array_equal(fwd["d"], d_ref[:, 0])
    for b in range(len(texts)):
        ends = np.flatnonzero(mask_ref[:, b, 0])
        np.testing.assert_array_equal(
            fwd["slots"][b][: min(SLOTS_K, len(ends))], ends[: SLOTS_K]
        )


def test_unpack_packed_rows_sign_bit():
    """16-bit packed output rows: slots >= 32768 set the int32 sign bit via
    s<<16; the unpack must recover them exactly (n_out_for packs whenever
    l_total <= 0xffff, so positions up to 65535 are representable)."""
    from sctagger_tpu.ops.adapter_pallas import (
        BLOCK_LANES, GROUPS, n_out_for, unpack_scan_out,
    )

    assert n_out_for(65535) == 8 and n_out_for(65536) == 16
    rng = np.random.default_rng(3)
    B = GROUPS * BLOCK_LANES  # one block
    d = rng.integers(0, 23, B).astype(np.int32)
    cnt = rng.integers(0, 255, B).astype(np.int32)
    slots = rng.integers(0, 65536, (B, 4)).astype(np.int32)
    d2 = rng.integers(0, 23, B).astype(np.int32)
    cnt2 = rng.integers(0, 255, B).astype(np.int32)
    slots2 = rng.integers(0, 65536, (B, 4)).astype(np.int32)

    def pack(dd, cc, ss):
        return [
            dd | (cc << 16),
            ss[:, 0] | (ss[:, 1] << 16),
            ss[:, 2] | (ss[:, 3] << 16),
        ]

    rows = np.stack(
        pack(d, cnt, slots) + pack(d2, cnt2, slots2)
        + [np.zeros(B, np.int32)] * 2
    )
    # read-order -> kernel layout (read r = (blk, g, lane); one block here)
    out = rows.reshape(8, GROUPS, BLOCK_LANES)
    fwd, rc = unpack_scan_out(out, B)
    np.testing.assert_array_equal(fwd["d"], d)
    np.testing.assert_array_equal(fwd["cnt"], cnt)
    np.testing.assert_array_equal(fwd["slots"], slots)
    np.testing.assert_array_equal(rc["d"], d2)
    np.testing.assert_array_equal(rc["cnt"], cnt2)
    np.testing.assert_array_equal(rc["slots"], slots2)
