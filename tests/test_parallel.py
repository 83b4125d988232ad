"""Multi-device (8 virtual CPU devices) sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sctagger_tpu.core import LENIENT_TABLE, encode_seqs
from sctagger_tpu.ops import build_peq_multi, match_block_min
from sctagger_tpu.parallel import (
    dist_count_merge,
    dist_histogram,
    dist_match_min,
    make_mesh,
)

from oracle import random_dna


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)


def test_dist_match_min_matches_single_device():
    rng = np.random.default_rng(2)
    barcodes = [random_dna(rng, 16) for _ in range(32)]
    segs = [random_dna(rng, 24) for _ in range(64)]
    for r in range(0, 64, 3):  # plant some matches
        segs[r] = segs[r][:4] + barcodes[r % 32] + segs[r][4:]
    seg_codes, _ = encode_seqs(segs, pad_to=48, table=LENIENT_TABLE)
    peq = build_peq_multi(encode_seqs(barcodes, pad_to=16, table=LENIENT_TABLE)[0])
    seg_T = jnp.asarray(seg_codes.astype(np.int32).T)
    peq_j = jnp.asarray(peq)

    mesh = make_mesh(8, model_parallel=2)
    got = np.asarray(dist_match_min(mesh, seg_T, peq_j, 16))
    ref = np.asarray(match_block_min(seg_T, peq_j, 16))
    np.testing.assert_array_equal(got, ref)


def test_dist_count_merge():
    mesh = make_mesh(8, model_parallel=2)
    parts = np.arange(4 * 10, dtype=np.int32).reshape(4, 10)
    got = np.asarray(dist_count_merge(mesh, jnp.asarray(parts)))
    np.testing.assert_array_equal(got, parts.sum(axis=0))


def test_dist_histogram():
    mesh = make_mesh(8, model_parallel=1)
    rng = np.random.default_rng(0)
    vals = rng.integers(-1, 12, size=(8, 50)).astype(np.int32)
    got = np.asarray(dist_histogram(mesh, jnp.asarray(vals), num_bins=10))
    flat = vals.reshape(-1)
    exp = np.bincount(flat[(flat >= 0) & (flat < 10)], minlength=10)
    np.testing.assert_array_equal(got, exp)
