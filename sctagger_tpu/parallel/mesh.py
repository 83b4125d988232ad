"""Device mesh, shardings, and collectives (multi-chip / multi-host scaling).

The reference's only parallel backend is single-node fork multiprocessing
(SURVEY.md §2.3). Here every strategy is a first-class jax.sharding layout
over a 2-D ('data', 'model') mesh:

  data  axis : long reads / segments (DP — the reference's read-chunk imap)
  model axis : whitelist patterns   (TP analog of its prefix-keyspace shards)

Per-device partial results merge with XLA collectives riding ICI:
  * stage 3: per-pattern-shard min distances -> lax.pmin over 'model';
  * stage 2: per-shard barcode count vectors -> lax.psum;
  * stage 1: per-shard adapter-location histograms -> lax.psum.

Pipeline parallelism is host<->device streaming overlap (chunked dispatch in
the stage drivers), and sequence parallelism lives INSIDE the kernels (the
text-position scan axis) — per SURVEY.md §2.3 neither needs cross-chip
communication for this workload.

Multi-host bootstrap: call `init_distributed()` (jax.distributed.initialize)
before building the mesh; each host then streams its own input shard
(io layer) while meshes/collectives span all hosts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.myers import match_block_min


def init_distributed(**kwargs) -> None:
    """Multi-host bootstrap (no-op if single-process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    assert n <= len(devs), (n, len(devs))
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.array(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def dist_match_min(mesh: Mesh, seg_T, peq, m: int):
    """Sharded stage-3 pass 1: (Ls, R) codes x (5, P) Peq -> (R,) min dists.

    Reads sharded over 'data', patterns over 'model'; per-device dense Myers
    block, then a pmin collective over the pattern axis. Shapes must divide
    the mesh axes.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, "data"), P(None, "model")),
        out_specs=P("data"),
        check_vma=False,
    )
    def step(seg_local, peq_local):
        d = match_block_min(seg_local, peq_local, m)  # (R_local,)
        return jax.lax.pmin(d, "model")

    return step(seg_T, peq)


def dist_count_merge(mesh: Mesh, partial_counts):
    """Stage-2 collective: per-device (K,) count vectors -> global sums.

    partial_counts: (n_data_shards, K) array laid out over 'data'."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data", None),),
        out_specs=P(None, None),
        check_vma=False,
    )
    def step(c):
        return jax.lax.psum(c, "data")

    return step(partial_counts)[0]


def dist_histogram(mesh: Mesh, values, num_bins: int):
    """Stage-1 collective: location histogram merged over the data axis.

    values: (n_data_shards, M) int32 bin ids in [0, num_bins) (use an
    out-of-range id for padding slots)."""

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data", None),),
        out_specs=P(None),
        check_vma=False,
    )
    def step(v):
        ids = v.reshape(-1)
        in_range = ((ids >= 0) & (ids < num_bins)).astype(jnp.int32)
        hist = jnp.zeros((num_bins,), jnp.int32).at[ids].add(
            in_range, mode="drop"
        )
        return jax.lax.psum(hist, "data")

    return step(values)
