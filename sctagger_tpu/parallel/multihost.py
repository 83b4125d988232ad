"""Multi-host stage execution: shard inputs per host, reduce globals, merge
output parts (SURVEY.md §2.3 "Collectives", ROADMAP scale-out).

The reference is single-node (fork multiprocessing, scTagger.py:4); here the
same stages run on N hosts with byte-identical final output. Each host
processes a contiguous shard of the global record range (io/sharding.py keeps
global record ids equal to the reference's single-stream order), and the few
cross-host quantities — the stage-1 adapter-location histogram, alt-stage-2
whitelist count/first-occurrence vectors — are all-reduced through one of two
transports:

* ``jax``   — jax.distributed collectives over a global device mesh
              (psum/pmin/pmax riding ICI/DCN). Chosen automatically when
              jax.distributed is initialized with a process per host.
* ``fs``    — shared-filesystem exchange: atomic .npy drops + polling
              barrier. Works anywhere the Snakemake-style artifact contract
              works (the reference's own resume mechanism assumes a shared
              FS), and is the fallback when no coordinator is configured.

Determinism makes the fs transport safe to resume: every exchanged artifact
is a pure function of the inputs, so a leftover file from a crashed run with
the same inputs is byte-identical to what this run would write. The sync
directory is namespaced by a content key of (stage, inputs, params) so runs
with different inputs never collide.
"""

from __future__ import annotations

import os
import pathlib
import time

import numpy as np

_POLL_S = 0.05


def _timeout_s() -> float:
    return float(os.environ.get("SCTAG_SYNC_TIMEOUT", "600"))


_IDENTITY = {
    "sum": lambda dt: np.zeros((), dt),
    "min": lambda dt: np.array(np.iinfo(dt).max, dt)
    if np.issubdtype(dt, np.integer)
    else np.array(np.inf, dt),
    "max": lambda dt: np.array(np.iinfo(dt).min, dt)
    if np.issubdtype(dt, np.integer)
    else np.array(-np.inf, dt),
}

_NP_REDUCE = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def jax_processes_match(n_hosts: int) -> bool:
    """True iff jax.distributed is initialized with one process per host."""
    import sys as _sys

    if n_hosts <= 1 or "jax" not in _sys.modules:
        # jax never imported in this process => jax.distributed cannot be
        # initialized; don't pay the import (host-only stages skip jax)
        return False
    try:
        import jax

        return jax.process_count() == n_hosts
    except Exception:
        return False


class HostGroup:
    """Fixed group of N hosts executing one stage cooperatively.

    Collective calls must be issued in the same order on every host (tags are
    derived from a per-group sequence counter, like MPI communicators).
    """

    def __init__(
        self,
        host_id: int,
        n_hosts: int,
        sync_dir: str | os.PathLike,
        transport: str | None = None,
    ):
        assert 0 <= host_id < n_hosts, (host_id, n_hosts)
        self.host_id = host_id
        self.n_hosts = n_hosts
        self.sync_dir = pathlib.Path(sync_dir)
        if transport is None:
            transport = "jax" if jax_processes_match(n_hosts) else "fs"
        assert transport in ("jax", "fs"), transport
        self.transport = transport
        self._seq = 0
        if n_hosts > 1 and transport == "fs":
            self.sync_dir.mkdir(parents=True, exist_ok=True)

    # ---- collectives -------------------------------------------------------

    def allreduce(self, arr: np.ndarray, op: str = "sum") -> np.ndarray:
        """Elementwise all-reduce of one ndarray across hosts."""
        assert op in _NP_REDUCE, op
        if self.n_hosts == 1:
            return np.asarray(arr)
        self._seq += 1
        if self.transport == "jax":
            return self._jax_allreduce(np.asarray(arr), op)
        return self._fs_allreduce(np.asarray(arr), op, f"red{self._seq:05d}{op}")

    def allgather_scalar(self, value: int) -> np.ndarray:
        """Gather one int64 per host, ordered by host id."""
        one_hot = np.zeros(self.n_hosts, np.int64)
        one_hot[self.host_id] = int(value)
        return self.allreduce(one_hot, "sum")

    def barrier(self) -> None:
        if self.n_hosts == 1:
            return
        self._seq += 1
        if self.transport == "jax":
            self._jax_allreduce(np.zeros(1, np.int32), "sum")
            return
        tag = f"bar{self._seq:05d}"
        self._touch(self.sync_dir / f"{tag}.h{self.host_id}")
        for h in range(self.n_hosts):
            self._wait_for(self.sync_dir / f"{tag}.h{h}")

    # ---- fs transport ------------------------------------------------------

    @staticmethod
    def _touch(path: pathlib.Path) -> None:
        tmp = path.with_name(path.name + f".tmp{os.getpid()}")
        tmp.write_bytes(b"")
        os.replace(tmp, path)

    @staticmethod
    def _wait_for(path: pathlib.Path) -> None:
        deadline = time.monotonic() + _timeout_s()
        while not path.exists():
            if time.monotonic() > deadline:
                raise TimeoutError(f"multihost sync timeout waiting for {path}")
            time.sleep(_POLL_S)

    def _fs_allreduce(self, arr: np.ndarray, op: str, tag: str) -> np.ndarray:
        mine = self.sync_dir / f"{tag}.h{self.host_id}.npy"
        # np.save appends '.npy' when missing — give the tmp name the suffix
        tmp = mine.with_name(f"tmp{os.getpid()}." + mine.name)
        np.save(tmp, arr)
        os.replace(tmp, mine)
        out = None
        for h in range(self.n_hosts):
            p = self.sync_dir / f"{tag}.h{h}.npy"
            self._wait_for(p)
            part = np.load(p)
            out = part if out is None else _NP_REDUCE[op](out, part)
        return out

    # ---- jax transport -----------------------------------------------------

    def _jax_allreduce(self, arr: np.ndarray, op: str) -> np.ndarray:
        import jax

        if arr.dtype.itemsize == 8 and not jax.config.jax_enable_x64:
            # 64-bit identities/counts must not truncate to 32 bits (the
            # min identity would wrap to -1); scope x64 to this collective
            with jax.enable_x64():
                return self._jax_allreduce_impl(arr, op)
        return self._jax_allreduce_impl(arr, op)

    def _jax_allreduce_impl(self, arr: np.ndarray, op: str) -> np.ndarray:
        from .mesh import allreduce_processes

        return allreduce_processes(arr, op, _IDENTITY[op](arr.dtype))

    # ---- point-to-point byte blobs (shared FS, any transport) -----------
    # Small metadata handoffs (e.g. the BAM shard spill chain and the
    # variable-size stage-2 gather) always ride the sync dir: the output
    # part merge already requires a shared FS, and blob sizes are tiny
    # relative to the stage inputs.

    def put_bytes(self, tag: str, data: bytes) -> None:
        self.sync_dir.mkdir(parents=True, exist_ok=True)
        path = self.sync_dir / f"{tag}.blob"
        tmp = path.with_name(path.name + f".tmp{os.getpid()}")
        tmp.write_bytes(data)
        os.replace(tmp, path)

    def get_bytes(self, tag: str) -> bytes:
        path = self.sync_dir / f"{tag}.blob"
        self._wait_for(path)
        return path.read_bytes()

    def gather_bytes(self, tag: str, data: bytes) -> list[bytes] | None:
        """Gather one blob per host; host 0 returns them ordered by host id,
        other hosts return None."""
        self.put_bytes(f"{tag}.h{self.host_id}", data)
        if self.host_id != 0:
            return None
        return [self.get_bytes(f"{tag}.h{h}") for h in range(self.n_hosts)]

    # ---- output part merge ---------------------------------------------

    def part_path(self, outfile: str, host_id: int | None = None) -> str:
        h = self.host_id if host_id is None else host_id
        return f"{outfile}.h{h:04d}of{self.n_hosts}.part"

    def write_part_and_merge(self, outfile: str, text: str, open_out_fn) -> None:
        """Write this host's rendered rows; host 0 merges all parts into the
        final output through ``open_out_fn(outfile)`` (byte-identical to the
        single-host stream since shards are contiguous global-rid ranges)."""
        if self.n_hosts == 1:
            out = open_out_fn(outfile)
            out.write(text)
            self._close(out)
            return
        part = pathlib.Path(self.part_path(outfile))
        tmp = part.with_name(part.name + f".tmp{os.getpid()}")
        tmp.write_text(text)
        os.replace(tmp, part)
        self.barrier()  # all parts on disk
        if self.host_id == 0:
            out = open_out_fn(outfile)
            for h in range(self.n_hosts):
                p = pathlib.Path(self.part_path(outfile, h))
                out.write(p.read_text())
            self._close(out)
            for h in range(self.n_hosts):
                pathlib.Path(self.part_path(outfile, h)).unlink(missing_ok=True)

    @staticmethod
    def _close(out) -> None:
        import sys

        if out is not sys.stdout:
            out.close()


def make_host_group(args, stage: str, inputs: list[str], params: dict) -> HostGroup:
    """Build a HostGroup from the additive CLI flags (--host-id/--n-hosts).

    The sync dir is namespaced by a content key so different jobs sharing an
    outfile path never cross-talk; identical re-runs safely reuse leftovers
    (all exchanged artifacts are deterministic)."""
    n_hosts = getattr(args, "n_hosts", 1) or 1
    host_id = getattr(args, "host_id", 0) or 0
    if n_hosts > 1:
        assert args.outfile, "--n-hosts > 1 requires -o/--outfile (no stdout merge)"
    sync_dir = getattr(args, "sync_dir", None)
    if sync_dir is None:
        from ..pipeline.checkpoint import job_key

        key = job_key(stage, inputs, {**params, "n_hosts": n_hosts})
        base = args.outfile if args.outfile else stage
        sync_dir = f"{base}.sync-{key[:16]}"
    return HostGroup(host_id, n_hosts, sync_dir)
