"""TSV readers/writers with byte-exact reference schemas.

Schemas (SURVEY.md §2 #10/#22):
  stage-1 LR segments : rname \t dist \t loc \t segment
  stage-2 whitelist   : barcode \t count
  stage-3 matches     : name \t e \t n_bids \t seg \t bc1,bc2,...
"""

from __future__ import annotations

import gzip
import sys


def open_maybe_gz(path: str, mode: str = "rt"):
    """Open for reading; gzip iff path ends with .gz (reference convention)."""
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode.replace("t", "") or "r")


def open_out(path: str | None, force_gzip: bool):
    """Output handle per reference conventions.

    force_gzip=True: gzip whenever a path is given (extract_lr_bc,
    extract_sr_bc, extract_sr_bc_from_lr — scTagger.py:377,504,839).
    force_gzip=False: gzip only if the path ends with 'gz' (match_trie —
    scTagger.py:770-774).
    """
    if path is None:
        return sys.stdout
    if force_gzip or path.endswith("gz"):
        # level 4: ~5x faster than the Python-default level 9 at ~5% larger
        # output; the DECOMPRESSED bytes (what parity compares, and what the
        # reference's downstream consumers read) are identical either way
        return gzip.open(path, "wt+", compresslevel=4)
    return open(path, "w+")


def write_lr_tsv_gz_native(path, rnames, seqs, dist, loc, s, e, valid) -> bool:
    """Stage-1 TSV via the native formatter+gzip writer (one C pass).

    ``seqs`` must expose ``row_ptrs()`` (SeqBuffer / ChainSeqBuffer); the
    Python-slice math of ``seq[s:e or None]`` (scTagger.py:317-320) is
    vectorized here into clamped per-row (ptr, len) pairs. Returns False when
    the native path is unavailable (list[str] seqs, non-latin-1 names, lib
    build failure) — callers fall back to the Python row writer.
    """
    import ctypes

    import numpy as np

    row_ptrs = getattr(seqs, "row_ptrs", None)
    if row_ptrs is None:
        return False
    try:
        from ..native import build as native_build

        lib = native_build.load()
    except Exception:
        return False
    n = min(len(rnames), len(seqs))
    try:
        blob = ("\n".join(rnames[:n]) + "\n").encode("latin-1") if n else b""
    except UnicodeEncodeError:
        return False
    base, L = row_ptrs()
    base = np.ascontiguousarray(base[:n], np.int64)
    L = np.ascontiguousarray(L[:n], np.int64)
    s = np.asarray(s[:n], np.int64)
    e = np.asarray(e[:n], np.int64)
    # Python slice semantics of seq[s:e or None]
    sn = np.clip(np.where(s < 0, s + L, s), 0, L)
    ee = np.where(e == 0, L, e)  # `e or None` -> slice to the end
    en = np.clip(np.where(ee < 0, ee + L, ee), 0, L)
    seg_len = np.ascontiguousarray(np.maximum(0, en - sn))
    seg_ptr = np.ascontiguousarray((base + sn).astype(np.uint64))
    dist64 = np.ascontiguousarray(dist[:n], np.int64)
    loc64 = np.ascontiguousarray(loc[:n], np.int64)
    v8 = np.ascontiguousarray(valid[:n], np.uint8)
    err = ctypes.c_char_p()
    rc = lib.sctag_write_lr_tsv_gz(
        path.encode(), blob, len(blob), n,
        dist64.ctypes.data, loc64.ctypes.data, v8.ctypes.data,
        seg_ptr.ctypes.data, seg_len.ctypes.data, 4, ctypes.byref(err),
    )
    if rc != 0:
        msg = err.value.decode() if err.value else "unknown error"
        lib.sctag_free(err)
        raise OSError(f"{path}: {msg}")
    return True


def write_match_tsv_native(path, names, segs, barcodes, result) -> bool:
    """match_trie TSV via the native formatter/writer (one C pass).

    Mirrors stages.match_trie._render_rows (reference scTagger.py:777-790):
    matched rows only, ascending rid, ties joined by ',' with pattern id
    p = 2*bid + fwd printing rev_compl(bc) for even p. gzip iff the path ends
    with 'gz' (match_trie convention). Returns False when unavailable
    (list[str] segments, non-latin-1 names, lib load failure).
    """
    import ctypes

    import numpy as np

    from ..core.packing import _REV_COMPL_BYTES

    buf = getattr(segs, "buf", None)
    offs = getattr(segs, "offs", None)
    if buf is None or offs is None:
        return False
    try:
        from ..native import build as native_build

        lib = native_build.load()
    except Exception:
        return False
    rids = np.ascontiguousarray(result.rids, np.int64)
    m = rids.size
    try:
        blob = (
            ("\n".join([names[r] for r in rids.tolist()]) + "\n").encode(
                "latin-1"
            )
            if m
            else b""
        )
    except UnicodeEncodeError:
        return False

    # pattern-id-indexed print blob: row p=2*bid is the revcomp, p=2*bid+1
    # the forward barcode (matcher pattern order, models/matcher.py:85-92)
    bl = len(barcodes[0]) if barcodes else 0
    fwd = np.frombuffer(
        "".join(barcodes).encode("latin-1"), dtype=np.uint8
    ).reshape(len(barcodes), bl) if barcodes else np.zeros((0, 0), np.uint8)
    bc2 = np.zeros((2 * len(barcodes), bl), np.uint8)
    bc2[1::2] = fwd
    bc2[0::2] = _REV_COMPL_BYTES[fwd][:, ::-1]
    bc_blob = bc2.tobytes()

    # flatten tie lists (slots + rare overflow rows) into offs/flat arrays
    cnt = np.ascontiguousarray(result.tie_counts, np.int64)
    K = result.tie_slots.shape[1]
    tie_offs = np.zeros(m + 1, np.int64)
    np.cumsum(cnt, out=tie_offs[1:])
    flat = np.zeros(int(tie_offs[-1]), np.int64)
    in_slot = np.minimum(cnt, K)
    mask = np.arange(K)[None, :] < in_slot[:, None]
    pos = (tie_offs[:-1, None] + np.arange(K)[None, :])[mask]
    flat[pos] = result.tie_slots[mask]
    for i in np.flatnonzero(cnt > K):
        flat[tie_offs[i] : tie_offs[i + 1]] = result.overflow[int(rids[i])]

    dist64 = np.ascontiguousarray(result.dists, np.int64)
    offs64 = np.ascontiguousarray(offs, np.int64)
    err = ctypes.c_char_p()
    rc = lib.sctag_write_match_tsv(
        path.encode(), int(path.endswith("gz")), 4,
        blob, len(blob),
        buf.ctypes.data, offs64.ctypes.data,
        rids.ctypes.data, m, dist64.ctypes.data,
        tie_offs.ctypes.data, flat.ctypes.data,
        bc_blob, bl, ctypes.byref(err),
    )
    if rc != 0:
        msg = err.value.decode() if err.value else "unknown error"
        lib.sctag_free(err)
        raise OSError(f"{path}: {msg}")
    return True


def read_lr_segments_tsv(path: str):
    """Stage-1 output -> (names, dists, locs, segments) parallel columns.

    All columns as raw strings; callers interpret. Mirrors both consumers:
    match_trie keeps cols 0 and 3 of every row (scTagger.py:602-628);
    extract_sr_bc_from_lr reads cols 2 and 3 and skips loc=='NA'
    (scTagger.py:812-826).

    Uses the native C++ parser when available: names/dists/locs come back as
    list[str] (one C-level split each), segments as a SeqBuffer (flat bytes +
    offsets — no per-row string materialization for the match hot path).
    Falls back to the Python loop (also the test oracle) on any failure.
    """
    try:
        return _read_lr_segments_native(path)
    except Exception:
        return read_lr_segments_tsv_py(path)


def read_lr_segments_tsv_py(path: str):
    names, dists, locs, segs = [], [], [], []
    with open_maybe_gz(path) as f:
        for line in f:
            c = line.rstrip("\n").split("\t")
            names.append(c[0])
            dists.append(c[1])
            locs.append(c[2])
            segs.append(c[3])
    return names, dists, locs, segs


def _read_lr_segments_native(path: str):
    import ctypes

    import numpy as np

    from ..native import build as native_build
    from .fastq import SeqBuffer

    lib = native_build.load()
    c0 = ctypes.c_char_p()
    c1 = ctypes.c_char_p()
    c2 = ctypes.c_char_p()
    l0 = ctypes.c_int64()
    l1 = ctypes.c_int64()
    l2 = ctypes.c_int64()
    seg_buf = ctypes.c_char_p()
    seg_offs = ctypes.POINTER(ctypes.c_int64)()
    n_rows = ctypes.c_int64()
    err = ctypes.c_char_p()
    rc = lib.sctag_read_lr_tsv(
        path.encode(),
        ctypes.byref(c0), ctypes.byref(l0),
        ctypes.byref(c1), ctypes.byref(l1),
        ctypes.byref(c2), ctypes.byref(l2),
        ctypes.byref(seg_buf), ctypes.byref(seg_offs), ctypes.byref(n_rows),
        ctypes.byref(err),
    )
    if rc != 0:
        msg = err.value.decode() if err.value else "unknown error"
        lib.sctag_free(err)
        raise OSError(f"{path}: {msg}")
    try:
        def col(buf, ln):
            b = ctypes.string_at(buf, ln.value)
            return b.decode("latin-1").split("\n")[:-1] if b else []

        names, dists, locs = col(c0, l0), col(c1, l1), col(c2, l2)
        n = n_rows.value
        sz = int(seg_offs[n])
        # PyBytes-backed read-only views (see CLAUDE.md page-fault cliff)
        buf = np.frombuffer(ctypes.string_at(seg_buf, sz), dtype=np.uint8)
        offs = np.frombuffer(
            ctypes.string_at(seg_offs, 8 * (n + 1)), dtype=np.int64
        )
    finally:
        for p in (c0, c1, c2, seg_buf, seg_offs):
            lib.sctag_free(p)
    return names, dists, locs, SeqBuffer(buf, offs)


def read_sr_barcodes_tsv(path: str) -> list[str]:
    """Whitelist TSV -> barcodes (col 0, file order; scTagger.py:631-640)."""
    with open_maybe_gz(path) as f:
        return [line.rstrip("\n").split("\t")[0] for line in f]
