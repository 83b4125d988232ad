"""Native C++ LR-TSV reader vs the Python reference loop, plus SeqBuffer.take."""

import gzip

import numpy as np
import pytest

from sctagger_tpu.io.fastq import SeqBuffer
from sctagger_tpu.io.tsv import read_lr_segments_tsv, read_lr_segments_tsv_py

from oracle import random_dna


def _write(tmp_path, name, text, gz=False):
    p = tmp_path / name
    if gz:
        p.write_bytes(gzip.compress(text.encode()))
    else:
        p.write_text(text)
    return str(p)


def _rows(rng, n):
    out = []
    for i in range(n):
        if i % 7 == 3:
            out.append(f"r{i}\t-1\tNA\t\n")  # invalid row, empty segment
        else:
            seg = random_dna(rng, int(rng.integers(18, 30)))
            out.append(f"r{i}\t{i % 3}\t{int(rng.integers(-50, 90))}\t{seg}\n")
    return "".join(out)


@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python(tmp_path, gz):
    rng = np.random.default_rng(3)
    text = _rows(rng, 60)
    p = _write(tmp_path, "lr.tsv.gz" if gz else "lr.tsv", text, gz=gz)
    ref = read_lr_segments_tsv_py(p)
    names, dists, locs, segs = read_lr_segments_tsv(p)
    assert isinstance(segs, SeqBuffer)
    assert (names, dists, locs) == (ref[0], ref[1], ref[2])
    assert list(segs) == ref[3]


def test_extra_fields_and_no_trailing_newline(tmp_path):
    # 5 fields: col3 ends at the 4th tab (python c[3] semantics); final row
    # lacks the newline terminator
    text = "a\t0\t5\tACGT\textra\nb\t1\t6\tTTTT"
    p = _write(tmp_path, "x.tsv", text)
    ref = read_lr_segments_tsv_py(p)
    got = read_lr_segments_tsv(p)
    assert got[0] == ref[0] == ["a", "b"]
    assert list(got[3]) == ref[3] == ["ACGT", "TTTT"]


def test_short_row_falls_back(tmp_path):
    # fewer than 4 fields: native errors -> wrapper falls back to the python
    # reader, which raises IndexError (reference behavior)
    p = _write(tmp_path, "bad.tsv", "a\t0\t5\tACGT\nonly\ttwo\n")
    with pytest.raises(IndexError):
        read_lr_segments_tsv(p)


def test_seqbuffer_take(tmp_path):
    rng = np.random.default_rng(5)
    p = _write(tmp_path, "t.tsv", _rows(rng, 40))
    _, _, locs, segs = read_lr_segments_tsv(p)
    py = list(segs)
    idx = [i for i, l in enumerate(locs) if l != "NA"][::2] + [0, 0]
    sub = segs.take(np.array(idx))
    assert list(sub) == [py[i] for i in idx]
    assert segs.take(np.array([], dtype=np.int64)) == []
