"""Native BAM reader edge cases."""

import numpy as np
import pytest

from sctagger_tpu.io.bam import extract_cb_counts

from bamgen import write_bam


def test_empty_bam(tmp_path):
    path = str(tmp_path / "empty.bam")
    write_bam(path, ["chr1"], {"chr1": []})
    barcodes, counts, total = extract_cb_counts(path)
    assert barcodes == [] and counts.size == 0 and total == 0


def test_all_filtered(tmp_path):
    path = str(tmp_path / "f.bam")
    write_bam(
        path,
        ["chr1"],
        {"chr1": [
            {"flag": 2048, "name": "a", "tags": [["CB", "ACGT-1"]]},
            {"flag": 512, "name": "b", "tags": [["CB", "ACGT-1"]]},
        ]},
    )
    barcodes, counts, total = extract_cb_counts(path)
    assert total == 0 and barcodes == []


def test_flag_256_kept(tmp_path):
    path = str(tmp_path / "s.bam")
    write_bam(
        path,
        ["chr1"],
        {"chr1": [
            {"flag": 256, "name": "a", "tags": [["CB", "AAAA-1"]]},
            {"flag": 257, "name": "b", "tags": [["CB", "CCCC-1"]]},
        ]},
    )
    barcodes, counts, total = extract_cb_counts(path)
    # flag == 256 kept (reference `> 256` test); 257 skipped
    assert total == 1
    assert barcodes == ["AAAA"]


def test_cb_without_suffix_and_float_tags(tmp_path):
    path = str(tmp_path / "t.bam")
    write_bam(
        path,
        ["chr1"],
        {"chr1": [
            {"flag": 0, "name": "a",
             "tags": [["XF", 1.5], ["CB", "GGTT"], ["NM", 3]]},
        ]},
    )
    barcodes, counts, total = extract_cb_counts(path)
    assert barcodes == ["GGTT"] and counts.tolist() == [1] and total == 1


def test_missing_file():
    with pytest.raises(RuntimeError):
        extract_cb_counts("/nonexistent/x.bam")


def test_not_a_bam(tmp_path):
    p = tmp_path / "x.bam"
    p.write_bytes(b"this is not a bam file")
    with pytest.raises(RuntimeError):
        extract_cb_counts(str(p))


def test_crc_corruption_detected(tmp_path):
    """A flipped payload byte must surface as a zlib data-check error, not
    silently parse (gzread validates each BGZF member's CRC32)."""
    path = str(tmp_path / "crc.bam")
    write_bam(
        path,
        ["chr1"],
        {"chr1": [
            {"flag": 0, "name": f"q{i}", "tags": [["CB", "ACGTACGT-1"]]}
            for i in range(50)
        ]},
    )
    raw = bytearray(open(path, "rb").read())
    # flip one bit inside the first member's DEFLATE payload (after the
    # 18-byte BGZF header, before the trailer)
    raw[40] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(RuntimeError):
        extract_cb_counts(path)


def test_missing_eof_marker_warns_but_parses(tmp_path, capfd):
    """Truncating the BGZF EOF block warns (htslib/pysam behavior) while the
    records still parse."""
    from bamgen import BGZF_EOF

    path = str(tmp_path / "noeof.bam")
    write_bam(
        path,
        ["chr1"],
        {"chr1": [{"flag": 0, "name": "a", "tags": [["CB", "GGGG-1"]]}]},
    )
    raw = open(path, "rb").read()
    assert raw.endswith(BGZF_EOF)
    open(path, "wb").write(raw[: -len(BGZF_EOF)])
    barcodes, counts, total = extract_cb_counts(path)
    assert barcodes == ["GGGG"] and total == 1
    assert "BGZF EOF marker" in capfd.readouterr().err
