"""Synthetic BAM/BGZF writer for tests (fixture generator, SURVEY.md §4).

Produces a spec-conformant BGZF-compressed BAM plus a JSON sidecar that the
pysam stub (refharness.make_pysam_stub) serves to the real reference script.
"""

from __future__ import annotations

import json
import struct
import zlib

_SEQ_NIBBLE = {"=": 0, "A": 1, "C": 2, "M": 3, "G": 4, "R": 5, "S": 6, "V": 7,
               "T": 8, "W": 9, "Y": 10, "H": 11, "K": 12, "D": 13, "B": 14,
               "N": 15}


def bgzf_block(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    bsize = 12 + 6 + len(comp) + 8 - 1
    return (
        b"\x1f\x8b\x08\x04" + b"\x00" * 6
        + struct.pack("<H", 6) + b"BC" + struct.pack("<H", 2)
        + struct.pack("<H", bsize)
        + comp
        + struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data))
    )


BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def bgzf_compress(data: bytes, block: int = 60000) -> bytes:
    out = b""
    for i in range(0, len(data), block):
        out += bgzf_block(data[i : i + block])
    return out + BGZF_EOF


def bam_record(
    ref_id: int,
    pos: int,
    flag: int,
    name: str,
    seq: str = "",
    tags: list[tuple[str, object]] | None = None,
) -> bytes:
    name_b = name.encode() + b"\x00"
    l_seq = len(seq)
    packed_seq = bytearray()
    for i in range(0, l_seq, 2):
        hi = _SEQ_NIBBLE[seq[i]] << 4
        lo = _SEQ_NIBBLE[seq[i + 1]] if i + 1 < l_seq else 0
        packed_seq.append(hi | lo)
    qual = b"\xff" * l_seq
    aux = b""
    for tag, val in tags or []:
        if isinstance(val, str):
            aux += tag.encode() + b"Z" + val.encode() + b"\x00"
        elif isinstance(val, int):
            aux += tag.encode() + b"i" + struct.pack("<i", val)
        elif isinstance(val, float):
            aux += tag.encode() + b"f" + struct.pack("<f", val)
        elif isinstance(val, list):  # B:i array
            aux += (
                tag.encode() + b"B" + b"i" + struct.pack("<i", len(val))
                + b"".join(struct.pack("<i", v) for v in val)
            )
    body = (
        struct.pack(
            "<iiBBHHHiiii",
            ref_id,
            pos,
            len(name_b),
            30,  # mapq
            0,  # bin
            0,  # n_cigar_op
            flag,
            l_seq,
            -1,  # next_refID
            -1,  # next_pos
            0,  # tlen
        )
        + name_b
        + bytes(packed_seq)
        + qual
        + aux
    )
    return struct.pack("<i", len(body)) + body


def write_bam(path: str, contigs: list[str], alns: dict[str, list[dict]]):
    """alns: contig -> list of {flag, name, tags (list of [tag, val]), pos}.

    Also writes `path + '.pysam.json'` for the reference's pysam stub.
    """
    header_text = b""
    data = b"BAM\x01" + struct.pack("<i", len(header_text)) + header_text
    data += struct.pack("<i", len(contigs))
    for c in contigs:
        cb = c.encode() + b"\x00"
        data += struct.pack("<i", len(cb)) + cb + struct.pack("<i", 100000)
    for ci, c in enumerate(contigs):
        for a in alns.get(c, []):
            data += bam_record(
                ref_id=ci,
                pos=a.get("pos", 0),
                flag=a["flag"],
                name=a.get("name", "q"),
                seq=a.get("seq", ""),
                tags=[tuple(t) for t in a.get("tags", [])],
            )
    with open(path, "wb") as f:
        f.write(bgzf_compress(data))
    with open(path + ".pysam.json", "w") as f:
        json.dump({"contigs": contigs, "alns": alns}, f)
