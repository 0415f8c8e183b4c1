"""EXIF (TIFF-IFD) metadata: build, parse, and strip — stdlib only.

The metadata tier of the multimodal family: real corpora carry camera
metadata inside JPEG APP1 segments, and a release pipeline must (a) read
it (orientation fixes rotation at training time) and (b) REDACT it (GPS
tags are PII — the image sibling of ``llm/text.py``'s text PII scrub).
This module implements the EXIF container honestly at byte level:

* **Builder**: APP1 segment (``Exif\\x00\\x00`` signature) holding a
  little-endian TIFF: header, IFD0 with the Orientation tag (0x0112,
  SHORT) and optionally a GPS-IFD pointer (0x8825, LONG); the GPS IFD
  carries lat/lon refs (ASCII) and values (RATIONAL triplets in a
  trailing value area, as the 4-byte-rule requires).
* **Parser**: marker walk to APP1, endianness dispatch (II and MM), IFD
  entry decode with bounds checks (``ValueError`` on malformed data,
  never IndexError), rational reassembly to degrees.
* **Strip**: rebuilds the JPEG byte stream without Exif APP1 segments —
  metadata removal must not touch entropy data, so the stripped image
  still decodes bit-identically (asserted by the registered query
  through the full T.81 decode).

Reference parity note: the reference system (tmusabbir/
emr-with-custom-metrics) ships no media metadata handling — this tier
belongs to the mandated §2B multimodal extension surface.
"""

from __future__ import annotations

import struct

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_ASCII = 2
_TYPE_RATIONAL = 5


def build_exif_app1(
    orientation: int, gps: tuple[tuple[int, int, int], tuple[int, int, int]] | None = None
) -> bytes:
    """APP1/Exif segment: IFD0 {Orientation[, GPS pointer]}; GPS IFD with
    N/E refs and (deg, min, sec) rationals."""
    tiff = bytearray()
    tiff += b"II" + struct.pack("<H", 0x2A) + struct.pack("<I", 8)
    n0 = 2 if gps is not None else 1
    ifd0_size = 2 + n0 * 12 + 4
    gps_off = 8 + ifd0_size
    tiff += struct.pack("<H", n0)
    tiff += struct.pack("<HHI", 0x0112, _TYPE_SHORT, 1) + struct.pack(
        "<HH", orientation, 0
    )
    if gps is not None:
        tiff += struct.pack("<HHII", 0x8825, _TYPE_LONG, 1, gps_off)
    tiff += struct.pack("<I", 0)  # next IFD
    if gps is not None:
        lat, lon = gps
        ng = 4
        val_off = gps_off + 2 + ng * 12 + 4
        gps_ifd = bytearray()
        gps_ifd += struct.pack("<H", ng)
        gps_ifd += struct.pack("<HHI", 0x0001, _TYPE_ASCII, 2) + b"N\x00\x00\x00"
        gps_ifd += struct.pack("<HHII", 0x0002, _TYPE_RATIONAL, 3, val_off)
        gps_ifd += struct.pack("<HHI", 0x0003, _TYPE_ASCII, 2) + b"E\x00\x00\x00"
        gps_ifd += struct.pack("<HHII", 0x0004, _TYPE_RATIONAL, 3, val_off + 24)
        gps_ifd += struct.pack("<I", 0)
        vals = bytearray()
        for d, m, s in (lat, lon):
            vals += struct.pack("<IIIIII", d, 1, m, 1, s, 1)
        tiff += gps_ifd + vals
    body = b"Exif\x00\x00" + bytes(tiff)
    return b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    return jpeg[:2] + app1 + jpeg[2:]


def _iter_segments(jpeg: bytes):
    """Yield (marker, start, seg_len) for the metadata region (stops at
    SOS — entropy data follows and is not segment-structured)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while True:
        if pos + 4 > len(jpeg):
            # The metadata region must terminate in SOS or EOI; running
            # off the end is a truncation, not a clean stop.
            raise ValueError("truncated JPEG metadata region")
        if jpeg[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = jpeg[pos + 1]
        if marker == 0xD9:  # EOI
            return
        (ln,) = struct.unpack(">H", jpeg[pos + 2 : pos + 4])
        if pos + 2 + ln > len(jpeg):
            raise ValueError("truncated JPEG segment")
        yield marker, pos, 2 + ln
        if marker == 0xDA:  # SOS: entropy-coded data next
            return
        pos += 2 + ln


def parse_exif(jpeg: bytes) -> dict:
    """Extract orientation and GPS (as whole degrees) from the first Exif
    APP1 segment; {'orientation': None, 'gps': None} if absent."""
    out = {"orientation": None, "gps": None, "app1_bytes": 0}
    for marker, pos, seg_len in _iter_segments(jpeg):
        if marker != 0xE1:
            continue
        body = jpeg[pos + 4 : pos + seg_len]
        if body[:6] != b"Exif\x00\x00":
            continue
        out["app1_bytes"] = seg_len
        tiff = body[6:]
        if len(tiff) < 8:
            raise ValueError("truncated TIFF header")
        endian = {"II": "<", "MM": ">"}.get(tiff[:2].decode("latin1"))
        if endian is None or struct.unpack(endian + "H", tiff[2:4])[0] != 0x2A:
            raise ValueError("bad TIFF header")
        (ifd0,) = struct.unpack(endian + "I", tiff[4:8])

        def read_ifd(off: int) -> dict[int, tuple[int, int, bytes]]:
            if off + 2 > len(tiff):
                raise ValueError("truncated IFD")
            (n,) = struct.unpack(endian + "H", tiff[off : off + 2])
            entries = {}
            for i in range(n):
                e = off + 2 + i * 12
                if e + 12 > len(tiff):
                    raise ValueError("truncated IFD entry")
                tag, typ, cnt = struct.unpack(endian + "HHI", tiff[e : e + 8])
                entries[tag] = (typ, cnt, tiff[e + 8 : e + 12])
            return entries

        def rational3(raw4: bytes) -> tuple[int, int, int]:
            (off,) = struct.unpack(endian + "I", raw4)
            if off + 24 > len(tiff):
                raise ValueError("truncated GPS rationals")
            parts = struct.unpack(endian + "IIIIII", tiff[off : off + 24])
            if 0 in parts[1::2]:
                raise ValueError("zero denominator in GPS rational")
            return tuple(parts[i] // parts[i + 1] for i in (0, 2, 4))

        ifd = read_ifd(ifd0)
        if 0x0112 in ifd:
            out["orientation"] = struct.unpack(endian + "H", ifd[0x0112][2][:2])[0]
        if 0x8825 in ifd:
            (goff,) = struct.unpack(endian + "I", ifd[0x8825][2])
            gifd = read_ifd(goff)
            if 0x0002 in gifd and 0x0004 in gifd:
                out["gps"] = (rational3(gifd[0x0002][2]), rational3(gifd[0x0004][2]))
        return out
    return out


def strip_exif(jpeg: bytes) -> tuple[bytes, int]:
    """Remove every Exif APP1 segment; returns (clean_jpeg, bytes_removed).
    Entropy data and every other segment pass through byte-identical."""
    drops = []
    for marker, pos, seg_len in _iter_segments(jpeg):
        if marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00":
            drops.append((pos, seg_len))
    if not drops:
        return jpeg, 0
    out = bytearray()
    last = 0
    removed = 0
    for pos, seg_len in drops:
        out += jpeg[last:pos]
        last = pos + seg_len
        removed += seg_len
    out += jpeg[last:]
    return bytes(out), removed
