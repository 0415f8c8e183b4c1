"""Baseline TIFF 6.0 (grayscale, stripped) writer + reader — stdlib only.

The scanned-document / scientific-imaging format of the multimodal tier
(TIFF is what scanners, faxes, and microscopy rigs emit; a document
corpus that ingests scans meets it right after PDF). Implemented at
byte level per the TIFF 6.0 specification:

* **Writer**: II (little-endian) header, one IFD with the baseline
  grayscale tag set — ImageWidth(256), ImageLength(257),
  BitsPerSample(258)=8, Compression(259) ∈ {1 none, 32773 PackBits},
  PhotometricInterpretation(262)=1 (BlackIsZero), StripOffsets(273),
  SamplesPerPixel(277)=1, RowsPerStrip(278)=8, StripByteCounts(279) —
  MULTI-STRIP layout (8 rows per strip) with offset/count arrays in the
  value area when they exceed the 4-byte inline rule.
* **PackBits** (the spec's Section 9 RLE): control byte n in 0..127
  copies n+1 literals, 129..255 repeats the next byte 257-n times, 128
  is a no-op — both directions from scratch.
* **Reader**: endianness dispatch (II and MM), IFD walk with
  bounds-checked entry decode, the 4-byte inline-vs-offset value rule,
  strip reassembly with StripByteCounts verification, PackBits
  decompression with exact output-length checks. Corrupt structure
  raises ValueError; foreign features (LZW/JPEG compression, bit depths
  other than 8, multi-sample/RGB, tiled layout, multiple IFDs) raise
  NotImplementedError and fall to the multimodal stub tier.

Reference parity note: the reference system (tmusabbir/
emr-with-custom-metrics) ships no media decode — §2B surface, the same
tier as the GIF/PNG/JPEG codecs.
"""

from __future__ import annotations

import struct

import numpy as np

_T_SHORT = 3
_T_LONG = 4


def packbits_encode(data: bytes) -> bytes:
    """TIFF Section 9 PackBits: maximal runs >= 3 become replicate
    records; everything else literal records of <= 128 bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i = j
            continue
        # literal: scan until a >=3 run starts or 128 bytes collected
        lit_start = i
        while i < n and i - lit_start < 128:
            j = i + 1
            while j < n and j - i < 128 and data[j] == data[i]:
                j += 1
            if j - i >= 3:
                break
            i = j
            if i - lit_start > 128:
                # a 2-byte step may overshoot the record cap; splitting
                # the pair across records is legal PackBits
                i = lit_start + 128
                break
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        c = data[i]
        i += 1
        if c == 128:
            continue
        if c < 128:
            if i + c + 1 > len(data):
                raise ValueError("PackBits literal overruns its strip")
            out += data[i : i + c + 1]
            i += c + 1
        else:
            if i >= len(data):
                raise ValueError("PackBits replicate missing its byte")
            out += bytes([data[i]]) * (257 - c)
            i += 1
        if len(out) > expected:
            raise ValueError("PackBits output exceeds the strip size")
    if len(out) != expected:
        raise ValueError("PackBits output shorter than the strip size")
    return bytes(out)


_ROWS_PER_STRIP = 8


def encode_tiff(width: int, height: int, pixels, packbits: bool = False) -> bytes:
    """Grayscale stripped TIFF; ``pixels`` is an (h, w) uint8 array or a
    scalar fill."""
    if np.isscalar(pixels):
        img = np.full((height, width), int(pixels), dtype=np.uint8)
    else:
        img = np.asarray(pixels, dtype=np.uint8).reshape(height, width)
    strips_raw = [
        img[r : r + _ROWS_PER_STRIP].tobytes()
        for r in range(0, height, _ROWS_PER_STRIP)
    ]
    strips = [packbits_encode(s) if packbits else s for s in strips_raw]
    n_strips = len(strips)
    compression = 32773 if packbits else 1

    entries = []  # (tag, type, count, value_or_payload)
    # value area after the IFD; compute layout: header(8) + ifd
    n_entries = 9
    ifd_off = 8
    ifd_size = 2 + n_entries * 12 + 4
    val_off = ifd_off + ifd_size
    extra = bytearray()

    def val_or_offset(arr: list[int], typ: int) -> int:
        nonlocal extra
        fmt = "<H" if typ == _T_SHORT else "<I"
        width_b = 2 if typ == _T_SHORT else 4
        if len(arr) * width_b <= 4:
            packed = b"".join(struct.pack(fmt, v) for v in arr)
            return int.from_bytes(packed.ljust(4, b"\0"), "little")
        off = val_off + len(extra)
        for v in arr:
            extra += struct.pack(fmt, v)
        return off

    # strip offsets come after the value-area arrays; reserve by two passes
    # pass 1: byte counts array + offsets array sizes
    counts = [len(s) for s in strips]
    # offsets array placed in extra too (if > 1 strip); strip data after
    # everything — compute in order: counts array, offsets array, strips
    entries.append((256, _T_LONG, 1, [width]))
    entries.append((257, _T_LONG, 1, [height]))
    entries.append((258, _T_SHORT, 1, [8]))
    entries.append((259, _T_SHORT, 1, [compression]))
    entries.append((262, _T_SHORT, 1, [1]))
    entries.append((277, _T_SHORT, 1, [1]))
    entries.append((278, _T_LONG, 1, [_ROWS_PER_STRIP]))
    # placeholders for 273/279 resolved below
    counts_loc = val_off if n_strips * 4 > 4 else None
    counts_end = val_off + (n_strips * 4 if counts_loc is not None else 0)
    offs_loc = counts_end if n_strips * 4 > 4 else None
    offs_end = counts_end + (n_strips * 4 if offs_loc is not None else 0)
    data_start = offs_end
    strip_offsets = []
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    out = bytearray()
    out += b"II" + struct.pack("<H", 42) + struct.pack("<I", ifd_off)
    ifd = bytearray()
    ifd += struct.pack("<H", n_entries)

    def emit(tag: int, typ: int, arr: list[int]) -> None:
        fmt = "<H" if typ == _T_SHORT else "<I"
        wb = 2 if typ == _T_SHORT else 4
        if len(arr) * wb <= 4:
            packed = b"".join(struct.pack(fmt, v) for v in arr).ljust(4, b"\0")
            ifd.extend(struct.pack("<HHI", tag, typ, len(arr)) + packed)
        else:
            off = counts_loc if tag == 279 else offs_loc
            ifd.extend(struct.pack("<HHII", tag, typ, len(arr), off))

    for tag, typ, _cnt, arr in sorted(
        entries + [(273, _T_LONG, n_strips, strip_offsets),
                   (279, _T_LONG, n_strips, counts)]
    ):
        emit(tag, typ, arr)
    ifd += struct.pack("<I", 0)  # next IFD
    assert len(ifd) == ifd_size
    out += ifd
    if counts_loc is not None:
        for c in counts:
            out += struct.pack("<I", c)
    if offs_loc is not None:
        for o in strip_offsets:
            out += struct.pack("<I", o)
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(payload: bytes) -> dict:
    if len(payload) < 8:
        raise ValueError("truncated TIFF payload")
    order = payload[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    magic, ifd_off = struct.unpack_from(e + "HI", payload, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if ifd_off + 2 > len(payload):
        raise ValueError("IFD offset beyond EOF")
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    if ifd_off + 2 + 12 * n_entries + 4 > len(payload):
        raise ValueError("IFD extends past EOF")

    def read_values(typ: int, count: int, raw4: bytes, at: int) -> list[int]:
        wb = {_T_SHORT: 2, _T_LONG: 4}.get(typ)
        if wb is None:
            raise ValueError(f"unsupported IFD value type {typ}")
        fmt = e + ("H" if typ == _T_SHORT else "I")
        if count * wb <= 4:
            return [
                struct.unpack_from(fmt, raw4, k * wb)[0] for k in range(count)
            ]
        (off,) = struct.unpack_from(e + "I", raw4, 0)
        if off + count * wb > len(payload):
            raise ValueError("IFD value array beyond EOF")
        return [
            struct.unpack_from(fmt, payload, off + k * wb)[0]
            for k in range(count)
        ]

    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        at = ifd_off + 2 + 12 * k
        tag, typ, count = struct.unpack_from(e + "HHI", payload, at)
        tags[tag] = read_values(typ, count, payload[at + 8 : at + 12], at)
    (next_ifd,) = struct.unpack_from(
        e + "I", payload, ifd_off + 2 + 12 * n_entries
    )
    if next_ifd:
        raise NotImplementedError("multi-IFD (multi-page) TIFF unsupported")

    def one(tag: int, name: str) -> int:
        if tag not in tags:
            raise ValueError(f"missing required TIFF tag {name}")
        return tags[tag][0]

    width, height = one(256, "ImageWidth"), one(257, "ImageLength")
    if tags.get(258, [8]) != [8]:
        raise NotImplementedError("BitsPerSample != 8 unsupported")
    if tags.get(277, [1]) != [1]:
        raise NotImplementedError("SamplesPerPixel != 1 (RGB/extra) unsupported")
    compression = tags.get(259, [1])[0]
    if compression not in (1, 32773):
        raise NotImplementedError(
            f"compression {compression} unsupported (baseline none/PackBits only)"
        )
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF unsupported")
    rows_per_strip = tags.get(278, [height])[0]
    offsets = tags.get(273)
    counts = tags.get(279)
    if offsets is None or counts is None:
        raise ValueError("missing StripOffsets/StripByteCounts")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    expected_strips = -(-height // rows_per_strip) if rows_per_strip else 0
    if len(offsets) != expected_strips:
        raise ValueError("strip count disagrees with RowsPerStrip")
    data = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise ValueError("strip beyond EOF")
        rows = min(rows_per_strip, height - si * rows_per_strip)
        raw = payload[off : off + cnt]
        if compression == 32773:
            raw = packbits_decode(raw, rows * width)
        elif len(raw) != rows * width:
            raise ValueError("uncompressed strip size mismatch")
        data += raw
    if len(data) != width * height:
        raise ValueError("reassembled strips disagree with dimensions")
    img = np.frombuffer(bytes(data), dtype=np.uint8).reshape(height, width)
    return {
        "format": "tiff",
        "width": int(width),
        "height": int(height),
        "n_pixels": int(width * height),
        "compression": "packbits" if compression == 32773 else "none",
        "mean_byte": float(img.mean()),
        "pixels": img,
    }
