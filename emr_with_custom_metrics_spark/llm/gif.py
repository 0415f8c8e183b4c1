"""GIF87a codec (LZW, GIF flavor) in numpy + stdlib only.

Extends the real image-decode tier (PPM/BMP/PNG/baseline-JPEG) with the
last common image container: GIF's only compression is the LZW variant of
GIF89a/87a Appendix F — variable-width codes growing 3→12 bits, a CLEAR
code that resets the string table, EOI termination, and sub-block byte
framing. All of it is specified exactly and implementable with numpy +
``bytes``; no codec library involved.

Scope, honestly stated:

* ``encode_gif`` — GIF87a, one or more images (multi-image = animation
  frames), 8-bit grayscale global color table (palette[i] = (i, i, i)),
  REAL LZW compression with dictionary growth and 12-bit table-full
  CLEAR emission.
* ``decode_gif`` — GIF87a/89a streams with a global color table, every
  image block walked (frame count + per-frame means exposed for the
  frame-sampling operator); 89a extension blocks (graphics control,
  comment, application) are skipped per spec. Interlaced images decode
  through the Appendix-E 4-pass row scatter (round-6 wave 6), and local
  color tables override the global table per image; corrupt LZW streams
  raise ``ValueError``.

Because GIF is LOSSLESS, the whole-pipeline check is stronger than
JPEG's even-fill contract: ``decode(encode(img))`` must reproduce the
exact per-pixel mean for ANY grayscale image, which oracled queries and
property tests use directly.
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW (89a Appendix F): emit CLEAR, build the string table
    greedily, grow the code width at table-size powers of two, re-CLEAR
    when the 12-bit table fills, end with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first packing
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    put(clear, width)
    run = b""
    for sym in indices.tobytes():
        cand = run + bytes([sym])
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        table[cand] = next_code
        next_code += 1
        # Width growth is synchronized with the decoder's LAGGED table:
        # the decoder reconstructs entry N while reading the code emitted
        # one step after N was assigned here, so growing after assigning
        # code 1<<width lands between the same two wire codes as the
        # decoder's growth at table length 1<<width.
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12) - 1:
            put(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([sym])
    if run:
        put(table[run], width)
        # Terminal boundary (found by fuzzing): the decoder appends one
        # more entry for this final code — an entry the encoder never
        # assigns — and grows its code width if that append lands exactly
        # on 1<<width. EOI is read AFTER that append, so it must be
        # emitted at the grown width.
        if next_code == (1 << width) and width < 12:
            width += 1
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`, tolerant of any conforming encoder
    (handles the deferred-clear convention: a full table simply stops
    growing until the encoder sends CLEAR)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    acc = 0
    nbits = 0
    pos = 0

    def get(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream exhausted before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = get(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code after clear not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("LZW: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) > n_expected:
            raise ValueError("LZW output exceeds image size")
    if len(out) != n_expected:
        raise ValueError("LZW output shorter than image size")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _interlace_order(height: int) -> np.ndarray:
    """GIF 4-pass interlace row schedule (87a Appendix E): rows 0,8,16...,
    then 4,12..., then 2,6,10..., then the odd rows — the order the pixel
    stream carries interlaced images in."""
    return np.concatenate(
        [np.arange(start, height, step) for start, step in
         ((0, 8), (4, 8), (2, 4), (1, 2))]
    )


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap raw bytes into GIF's ≤255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    pixels,
    *,
    interlaced: bool = False,
    local_palettes: "list[np.ndarray] | None" = None,
) -> bytes:
    """GIF87a encoder: grayscale palette (256 entries, palette[i] = i,i,i),
    real LZW. ``pixels`` is a flat fill value, an (h, w) uint8 array, or an
    (n, h, w) uint8 array — n > 1 writes a multi-image stream (one image
    descriptor + LZW block per frame), which GIF87a supports natively;
    the 89a timing extensions are presentation metadata a data pipeline
    doesn't need."""
    if np.isscalar(pixels):
        frames = np.full((1, height, width), int(pixels), dtype=np.uint8)
    else:
        arr = np.asarray(pixels, dtype=np.uint8)
        frames = arr[None, ...] if arr.ndim == 2 else arr
    header = b"GIF87a"
    # logical screen descriptor: global color table, 8 bits/channel, 256 cells
    lsd = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    gct = bytes(v for i in range(256) for v in (i, i, i))
    min_code_size = 8
    body = bytearray()
    base_flags = 0x40 if interlaced else 0
    for fi, frame in enumerate(frames):
        iflags = base_flags
        lct = b""
        if local_palettes is not None and local_palettes[fi] is not None:
            pal = np.asarray(local_palettes[fi], dtype=np.uint8)
            if pal.shape != (256, 3):
                raise ValueError("local palette must be (256, 3)")
            iflags |= 0x80 | 0x07  # LCT present, 256 entries
            lct = pal.tobytes()
        body += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, iflags)
        body += lct
        body.append(min_code_size)
        data = frame[_interlace_order(height)] if interlaced else frame
        body += _sub_blocks(_lzw_encode(data.reshape(-1), min_code_size))
    return header + lsd + gct + bytes(body) + b"\x3b"


def decode_gif(payload: bytes, *, return_pixels: bool = False) -> dict:
    """Decode a GIF87a/89a stream (module docstring scope), walking EVERY
    image block — a multi-image stream is GIF's animation layout.

    Returns format/width/height (of the first frame) / n_frames /
    frame_means (per-frame palette-mapped RGB mean, the frame-sampling
    hook) / n_pixels (per frame) / mean_byte (over all frames) like the
    other real decoders."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")

    def _need(upto: int) -> None:
        # Truncation is a DATA error, not a scope boundary: raise ValueError
        # so multimodal._decode_any's stub fallback catches it — an
        # unchecked payload[pos] would IndexError and kill the whole
        # mapInPandas batch on one malformed blob (r5 ADVICE).
        if upto > len(payload):
            raise ValueError("truncated GIF")

    _need(13)
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        _need(pos + 3 * n)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[tuple[int, int, float]] = []  # (w, h, mean)
    pixel_frames: list[np.ndarray] = []
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # 89a extension: label + sub-blocks, skip per spec
            pos += 2
            _need(pos + 1)
            while payload[pos] != 0:
                pos += 1 + payload[pos]
                _need(pos + 1)
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block {block:#x}")
        _need(pos + 10)
        _, _, _, w, h, iflags = struct.unpack_from("<BHHHHB", payload, pos)
        pos += 10
        interlaced = bool(iflags & 0x40)
        ct = gct
        if iflags & 0x80:
            # Local color table: overrides the global table for THIS image.
            n = 2 << (iflags & 0x07)
            _need(pos + 3 * n)
            ct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without any color table")
        _need(pos + 1)
        min_code_size = payload[pos]
        pos += 1
        lzw = bytearray()
        _need(pos + 1)
        while payload[pos] != 0:
            ln = payload[pos]
            _need(pos + 1 + ln)
            lzw += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
            _need(pos + 1)
        pos += 1  # the sub-block terminator
        indices = _lzw_decode(bytes(lzw), min_code_size, w * h)
        if int(indices.max(initial=0)) >= len(ct):
            raise ValueError("pixel index beyond color table")
        if interlaced:
            # The stream carries rows in 4-pass order; scatter them back.
            img = np.empty((h, w), dtype=np.uint8)
            img[_interlace_order(h)] = indices.reshape(h, w)
            indices = img.reshape(-1)
        frames.append((int(w), int(h), float(ct[indices].mean())))
        if return_pixels:
            pixel_frames.append(indices.reshape(h, w))
    if not frames:
        raise ValueError("GIF contains no image data")
    w, h, _ = frames[0]
    meta = {
        "format": "gif",
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "n_frames": len(frames),
        "frame_means": [m for _, _, m in frames],
        "mean_byte": float(np.mean([m for _, _, m in frames])),
    }
    if return_pixels:
        meta["pixels"] = pixel_frames
    return meta
