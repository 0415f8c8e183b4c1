"""TAR (POSIX ustar) archives from scratch — stdlib ``struct`` only.

The other half of corpus ingestion next to WARC (``llm/warc.py``):
curated datasets ship as tarballs, and the first pipeline stage walks
members out of them. Implemented honestly at block level, not via the
``tarfile`` module:

* **Header**: the 512-byte ustar block — name(100) mode(8) uid(8)
  gid(8) size(12, octal) mtime(12, octal) chksum(8) typeflag(1)
  linkname(100) magic("ustar\\0") version("00") uname(32) gname(32)
  devmajor(8) devminor(8) prefix(155) pad(12).
* **Checksum**: sum of all header bytes with the chksum field read as
  eight spaces, stored as a 6-digit octal + NUL + space — VERIFIED on
  read; a flipped header byte is caught here, not downstream.
* **Framing**: member data padded to 512-byte blocks; archive ends with
  two zero blocks. Truncation, bad octal, or checksum mismatch raise
  ``ValueError``; typeflags other than regular files ('0' or NUL)
  raise ``NotImplementedError`` (directories/links are out of corpus
  scope).

Reference parity note: the reference system has no archive handling —
§2B extension surface (corpus ingestion).
"""

from __future__ import annotations

BLOCK = 512


def _octal(n: int, width: int) -> bytes:
    return f"{n:0{width - 1}o}".encode() + b"\x00"


def write_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Build a ustar archive of regular-file members (name, content)."""
    out = bytearray()
    for name, content in members:
        nb = name.encode()
        if len(nb) > 100:
            raise ValueError("member name exceeds 100 bytes")
        header = bytearray(BLOCK)
        header[0 : len(nb)] = nb
        header[100:108] = _octal(0o644, 8)
        header[108:116] = _octal(0, 8)
        header[116:124] = _octal(0, 8)
        header[124:136] = _octal(len(content), 12)
        header[136:148] = _octal(0, 12)
        header[148:156] = b" " * 8  # chksum placeholder
        header[156] = ord("0")  # regular file
        header[257:263] = b"ustar\x00"
        header[263:265] = b"00"
        chksum = sum(header)
        header[148:156] = f"{chksum:06o}".encode() + b"\x00 "
        out += header
        out += content
        if len(content) % BLOCK:
            out += b"\x00" * (BLOCK - len(content) % BLOCK)
    out += b"\x00" * (2 * BLOCK)
    return bytes(out)


def _read_octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ValueError(f"bad octal field {field!r}") from exc


def parse_tar(archive: bytes) -> list[dict]:
    """Walk every member; verifies each header checksum."""
    members = []
    pos = 0
    n = len(archive)
    while True:
        if pos + BLOCK > n:
            raise ValueError("truncated TAR header")
        header = archive[pos : pos + BLOCK]
        if header == b"\x00" * BLOCK:
            # end-of-archive: expect a second zero block
            if archive[pos + BLOCK : pos + 2 * BLOCK] != b"\x00" * BLOCK:
                raise ValueError("missing second end-of-archive block")
            break
        stored = _read_octal(header[148:156])
        computed = sum(header[:148]) + 8 * 0x20 + sum(header[156:])
        if stored != computed:
            raise ValueError(f"TAR header checksum mismatch at offset {pos}")
        if header[257:262] != b"ustar":
            raise ValueError("missing ustar magic")
        typeflag = header[156]
        if typeflag not in (ord("0"), 0):
            raise NotImplementedError("only regular-file members supported")
        name = header[0:100].split(b"\x00")[0].decode()
        size = _read_octal(header[124:136])
        data_start = pos + BLOCK
        if data_start + size > n:
            raise ValueError("TAR member data overruns archive")
        content = archive[data_start : data_start + size]
        members.append({"name": name, "size": size, "content": content})
        pos = data_start + size
        if size % BLOCK:
            pos += BLOCK - size % BLOCK
    if not members:
        raise ValueError("empty TAR archive")
    return members


# ---------------------------------------------------------------------------
# ZIP archives (APPNOTE.TXT subset) — stdlib struct + zlib only
# ---------------------------------------------------------------------------
# The fourth stage-zero corpus format (WARC, TAR, PDF, ZIP): dataset drops
# very often arrive zipped. Implemented at record level, not via the
# ``zipfile`` module: local file headers, central directory, end-of-
# central-directory record, STORED and DEFLATE members (raw deflate via
# zlib wbits=-15), CRC-32 and size verification on read. ZIP64 (round 7,
# closing the r6 "what's missing" item): the 0x0001 extended-information
# extra field on local and central headers, the ZIP64 end-of-central-
# directory record + locator, and 0xFFFFFFFF/0xFFFF sentinel handling on
# read — a >4 GiB dataset drop (or one with >65535 members) parses the
# same way a small one does. Encryption, spanned archives, and other
# compression methods raise NotImplementedError; structural damage
# raises ValueError. The pair is cross-validated against stdlib zipfile
# in BOTH directions in tests (including stdlib-written force_zip64
# archives).
import struct as _struct
import zlib as _zlib

_LFH = 0x04034B50
_CDH = 0x02014B50
_EOCD = 0x06054B50
_EOCD64 = 0x06064B50
_EOCD64_LOC = 0x07064B50
_MAX32 = 0xFFFFFFFF
_MAX16 = 0xFFFF


def write_zip(
    members: list[tuple[str, bytes]],
    alternate: bool = True,
    zip64: bool = False,
) -> bytes:
    """Build a ZIP of regular members. With ``alternate`` (default), even
    member indices DEFLATE and odd ones are STORED, so a corpus-wide walk
    exercises both decode paths. With ``zip64``, every member carries the
    0x0001 extended-information extra field (8-byte sizes + offset behind
    0xFFFFFFFF sentinels) and the archive ends with the ZIP64 EOCD record
    + locator — the layout a >4 GiB archive is forced into, writable here
    at any size so the reader path is testable."""
    out = bytearray()
    central = bytearray()
    version = 45 if zip64 else 20
    for i, (name, content) in enumerate(members):
        nb = name.encode()
        crc = _zlib.crc32(content) & 0xFFFFFFFF
        if alternate and i % 2 == 0:
            method = 8
            comp = _zlib.compressobj(6, _zlib.DEFLATED, -15)
            data = comp.compress(content) + comp.flush()
        else:
            method = 0
            data = content
        off = len(out)
        if zip64:
            lextra = _struct.pack("<HHQQ", 1, 16, len(content), len(data))
            hdr = _struct.pack(
                "<IHHHHHIIIHH", _LFH, version, 0, method, 0, 0,
                crc, _MAX32, _MAX32, len(nb), len(lextra),
            )
            out += hdr + nb + lextra + data
            cextra = _struct.pack(
                "<HHQQQ", 1, 24, len(content), len(data), off
            )
            central += _struct.pack(
                "<IHHHHHHIIIHHHHHII", _CDH, version, version, 0, method,
                0, 0, crc, _MAX32, _MAX32, len(nb), len(cextra), 0, 0, 0,
                0, _MAX32,
            ) + nb + cextra
        else:
            hdr = _struct.pack(
                "<IHHHHHIIIHH", _LFH, version, 0, method, 0, 0,
                crc, len(data), len(content), len(nb), 0,
            )
            out += hdr + nb + data
            central += _struct.pack(
                "<IHHHHHHIIIHHHHHII", _CDH, version, version, 0, method,
                0, 0, crc, len(data), len(content), len(nb), 0, 0, 0, 0,
                0, off,
            ) + nb
    cd_off = len(out)
    out += central
    if zip64:
        eocd64_at = len(out)
        out += _struct.pack(
            "<IQHHIIQQQQ", _EOCD64, 44, version, version, 0, 0,
            len(members), len(members), len(central), cd_off,
        )
        out += _struct.pack("<IIQI", _EOCD64_LOC, 0, eocd64_at, 1)
        out += _struct.pack(
            "<IHHHHIIH", _EOCD, 0, 0, _MAX16, _MAX16,
            len(central), _MAX32, 0,
        )
    else:
        out += _struct.pack(
            "<IHHHHIIH", _EOCD, 0, 0, len(members), len(members),
            len(central), cd_off, 0,
        )
    return bytes(out)


def _zip64_extra(extra: bytes, needed: list[int]) -> list[int]:
    """Pull the 0x0001 extended-information values: APPNOTE order is
    (usize, csize, header offset, disk) and only the fields whose 32-bit
    slots are maxed appear. ``needed`` holds the 32-bit values; maxed
    slots are replaced in order from the extra field."""
    pos = 0
    fields: list[int] = []
    while pos + 4 <= len(extra):
        tag, ln = _struct.unpack_from("<HH", extra, pos)
        pos += 4
        if pos + ln > len(extra):
            raise ValueError("extra field extends past its buffer")
        if tag == 1:
            if ln % 8:
                raise ValueError("zip64 extra field length not a multiple of 8")
            fields = list(_struct.unpack_from(f"<{ln // 8}Q", extra, pos))
        pos += ln
    out = []
    it = iter(fields)
    for v in needed:
        # Only 0xFFFFFFFF marks a deferred 32-bit slot (usize/csize/offset);
        # 0xFFFF is the sentinel for the 16-bit disk field only, which this
        # helper is never asked for — a 32-bit value legitimately equal to
        # 65535 must NOT consume an extra-field slot (APPNOTE 4.5.3).
        if v == _MAX32:
            try:
                out.append(next(it))
            except StopIteration:
                raise ValueError("zip64 extra field missing a needed value") from None
        else:
            out.append(v)
    return out


def parse_zip(archive: bytes) -> list[dict]:
    """Walk a ZIP via its central directory; returns one dict per member
    with name/method/size/content, all integrity checks enforced."""
    # EOCD: scan backwards through the trailing 64 KiB + 22 bytes.
    window = archive[-(65536 + 22):]
    at = window.rfind(_struct.pack("<I", _EOCD))
    if at < 0:
        raise ValueError("missing end-of-central-directory record")
    eocd = window[at:]
    if len(eocd) < 22:
        raise ValueError("truncated EOCD")
    (_, disk, cd_disk, n_here, n_total, cd_size, cd_off, _clen) = _struct.unpack(
        "<IHHHHIIH", eocd[:22]
    )
    if disk or cd_disk:
        raise NotImplementedError("spanned/multi-disk ZIP unsupported")
    if n_total == _MAX16 or cd_off == _MAX32 or cd_size == _MAX32:
        # ZIP64: the locator sits immediately before the EOCD and points
        # at the ZIP64 EOCD record, which carries the real 8-byte values.
        eocd_at = len(archive) - len(window) + at
        loc_at = eocd_at - 20
        if loc_at < 0 or _struct.unpack_from("<I", archive, loc_at)[0] != _EOCD64_LOC:
            raise ValueError("zip64 sentinel without an EOCD64 locator")
        _, loc_disk, eocd64_at, n_disks = _struct.unpack_from("<IIQI", archive, loc_at)
        if loc_disk or n_disks != 1:
            raise NotImplementedError("spanned/multi-disk ZIP unsupported")
        if eocd64_at + 56 > len(archive):
            raise ValueError("EOCD64 offset beyond EOF")
        (sig64, _sz, _vm, _vn, d1, d2, _n_here64, n_total64, cd_size64,
         cd_off64) = _struct.unpack_from("<IQHHIIQQQQ", archive, eocd64_at)
        if sig64 != _EOCD64:
            raise ValueError("EOCD64 locator points at a non-EOCD64 record")
        if d1 or d2:
            raise NotImplementedError("spanned/multi-disk ZIP unsupported")
        n_total, cd_size, cd_off = n_total64, cd_size64, cd_off64
    if cd_off + cd_size > len(archive):
        raise ValueError("central directory extends past EOF")
    members = []
    pos = cd_off
    for _ in range(n_total):
        if pos + 46 > len(archive):
            raise ValueError("central entry beyond EOF")
        if _struct.unpack_from("<I", archive, pos)[0] != _CDH:
            raise ValueError("bad central-directory signature")
        (
            _, _vmade, _vneed, flags, method, _t, _d, crc, csize, usize,
            nlen, elen, clen, _dsk, _iattr, _eattr, lho,
        ) = _struct.unpack_from("<IHHHHHHIIIHHHHHII", archive, pos)
        name = archive[pos + 46 : pos + 46 + nlen].decode()
        extra = archive[pos + 46 + nlen : pos + 46 + nlen + elen]
        pos += 46 + nlen + elen + clen
        if flags & 0x1:
            raise NotImplementedError("encrypted ZIP member unsupported")
        if method not in (0, 8):
            raise NotImplementedError(f"compression method {method} unsupported")
        if usize == _MAX32 or csize == _MAX32 or lho == _MAX32:
            usize, csize, lho = _zip64_extra(extra, [usize, csize, lho])
        if lho + 30 > len(archive):
            raise ValueError("local header beyond EOF")
        if _struct.unpack_from("<I", archive, lho)[0] != _LFH:
            raise ValueError("central directory points at a non-local-header")
        lnlen, lelen = _struct.unpack_from("<HH", archive, lho + 26)
        lname = archive[lho + 30 : lho + 30 + lnlen]
        if lname.decode() != name:
            raise ValueError("local/central name mismatch")
        data_at = lho + 30 + lnlen + lelen
        data = archive[data_at : data_at + csize]
        if len(data) != csize:
            raise ValueError("member data truncated")
        if method == 8:
            try:
                dec = _zlib.decompressobj(-15)
                content = dec.decompress(data) + dec.flush()
            except _zlib.error as exc:
                raise ValueError(f"bad deflate stream: {exc}") from exc
        else:
            content = data
        if len(content) != usize:
            raise ValueError("uncompressed size mismatch")
        if (_zlib.crc32(content) & 0xFFFFFFFF) != crc:
            raise ValueError("CRC-32 mismatch")
        members.append(
            {"name": name, "method": method, "size": usize, "content": content}
        )
    return members
