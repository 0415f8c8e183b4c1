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
