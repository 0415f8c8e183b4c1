"""FLAC (subset) lossless audio codec in numpy + stdlib only.

Completes the compressed-audio family the MPEG-1 tier started
(``llm/mpeg_audio.py``): that tier is lossy subband coding; this one is
the lossless predict-and-Rice-code family — the other half of what an
audio corpus actually contains. Unlike the "-shaped" MPEG tier (whose
filterbank prototype has no closed form), a FLAC *subset* can be
implemented exactly from the public format specification, so there is no
private-bit honesty boundary here: streams this encoder writes are
spec-conformant FLAC, and the decoder is an honest subset decoder whose
unsupported features raise ``NotImplementedError`` and fall to the stub
tier (``llm/multimodal.py`` dispatch contract).

Scope, honestly stated:

* **Container**: ``fLaC`` magic; STREAMINFO (34-byte layout: block/frame
  size bounds, 20-bit sample rate, channels, bits-per-sample, 36-bit
  total samples, MD5 of the unencoded little-endian sample stream);
  unknown metadata blocks are skipped by (type, length) per the spec.
* **Frames**: 14-bit sync ``11111111111110``, fixed-blocking strategy,
  explicit 16-bit block size (header code ``0b0111``), sample rate
  deferred to STREAMINFO (code ``0b0000``), mono channel assignment,
  16-bit sample-size code, UTF-8-coded frame number (general multi-byte
  coder, not just the 1-byte case), CRC-8 (poly 0x07) over the header
  and CRC-16 (poly 0x8005) over the whole frame — both verified on
  decode, and the STREAMINFO MD5 is verified against the decoded stream.
* **Subframes**: CONSTANT, VERBATIM, and FIXED orders 0-4 (the
  polynomial predictors; encoder picks the order minimizing summed
  residual magnitude, then the Rice parameter minimizing the actual bit
  count, and falls back to VERBATIM when Rice cannot beat it).
* **Residuals**: Rice method 0 (4-bit parameter) and method 1 (rice2,
  5-bit) with zigzag folding and unary-prefix quotients; any partition
  order decodes (the encoder writes order 0).
* **Not implemented — raises, never mis-decodes**: LPC subframes,
  wasted bits, multi-channel assignments (incl. stereo decorrelation),
  sample sizes other than 16, and Rice escape partitions.

Reference parity note: the reference system (tmusabbir/
emr-with-custom-metrics) ships no media decode at all — this tier
belongs to the mandated §2B multimodal extension surface.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

BLOCK_SIZE = 4096

# Fixed-predictor coefficient rows (order -> coefficients on x[i-1..i-o]),
# per the FLAC format spec's polynomial predictors.
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_table() -> list[int]:
    table = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        table.append(crc)
    return table


_CRC16_TABLE = _crc16_table()


def _crc16(data: bytes) -> int:
    # Table-driven (the bit-at-a-time form was 65% of the whole roundtrip
    # profile at bench scale).
    crc = 0
    tab = _CRC16_TABLE
    for b in data:
        crc = tab[(crc >> 8) ^ b] ^ ((crc << 8) & 0xFFFF)
    return crc


class _BitWriter:
    """MSB-first bit packer (same discipline as the MPEG tier's)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (int(value) & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit.
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def write_big(self, value: int, n: int) -> None:
        """Bulk append: same semantics as write() but emits whole bytes via
        int.to_bytes (C speed) instead of the per-byte Python loop — the
        path the vectorized Rice encoder feeds multi-KB bit runs through."""
        value = int(value) & ((1 << n) - 1) if n else 0
        acc = (self.acc << n) | value
        nbits = self.nbits + n
        rem = nbits & 7
        whole = nbits - rem
        if whole:
            self.buf += (acc >> rem).to_bytes(whole // 8, "big")
        self.acc = acc & ((1 << rem) - 1)
        self.nbits = rem

    def byte_align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bytepos = pos
        self.bitpos = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.bytepos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            bit = (self.data[self.bytepos] >> (7 - self.bitpos)) & 1
            v = (v << 1) | bit
            self.bitpos += 1
            if self.bitpos == 8:
                self.bitpos = 0
                self.bytepos += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def byte_align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (general multi-byte form)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (6 - nbytes)) << (6 * (nbytes - 1)):
        nbytes += 1
        if nbytes > 6:
            raise ValueError("frame number too large")
    lead = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead | (n >> (6 * (nbytes - 1))))
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 6:
        raise ValueError("bad UTF-8 frame number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _zigzag(v: np.ndarray) -> np.ndarray:
    return np.where(v >= 0, v.astype(np.int64) << 1, ((-v.astype(np.int64)) << 1) - 1)


def _residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int(np.sum(u >> k)) + len(u) * (k + 1)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    best_k, best_c = 0, _rice_cost(u, 0)
    for k in range(1, 31):
        c = _rice_cost(u, k)
        if c < best_c:
            best_k, best_c = k, c
        elif c > best_c * 2:
            break
    return best_k, best_c


def _write_rice(w: _BitWriter, resid: np.ndarray, k: int) -> None:
    """Vectorized Rice writer: lay every code's bits into one numpy bit
    array (terminator ones scattered at start+q, payload bits scattered
    after each), packbits, and append as a single bulk write. Replaces a
    per-sample Python loop that dominated decode_flac's bench row."""
    u = _zigzag(resid)
    if len(u) == 0:
        return
    q = u >> k
    lens = q + 1 + k
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    total = int(starts[-1] + lens[-1])
    bits = np.zeros(total, dtype=np.uint8)
    term = starts + q
    bits[term] = 1
    if k:
        payload = ((u[:, None] >> np.arange(k - 1, -1, -1)[None, :]) & 1).astype(
            np.uint8
        )
        pos = term[:, None] + 1 + np.arange(k)[None, :]
        bits[pos.ravel()] = payload.ravel()
    packed = np.packbits(bits)
    w.write_big(
        int.from_bytes(packed.tobytes(), "big") >> (len(packed) * 8 - total), total
    )


def _rice_decode_block(
    data: bytes, bitpos: int, k: int, cnt: int
) -> tuple[np.ndarray, int]:
    """Decode ``cnt`` Rice(k) codes starting at absolute bit ``bitpos``.

    Vectorized: unpack the remaining bytes once, then enumerate the
    terminator bits by POINTER DOUBLING over nxt(j) = first set bit more
    than k positions after set bit j (each unary run ends at a set bit;
    the k payload bits that follow may themselves contain set bits, which
    is why the successor function skips k). log2(cnt) vectorized gathers
    replace the per-sample Python loop."""
    if cnt == 0:
        return np.zeros(0, dtype=np.int64), bitpos
    start_byte = bitpos // 8
    bit0 = bitpos - start_byte * 8
    arr = np.frombuffer(data, dtype=np.uint8, offset=start_byte)
    bits = np.unpackbits(arr)
    ones = np.flatnonzero(bits)
    ones = ones[ones >= bit0]
    n1 = len(ones)
    if n1 == 0:
        raise ValueError("truncated FLAC stream")
    nxt = np.minimum(np.searchsorted(ones, ones + k + 1, side="left"), n1)
    nxt = np.append(nxt, n1)  # sentinel index n1 maps to itself
    seq = np.zeros(1, dtype=np.int64)
    jump = nxt.astype(np.int64)
    while len(seq) < cnt:
        seq = np.concatenate([seq, jump[seq][: cnt - len(seq)]])
        jump = jump[jump]
    if seq[-1] >= n1:
        raise ValueError("truncated FLAC stream")
    t = ones[seq]
    prev_end = np.concatenate(([bit0 - 1 - k], t[:-1]))
    q = t - (prev_end + 1 + k)
    if np.any(q > 1 << 20):
        raise ValueError("runaway unary code")
    u = q.astype(np.int64) << k
    if k:
        pos = t[:, None] + 1 + np.arange(k)[None, :]
        if pos[-1, -1] >= len(bits):
            raise ValueError("truncated FLAC stream")
        u |= bits[pos].astype(np.int64) @ (1 << np.arange(k - 1, -1, -1))
    resid = np.where(u & 1, -((u + 1) >> 1), u >> 1)
    return resid, start_byte * 8 + int(t[-1]) + 1 + k


def encode_flac(x: np.ndarray, sample_rate: int) -> bytes:
    """Encode a mono int16 signal as a spec-conformant FLAC subset stream."""
    x = np.asarray(x)
    if x.dtype != np.int16:
        raise ValueError("encode_flac takes int16 samples")
    n_total = len(x)
    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()

    frames = bytearray()
    for fno, start in enumerate(range(0, n_total, BLOCK_SIZE)):
        blk = x[start : start + BLOCK_SIZE].astype(np.int64)
        bs = len(blk)
        w = _BitWriter()
        # -- frame header --------------------------------------------------
        w.write(0b11111111111110, 14)  # sync
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking strategy
        w.write(0b0111, 4)  # block size: explicit 16-bit at header end
        w.write(0b0000, 4)  # sample rate: from STREAMINFO
        w.write(0b0000, 4)  # channel assignment: mono
        w.write(0b100, 3)  # sample size: 16 bits
        w.write(0, 1)  # reserved
        for b in _utf8_code(fno):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.byte_align()
        header = bytes(w.buf)
        w.write(_crc8(header), 8)

        # -- subframe ------------------------------------------------------
        if np.all(blk == blk[0]):
            w.write(0, 1)
            w.write(0b000000, 6)  # CONSTANT
            w.write(0, 1)  # no wasted bits
            w.write(int(blk[0]), 16)
        else:
            orders = [o for o in range(5) if len(blk) > o]
            costs = []
            for o in orders:
                res = _residual(blk, o)
                k, c = _best_rice_param(_zigzag(res))
                costs.append((c + 16 * o, o, k))
            c_best, order, k = min(costs)
            if c_best >= 16 * bs:
                w.write(0, 1)
                w.write(0b000001, 6)  # VERBATIM
                w.write(0, 1)
                pcm = (blk & 0xFFFF).astype(">u2").tobytes()
                w.write_big(int.from_bytes(pcm, "big"), 16 * bs)
            else:
                w.write(0, 1)
                w.write(0b001000 | order, 6)  # FIXED order o
                w.write(0, 1)  # no wasted bits
                for v in blk[:order]:
                    w.write(int(v), 16)  # warmup
                method = 0 if k <= 14 else 1
                w.write(method, 2)
                w.write(0, 4)  # partition order 0
                w.write(k, 4 if method == 0 else 5)
                _write_rice(w, _residual(blk, order), k)

        w.byte_align()
        frame = bytes(w.buf)
        frames += frame + struct.pack(">H", _crc16(frame))

    # -- STREAMINFO --------------------------------------------------------
    si = _BitWriter()
    si.write(BLOCK_SIZE, 16)  # min block size
    si.write(BLOCK_SIZE, 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(15, 5)  # bits per sample - 1
    si.write(n_total, 36)
    si.byte_align()
    streaminfo = bytes(si.buf) + md5
    assert len(streaminfo) == 34

    header = b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:] + streaminfo
    return header + bytes(frames)


def decode_flac(payload: bytes) -> dict:
    """Decode a FLAC subset stream; verifies CRC-8/CRC-16/MD5.

    Returns format metadata plus the reconstructed samples. Unsupported
    spec features raise ``NotImplementedError`` (stub-tier contract);
    corrupt data raises ``ValueError``.
    """
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        btype = payload[pos] & 0x7F
        last = bool(payload[pos] & 0x80)
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        block = payload[pos + 4 : pos + 4 + blen]
        if len(block) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            streaminfo = block
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("missing STREAMINFO")

    r = _BitReader(streaminfo)
    r.read(16)  # min block size
    r.read(16)  # max block size
    r.read(24)
    r.read(24)
    sample_rate = r.read(20)
    n_channels = r.read(3) + 1
    bps = r.read(5) + 1
    n_total = r.read(36)
    md5_expect = streaminfo[18:34]
    if n_channels != 1:
        raise NotImplementedError("multi-channel FLAC unsupported")
    if bps != 16:
        raise NotImplementedError(f"{bps}-bit FLAC unsupported")

    out = np.empty(n_total, dtype=np.int64)
    got = 0
    n_frames = 0
    while got < n_total:
        frame_start = pos
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        if chan != 0:
            raise NotImplementedError("channel assignment unsupported")
        if ss_code != 0b100:
            raise NotImplementedError("sample size code unsupported")
        _utf8_decode(r)
        if bs_code == 0b0110:
            bs = r.read(8) + 1
        elif bs_code == 0b0111:
            bs = r.read(16) + 1
        elif bs_code >= 0b1000:
            bs = 256 << (bs_code - 8)
        elif 0b0010 <= bs_code <= 0b0101:
            bs = 576 << (bs_code - 2)
        elif bs_code == 0b0001:
            bs = 192
        else:
            raise ValueError("reserved block size code")
        if sr_code == 0b0110:
            r.read(8)
        elif sr_code in (0b0111, 0b1000):
            r.read(16)
        r.byte_align()
        header_bytes = payload[frame_start : r.bytepos]
        if r.read(8) != _crc8(header_bytes):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        # -- one mono subframe --------------------------------------------
        if r.read(1) != 0:
            raise ValueError("bad subframe padding bit")
        stype = r.read(6)
        if r.read(1) != 0:
            raise NotImplementedError("wasted bits unsupported")

        def _signed(v: int, n: int) -> int:
            return v - (1 << n) if v & (1 << (n - 1)) else v

        if stype == 0b000000:  # CONSTANT
            blk = np.full(bs, _signed(r.read(16), 16), dtype=np.int64)
        elif stype == 0b000001:  # VERBATIM
            blk = np.array([_signed(r.read(16), 16) for _ in range(bs)], dtype=np.int64)
        elif 0b001000 <= stype <= 0b001100:  # FIXED order 0-4
            order = stype - 0b001000
            warm = [_signed(r.read(16), 16) for _ in range(order)]
            method = r.read(2)
            if method > 1:
                raise ValueError("reserved residual coding method")
            part_order = r.read(4)
            n_parts = 1 << part_order
            if bs % n_parts or (bs >> part_order) <= order and part_order:
                raise ValueError("bad rice partition layout")
            resid = np.empty(bs - order, dtype=np.int64)
            ri = 0
            for p in range(n_parts):
                k = r.read(4 if method == 0 else 5)
                if (method == 0 and k == 0b1111) or (method == 1 and k == 0b11111):
                    raise NotImplementedError("rice escape partition unsupported")
                cnt = (bs >> part_order) - (order if p == 0 else 0)
                vals, newpos = _rice_decode_block(
                    payload, r.bytepos * 8 + r.bitpos, k, cnt
                )
                r.bytepos, r.bitpos = divmod(newpos, 8)
                resid[ri : ri + cnt] = vals
                ri += cnt
            # Reconstruction = order-fold integration (inverse of np.diff):
            # at level j the warmup's (j-1)-th difference seeds the cumsum.
            blk = np.empty(bs, dtype=np.int64)
            blk[:order] = warm
            seq = resid
            for j in range(order, 0, -1):
                init = np.diff(np.asarray(warm, dtype=np.int64), n=j - 1)[-1]
                seq = init + np.cumsum(seq)
            blk[order:] = seq if order else resid
        elif stype & 0b100000:
            raise NotImplementedError("LPC subframes unsupported")
        else:
            raise ValueError("reserved subframe type")

        r.byte_align()
        frame_bytes = payload[frame_start : r.bytepos]
        if r.bytepos + 2 > len(payload):
            raise ValueError("truncated FLAC frame footer")
        (crc_stored,) = struct.unpack(">H", payload[r.bytepos : r.bytepos + 2])
        if crc_stored != _crc16(frame_bytes):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.bytepos + 2

        if got + bs > n_total:
            raise ValueError("FLAC frames exceed STREAMINFO total samples")
        out[got : got + bs] = blk
        got += bs
        n_frames += 1

    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("FLAC MD5 mismatch: decoded stream differs")
    return {
        "sample_rate": sample_rate,
        "n_samples": n_total,
        "n_frames": n_frames,
        "duration_us": n_total * 1_000_000 // sample_rate,
        "samples": out.astype(np.int16),
        "compressed_bytes": len(payload),
    }
