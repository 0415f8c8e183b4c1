"""Real image decode (PPM P6 / 24-bit BMP): byte-level parser correctness,
dispatch tiering vs the codec stub, and the Arrow round-trip query."""

from __future__ import annotations

import struct

import pytest

from emr_with_custom_metrics_spark.llm.multimodal import (
    _decode_any,
    decode_image,
    encode_ppm,
    fake_decode_image,
)


def _bmp24(width: int, height: int, fill: int) -> bytes:
    """Minimal uncompressed 24-bit BMP with correct 4-byte row padding."""
    stride = (width * 3 + 3) & ~3
    data = (bytes([fill]) * (width * 3) + b"\x00" * (stride - width * 3)) * height
    size = 54 + len(data)
    header = (
        b"BM"
        + struct.pack("<IHHI", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 0, 0, 0, 0)
    )
    return header + data


def test_ppm_decode_real_bytes():
    meta = decode_image(encode_ppm(7, 5, 200))
    assert meta == {
        "format": "ppm", "width": 7, "height": 5, "n_pixels": 35, "mean_byte": 200.0
    }


def test_ppm_decode_with_comments_and_whitespace():
    img = b"P6\n# a comment\n  7 # inline\n\t5\n# more\n255\n" + bytes([10]) * (7 * 5 * 3)
    meta = decode_image(img)
    assert (meta["width"], meta["height"], meta["mean_byte"]) == (7, 5, 10.0)


def test_ppm_truncated_pixels_rejected():
    img = encode_ppm(4, 4, 1)[:-1]
    with pytest.raises(ValueError):
        decode_image(img)


def test_bmp_decode_real_bytes_with_row_padding():
    meta = decode_image(_bmp24(3, 2, 77))  # stride 12 vs 9 raw: padding must be excluded
    assert meta == {
        "format": "bmp", "width": 3, "height": 2, "n_pixels": 6, "mean_byte": 77.0
    }


def test_bmp_size_field_mismatch_rejected():
    img = bytearray(_bmp24(3, 2, 77))
    img[2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_image(bytes(img))


def test_dispatch_tiers_real_vs_stub():
    # real formats → real metadata
    assert _decode_any(encode_ppm(9, 3, 0)) == (9, 3, 1)
    assert _decode_any(_bmp24(4, 4, 1)) == (4, 4, 1)
    # codec/opaque payloads → deterministic stub
    text = "some document text payload".encode()
    assert _decode_any(text) == fake_decode_image(text)
    # text that merely STARTS like a magic number still falls back
    trap = b"P6 is a bus route in the city"
    assert _decode_any(trap) == fake_decode_image(trap)
    with pytest.raises(NotImplementedError):
        _decode_any(b"")  # empty payload raises like a real decoder


def test_png_roundtrip_all_filter_types():
    """encode_png rotates filters 0-4 across rows; a 10x7 image therefore
    exercises every reverse filter. Constant fill must survive the full
    deflate→inflate→unfilter round-trip exactly."""
    from emr_with_custom_metrics_spark.llm.multimodal import decode_png, encode_png

    for w, h, fill in [(10, 7, 200), (1, 1, 0), (3, 6, 255), (8, 5, 37)]:
        meta = decode_png(encode_png(w, h, fill))
        assert meta == {
            "format": "png", "width": w, "height": h,
            "n_pixels": w * h, "mean_byte": float(fill),
        }, (w, h, fill)


def test_png_filter_bytes_match_spec():
    """Pin the ENCODER to the PNG spec independently of the decoder (a
    shared predictor misunderstanding would cancel in a round-trip): for
    constant fill f the filtered scanlines are hand-computable — Sub rows
    are [f]*bpp then zeros, Up rows are all zeros, Average rows are
    [f - f//2]*bpp then zeros, Paeth rows are all zeros."""
    import struct
    import zlib

    from emr_with_custom_metrics_spark.llm.multimodal import encode_png

    w, h, f, bpp = 4, 5, 201, 3
    png = encode_png(w, h, f)
    # IDAT is the second chunk: sig(8) + IHDR chunk (12+13 bytes)
    idat_off = 8 + 12 + 13
    (ln,) = struct.unpack(">I", png[idat_off : idat_off + 4])
    assert png[idat_off + 4 : idat_off + 8] == b"IDAT"
    raw = zlib.decompress(png[idat_off + 8 : idat_off + 8 + ln])
    stride = w * bpp
    rows = [raw[r * (stride + 1) : (r + 1) * (stride + 1)] for r in range(h)]
    assert rows[0] == bytes([0]) + bytes([f]) * stride  # None
    assert rows[1] == bytes([1]) + bytes([f] * bpp) + bytes(stride - bpp)  # Sub
    assert rows[2] == bytes([2]) + bytes(stride)  # Up
    assert rows[3] == bytes([3]) + bytes([f - f // 2] * bpp) + bytes(stride - bpp)
    assert rows[4] == bytes([4]) + bytes(stride)  # Paeth picks `up` = f


def test_png_rejects_corruption_and_unsupported():
    import pytest

    from emr_with_custom_metrics_spark.llm.multimodal import decode_png, encode_png

    png = bytearray(encode_png(5, 4, 10))
    png[20] ^= 0xFF  # flip an IHDR byte → CRC must fail
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))

    # Adam7 decodes for real since round-6 wave 6; an IHDR CLAIMING
    # interlace over a sequential body must fail as a DATA error, and an
    # out-of-spec interlace method (2) stays on the unsupported tier.
    import struct
    import zlib

    png = bytearray(encode_png(5, 4, 10))

    def patched_ihdr(method):
        ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 2, 0, 0, method)
        chunk = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        )
        return bytes(png[:8]) + chunk + bytes(png[8 + 25 :])

    with pytest.raises(ValueError):
        decode_png(patched_ihdr(1))
    with pytest.raises(NotImplementedError):
        decode_png(patched_ihdr(2))

    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\njunk")


def test_png_dispatches_through_decode_image():
    from emr_with_custom_metrics_spark.llm.multimodal import decode_image, encode_png

    assert _decode_any(encode_png(6, 3, 9)) == (6, 3, 1)
    assert decode_image(encode_png(2, 2, 128))["format"] == "png"


def test_wav_decoder_walks_chunks_and_rejects_garbage():
    """The RIFF parser must skip unknown chunks (with odd-size padding),
    reject non-WAV payloads, and report exact PCM16 statistics."""
    import struct

    import pytest

    from emr_with_custom_metrics_spark.llm.multimodal import decode_wav, encode_wav

    m = decode_wav(encode_wav(16000, 2, 120, 300))
    assert m == {
        "codec": "pcm16",
        "sample_rate": 16000,
        "n_channels": 2,
        "n_samples": 120,
        "duration_us": 120 * 1_000_000 // 16000,
        "rms": 300.0,
    }

    # inject an odd-sized LIST chunk between fmt and data: parser must skip
    # it (including the pad byte) and still find the data chunk
    wav = encode_wav(8000, 1, 10, 5)
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    patched = wav[:fmt_end] + junk + wav[fmt_end:]
    assert decode_wav(patched)["n_samples"] == 10

    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 64)
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no data chunk


def test_jpeg_flat_even_fill_exact_roundtrip():
    """Even-fill flat images must reconstruct EXACTLY across the lossy
    codec (DC-only blocks, DC a multiple of the quant step — the contract
    the multimodal_decode_jpeg oracle relies on), at every edge-padding
    shape."""
    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    for w, h, fill in [(8, 8, 100), (10, 7, 200), (1, 1, 2), (17, 23, 0), (9, 16, 248)]:
        m = decode_jpeg(encode_jpeg(w, h, fill))
        assert (m["format"], m["width"], m["height"]) == ("jpeg", w, h)
        assert m["n_pixels"] == w * h
        assert m["mean_byte"] == fill, (w, h, fill, m["mean_byte"])


def test_jpeg_lossy_path_bounded_error():
    """Non-flat images exercise the AC run-length + Huffman path; a single
    slipped bit in the entropy layer corrupts every later block, so a tight
    mean-error bound is a whole-pipeline check."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    for _ in range(4):
        h, w = (int(x) for x in rng.integers(8, 40, 2))
        base = int(rng.integers(30, 226))
        img = np.clip(base + rng.normal(0, 5, (h, w)), 0, 255).astype(np.uint8)
        m = decode_jpeg(encode_jpeg(w, h, img))
        assert abs(m["mean_byte"] - img.mean()) < 3.0


def test_jpeg_color_roundtrip_and_dispatch():
    """3-component 4:4:4 path: RGB → YCbCr → entropy → inverse → RGB, and
    the tiered dispatcher must route JPEG magic to the real decoder."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg
    from emr_with_custom_metrics_spark.llm.multimodal import decode_image

    img = np.full((16, 12, 3), 200, dtype=np.uint8)
    m = decode_jpeg(encode_jpeg(12, 16, img))
    assert m["mean_byte"] == 200.0  # gray flat color: Cb=Cr=128 exactly

    rng = np.random.default_rng(3)
    img = np.clip(rng.integers(0, 256, (1, 1, 3)) + rng.normal(0, 4, (24, 17, 3)), 0, 255).astype(np.uint8)
    m = decode_jpeg(encode_jpeg(17, 24, img))
    assert abs(m["mean_byte"] - img.mean()) < 4.0

    assert decode_image(encode_jpeg(5, 4, 100))["format"] == "jpeg"


def test_jpeg_rejects_out_of_scope_streams():
    """Progressive streams must fall to the stub tier (NotImplementedError);
    corrupt or self-inconsistent streams must raise ValueError."""
    import pytest

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    good = bytearray(encode_jpeg(8, 8, 100))
    sof = good.find(b"\xff\xc0")
    lossless = bytearray(good)
    lossless[sof + 1] = 0xC3  # SOF0 -> SOF3 (lossless) stays out of scope
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(lossless))

    prog = bytearray(good)
    prog[sof + 1] = 0xC2  # SOF0 -> SOF2: now decodable in general, but THIS
    # stream keeps its sequential full-band scan header, which a progressive
    # frame forbids (DC scans need Se=0) -> self-inconsistent, not a stub
    with pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg(bytes(prog))

    # A single-component frame claiming 2x2 sampling is a LEGAL stream whose
    # one scan is non-interleaved over a subsampled component — per T.81
    # §A.2.2 that walks the component's own (non-MCU-padded) grid, which is
    # out of implemented scope: stub tier, not corrupt-data (r5 ADVICE
    # changed this from ValueError to NotImplementedError).
    sub = bytearray(good)
    sub[sof + 11] = 0x22  # sampling 1x1 -> 2x2, entropy data unchanged
    with pytest.raises(NotImplementedError, match="non-interleaved subsampled"):
        decode_jpeg(bytes(sub))

    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # no SOF/SOS
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_jpeg_subsampled_roundtrip():
    """4:2:0 and 4:2:2 decode through the generic MCU walk: flat gray color
    images reconstruct exactly (DC-only blocks, even fill), structured
    images within a lossy bound, and the decoder reports the sampling
    factors it parsed from SOF0."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    for sampling, tag in [((2, 2), "2x2"), ((2, 1), "2x1"), ((1, 2), "1x2")]:
        for w, h in [(5, 5), (10, 7), (17, 23), (33, 16)]:
            rgb = np.full((h, w, 3), 120, dtype=np.uint8)
            m = decode_jpeg(encode_jpeg(w, h, rgb, sampling=sampling))
            assert m["sampling"] == tag
            assert (m["width"], m["height"]) == (w, h)
            assert m["mean_byte"] == 120.0, (sampling, w, h, m)

    rng = np.random.default_rng(11)
    img = np.clip(
        rng.integers(0, 256, (1, 1, 3)) + rng.normal(0, 6, (40, 56, 3)), 0, 255
    ).astype(np.uint8)
    for sampling in [(2, 2), (2, 1)]:
        m = decode_jpeg(encode_jpeg(56, 40, img, sampling=sampling))
        assert abs(m["mean_byte"] - img.mean()) < 4.0


def test_jpeg_restart_intervals():
    """DRI/RSTn: flat images stay exact across restarts (DC predictor
    resets re-derive the same values), the RST sequence number wraps
    modulo 8, and an out-of-sequence marker — lost MCUs — raises."""
    import numpy as np
    import pytest

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    for ri in [1, 2, 7]:
        for w, h in [(24, 16), (33, 25), (10, 7)]:
            assert decode_jpeg(encode_jpeg(w, h, 100, restart_interval=ri))["mean_byte"] == 100.0
            rgb = np.full((h, w, 3), 120, dtype=np.uint8)
            m = decode_jpeg(encode_jpeg(w, h, rgb, sampling=(2, 2), restart_interval=ri))
            assert m["mean_byte"] == 120.0

    # 144 MCUs at interval 1 → 143 restarts, sequence wraps 0-7 repeatedly
    assert decode_jpeg(encode_jpeg(96, 96, 100, restart_interval=1))["mean_byte"] == 100.0

    rng = np.random.default_rng(5)
    img = np.clip(128 + rng.normal(0, 20, (24, 40)), 0, 255).astype(np.uint8)
    m = decode_jpeg(encode_jpeg(40, 24, img, restart_interval=2))
    assert abs(m["mean_byte"] - img.mean()) < 3.0

    p = bytearray(encode_jpeg(24, 8, 100, restart_interval=1))
    i = p.find(b"\xff\xd0")
    p[i + 1] = 0xD5  # out-of-sequence restart
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg(bytes(p))


def test_gif_lossless_roundtrip_any_image():
    """GIF is lossless: decode(encode(img)) must reproduce the exact mean
    for arbitrary grayscale images, including sizes that drive the LZW
    table through its 12-bit CLEAR and the KwKwK self-reference case."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.gif import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    for w, h in [(1, 1), (7, 5), (33, 21), (255, 3)]:
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        m = decode_gif(encode_gif(w, h, img))
        assert (m["format"], m["width"], m["height"]) == ("gif", w, h)
        assert m["mean_byte"] == img.mean()

    # noise at 300x200 = 60k pixels forces the table-full CLEAR path;
    # aaa... runs force KwKwK
    img = rng.integers(0, 256, (200, 300)).astype(np.uint8)
    assert decode_gif(encode_gif(300, 200, img))["mean_byte"] == img.mean()
    img = np.zeros((4, 100), dtype=np.uint8)
    assert decode_gif(encode_gif(100, 4, img))["mean_byte"] == 0.0


def test_gif_extension_skipping_and_rejections():
    """89a extension blocks are skipped per spec; interlace decodes for
    real since round-6 wave 6 (flipping the flag on a constant-fill
    sequential stream permutes rows of identical values — mean
    unchanged); corrupt streams raise."""
    import pytest

    from emr_with_custom_metrics_spark.llm.gif import decode_gif, encode_gif

    p = bytearray(encode_gif(5, 4, 100))
    ins = 13 + 768  # after header + LSD + 256-entry GCT
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphics control extension
    assert decode_gif(bytes(p[:ins]) + gce + bytes(p[ins:]))["mean_byte"] == 100.0

    img_desc_flags = ins + 9  # last byte of the image descriptor
    interlaced = bytearray(p)
    interlaced[img_desc_flags] = 0x40
    assert decode_gif(bytes(interlaced))["mean_byte"] == 100.0

    with pytest.raises(ValueError):
        decode_gif(b"GIF87a" + b"\x00" * 20)  # truncated garbage
    with pytest.raises(ValueError):
        decode_gif(b"not a gif")
    with pytest.raises(ValueError):
        decode_gif(bytes(encode_gif(20, 20, 7))[:40])  # truncated LZW


def test_gif_dispatches_through_decode_image():
    from emr_with_custom_metrics_spark.llm.gif import encode_gif
    from emr_with_custom_metrics_spark.llm.multimodal import decode_image

    assert decode_image(encode_gif(6, 3, 9))["format"] == "gif"
    assert _decode_any(encode_gif(4, 4, 200)) == (4, 4, 1)


def test_gif_multiframe_stream():
    """Multi-image GIF87a streams (the animation layout): every frame is
    LZW-decoded, per-frame means are exact, and single-frame behavior is
    unchanged."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.gif import decode_gif, encode_gif

    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, (5, 9, 12)).astype(np.uint8)
    m = decode_gif(encode_gif(12, 9, frames))
    assert m["n_frames"] == 5
    assert m["frame_means"] == [f.mean() for f in frames]
    assert m["mean_byte"] == np.mean([f.mean() for f in frames])
    assert (m["width"], m["height"], m["n_pixels"]) == (12, 9, 108)

    single = decode_gif(encode_gif(4, 3, 77))
    assert single["n_frames"] == 1 and single["mean_byte"] == 77.0


def test_g711_expansion_matches_reference_values():
    """Pin the μ-law/A-law expanders to CCITT reference-table points and
    structural properties (symmetric companding, PCM16 range), and the
    full WAV container round trip for format tags 6/7."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.multimodal import (
        alaw_expand,
        decode_wav,
        encode_wav_g711,
        ulaw_expand,
    )

    assert ulaw_expand(np.array([0xFF]))[0] == 0
    assert ulaw_expand(np.array([0x80]))[0] == 32124
    assert ulaw_expand(np.array([0x00]))[0] == -32124
    assert alaw_expand(np.array([0xD5]))[0] == 8
    assert alaw_expand(np.array([0x55]))[0] == -8
    assert alaw_expand(np.array([0xAA]))[0] == 32256
    for f in (ulaw_expand, alaw_expand):
        v = f(np.arange(256))
        assert v.min() >= -32768 and v.max() <= 32767
        assert sorted(v[v > 0]) == sorted(-v[v < 0])  # symmetric companding

    m = decode_wav(encode_wav_g711(8000, 1, 100, 0x80, "ulaw"))
    assert (m["codec"], m["rms"], m["n_samples"]) == ("ulaw", 32124.0, 100)
    m = decode_wav(encode_wav_g711(16000, 2, 50, 0xD5, "alaw"))
    assert (m["codec"], m["rms"], m["duration_us"]) == ("alaw", 8.0, 50 * 1_000_000 // 16000)


def test_jpeg_progressive_spectral_selection():
    """Progressive (SOF2, spectral selection): flat images exact, and a
    structured image must decode to EXACTLY the baseline result — same
    coefficients, different scan layout — for gray and color."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    for w, h in [(8, 8), (10, 7), (33, 25)]:
        assert decode_jpeg(encode_jpeg(w, h, 100, progressive=True))["mean_byte"] == 100.0
        rgb = np.full((h, w, 3), 120, dtype=np.uint8)
        assert decode_jpeg(encode_jpeg(w, h, rgb, progressive=True))["mean_byte"] == 120.0

    rng = np.random.default_rng(7)
    img = np.clip(128 + rng.normal(0, 20, (24, 40)), 0, 255).astype(np.uint8)
    assert (
        decode_jpeg(encode_jpeg(40, 24, img, progressive=True))["mean_byte"]
        == decode_jpeg(encode_jpeg(40, 24, img))["mean_byte"]
    )
    imgc = np.clip(
        rng.integers(0, 256, (1, 1, 3)) + rng.normal(0, 6, (20, 28, 3)), 0, 255
    ).astype(np.uint8)
    assert (
        decode_jpeg(encode_jpeg(28, 20, imgc, progressive=True))["mean_byte"]
        == decode_jpeg(encode_jpeg(28, 20, imgc))["mean_byte"]
    )


def test_jpeg_progressive_eobrun_and_unsupported_scopes():
    """Handcraft a progressive stream whose AC scan uses an EOBn symbol
    (EOBRUN covering 2 blocks) — the path our own encoder never emits —
    plus the successive-approximation and subsampled-progressive rejects."""
    import struct

    import numpy as np
    import pytest

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    # 16x8 grayscale, flat 100: two 8x8 blocks, all AC zero.
    qt = bytes([0]) + bytes([1] * 64)  # quant 1 everywhere (DC exact)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    # DC table: symbols 0..11 at canonical lengths (reuse Annex K layout)
    from emr_with_custom_metrics_spark.llm.jpeg import DC_LUM_BITS, DC_LUM_VALS

    dht_dc = seg(0xFFC4, bytes([0x00]) + bytes(DC_LUM_BITS) + bytes(DC_LUM_VALS))
    # AC table with ONLY symbol 0x10 (EOB1: run=1 → eobrun = 2-1+extra)
    ac_bits = [1] + [0] * 15
    dht_ac = seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x10]))
    # DC scan: value -224 per block? DC = 8*(100-128)/1 = -224, category 8.
    # diff block1 = -224, diff block2 = 0.
    from emr_with_custom_metrics_spark.llm.jpeg import _BitWriter, _DC_ENC, _magnitude

    w = _BitWriter()
    s, bits = _magnitude(-224)
    code, ln = _DC_ENC[s]
    w.put(code, ln)
    w.put(bits, s)
    code, ln = _DC_ENC[0]
    w.put(code, ln)
    w.flush()
    sos_dc = seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0])) + bytes(w.out)
    # AC scan: single EOB1 symbol (1 bit, code 0) + 1 extra bit (0) → both
    # blocks' bands done via eobrun=1 carryover.
    sos_ac = seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0])) + bytes([0x3F])
    jpg = (
        b"\xff\xd8" + seg(0xFFDB, qt) + seg(0xFFC2, sof) + dht_dc + dht_ac
        + sos_dc + sos_ac + b"\xff\xd9"
    )
    m = decode_jpeg(jpg)
    assert (m["width"], m["height"]) == (16, 8)
    assert m["mean_byte"] == 100.0

    # an inconsistent refinement header (Ah must equal Al + 1) is corrupt
    good = bytearray(encode_jpeg(8, 8, 100, progressive=True))
    i = good.find(b"\xff\xda")
    assert good[i + 2 : i + 4] == b"\x00\x08"  # DC scan header length
    bad = bytearray(good)
    bad[i + 9] = 0x31  # AhAl = 3,1 on the DC scan
    with pytest.raises(ValueError, match="Ah = Al"):
        decode_jpeg(bytes(bad))

    # subsampled progressive → honest stub tier
    with pytest.raises(ValueError, match="progressive encode supports"):
        encode_jpeg(
            16, 16, np.full((16, 16, 3), 4, np.uint8), sampling=(2, 2), progressive=True
        )
    prog = bytearray(encode_jpeg(8, 8, 100, progressive=True))
    s2 = prog.find(b"\xff\xc2")
    sub = bytearray(prog)
    sub[s2 + 11] = 0x22  # claim 2x2 sampling in SOF2
    with pytest.raises(NotImplementedError, match="subsampled progressive"):
        decode_jpeg(bytes(sub))


def test_avi_mjpeg_container():
    """RIFF walk + per-frame JPEG decode: exact means for even-fill frames,
    container transparency for structured frames, and loud failures for
    header/stream inconsistencies."""
    import struct

    import numpy as np
    import pytest

    from emr_with_custom_metrics_spark.llm.avi import decode_avi, encode_avi_mjpeg
    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    frames = [encode_jpeg(16, 12, f) for f in (100, 102, 200)]
    m = decode_avi(encode_avi_mjpeg(16, 12, frames, fps=10))
    assert (m["format"], m["n_frames"]) == ("avi-mjpeg", 3)
    assert m["frame_means"] == [100.0, 102.0, 200.0]
    assert m["duration_us"] == 300_000

    rng = np.random.default_rng(1)
    imgs = [
        np.clip(128 + rng.normal(0, 15, (24, 32)), 0, 255).astype(np.uint8)
        for _ in range(4)
    ]
    payloads = [encode_jpeg(32, 24, i) for i in imgs]
    m = decode_avi(encode_avi_mjpeg(32, 24, payloads))
    assert m["frame_means"] == [decode_jpeg(p)["mean_byte"] for p in payloads]

    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")
    bad = bytearray(encode_avi_mjpeg(16, 12, frames))
    bad[4] ^= 0xFF
    with pytest.raises(ValueError, match="size field"):
        decode_avi(bytes(bad))
    good = encode_avi_mjpeg(16, 12, frames)
    i = good.find(b"avih") + 8 + 16  # dwTotalFrames field
    tampered = bytearray(good)
    tampered[i] = 9
    with pytest.raises(ValueError, match="declares"):
        decode_avi(bytes(tampered))


def test_jpeg_successive_approximation_equals_baseline():
    """Successive approximation re-layers the same coefficients across a
    coarse pass (Al=1) and a refinement pass; reconstruction must equal
    baseline EXACTLY — flat, structured, gray and color — and the scan
    count pins the 4-scan gray / 8-scan color script."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    assert decode_jpeg(encode_jpeg(10, 7, 100, successive=True))["mean_byte"] == 100.0

    rng = np.random.default_rng(17)
    for _ in range(6):
        h, w = (int(x) for x in rng.integers(8, 40, 2))
        img = np.clip(
            rng.integers(0, 256, (1, 1)) + rng.normal(0, 20, (h, w)), 0, 255
        ).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(w, h, img))
        succ = decode_jpeg(encode_jpeg(w, h, img, successive=True))
        assert base["mean_byte"] == succ["mean_byte"]
        assert succ["n_scans"] == 4

    imgc = np.clip(
        rng.integers(0, 256, (1, 1, 3)) + rng.normal(0, 10, (24, 28, 3)), 0, 255
    ).astype(np.uint8)
    assert (
        decode_jpeg(encode_jpeg(28, 24, imgc, successive=True))["mean_byte"]
        == decode_jpeg(encode_jpeg(28, 24, imgc))["mean_byte"]
    )


def test_exif_malformed_raises_valueerror_not_indexerror():
    """Truncated/corrupt EXIF must fail as a DATA error (ValueError) — the
    r5-ADVICE GIF lesson applied at birth: no unchecked indexing."""
    import pytest

    from emr_with_custom_metrics_spark.llm.exif import (
        build_exif_app1,
        insert_app1,
        parse_exif,
        strip_exif,
    )
    from emr_with_custom_metrics_spark.llm.jpeg import encode_jpeg

    tagged = insert_app1(
        encode_jpeg(8, 8, 100), build_exif_app1(3, ((1, 2, 3), (4, 5, 6)))
    )
    for cut in (4, 10, 20, 40, len(tagged) // 2):
        chopped = tagged[:cut]
        with pytest.raises(ValueError):
            parse_exif(chopped)
            strip_exif(chopped)
    # corrupt the TIFF magic: parse must reject, strip must still work
    # (strip only needs the segment framing, not the TIFF payload)
    bad = bytearray(tagged)
    bad[2 + 4 + 6] ^= 0xFF  # first TIFF byte inside APP1
    with pytest.raises(ValueError):
        parse_exif(bytes(bad))


def test_exif_roundtrip_and_strip_identity():
    """parse(build) is the identity on (orientation, gps); strip returns
    the pre-tag byte stream exactly."""
    from emr_with_custom_metrics_spark.llm.exif import (
        build_exif_app1,
        insert_app1,
        parse_exif,
        strip_exif,
    )
    from emr_with_custom_metrics_spark.llm.jpeg import encode_jpeg

    base = encode_jpeg(16, 8, 42)
    for orientation in (1, 8):
        for gps in (None, ((89, 59, 58), (179, 0, 1))):
            tagged = insert_app1(base, build_exif_app1(orientation, gps))
            p = parse_exif(tagged)
            assert p["orientation"] == orientation
            assert p["gps"] == gps
            clean, removed = strip_exif(tagged)
            assert clean == base and removed == len(tagged) - len(base)


def test_tar_interop_with_stdlib_both_directions():
    """The from-scratch ustar writer/reader against Python's tarfile:
    stdlib reads our archives, we read stdlib's — spec conformance by
    cross-validation, not just self-consistency."""
    import io
    import tarfile

    from emr_with_custom_metrics_spark.llm.archive import parse_tar, write_tar

    members = [("a.txt", b"hello"), ("nested/b.bin", bytes(range(256)) * 2), ("e", b"")]
    arc = write_tar(members)
    tf = tarfile.open(fileobj=io.BytesIO(arc))
    assert [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()] == members

    buf = io.BytesIO()
    w = tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT)
    for name, content in members:
        ti = tarfile.TarInfo(name)
        ti.size, ti.mtime = len(content), 0
        w.addfile(ti, io.BytesIO(content))
    w.close()
    assert [(m["name"], m["content"]) for m in parse_tar(buf.getvalue())] == members


def test_tar_and_warc_corruption_raise_valueerror():
    import pytest

    from emr_with_custom_metrics_spark.llm.archive import parse_tar, write_tar
    from emr_with_custom_metrics_spark.llm.warc import (
        parse_warc,
        split_gzip_members,
        write_warc_gz,
        write_warc_record,
    )

    arc = bytearray(write_tar([("x", b"data")]))
    arc[30] ^= 1
    with pytest.raises(ValueError, match="checksum"):
        parse_tar(bytes(arc))
    with pytest.raises(ValueError):
        parse_tar(write_tar([("x", b"data")])[:600])  # truncated

    rec = write_warc_record("response", "<id>", "2026-01-01T00:00:00Z", b"abc")
    with pytest.raises(ValueError):
        parse_warc(rec[:-2])
    gz = bytearray(write_warc_gz([rec]))
    with pytest.raises(ValueError):
        split_gzip_members(bytes(gz[: len(gz) // 2]))


def test_zip_interop_with_stdlib_both_directions():
    """The from-scratch ZIP pair must interoperate with stdlib zipfile in
    BOTH directions (we read theirs, they read ours) — the same
    cross-validation contract as the TAR tier."""
    import io
    import zipfile

    from emr_with_custom_metrics_spark.llm.archive import parse_zip, write_zip

    members = [
        ("a.txt", b"hello world"),
        ("nested/path.bin", bytes(range(256)) * 11),
        ("empty", b""),
        ("big.txt", b"spark " * 5000),
    ]
    ours = write_zip(members)
    zf = zipfile.ZipFile(io.BytesIO(ours))
    assert [(i.filename, zf.read(i.filename)) for i in zf.infolist()] == members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as out:
        for n, c in members:
            out.writestr(n, c)
    assert [(m["name"], m["content"]) for m in parse_zip(buf.getvalue())] == members


def test_zip_corruption_and_foreign_features_raise():
    import struct

    import pytest

    from emr_with_custom_metrics_spark.llm.archive import parse_zip, write_zip

    z = bytearray(write_zip([("a", b"abcdef" * 100), ("b", b"xyz")]))
    # flip a payload byte: CRC-32 or inflate must catch it
    z2 = bytearray(z)
    z2[40] ^= 0x5A
    with pytest.raises(ValueError):
        parse_zip(bytes(z2))
    # encrypted flag on the central entry
    z3 = bytes(z)
    cd = z3.rfind(struct.pack("<I", 0x02014B50))
    z4 = bytearray(z3)
    z4[cd + 8] |= 0x01
    with pytest.raises(NotImplementedError, match="encrypted"):
        parse_zip(bytes(z4))
    # truncated EOCD
    with pytest.raises(ValueError):
        parse_zip(z3[:-10])


def test_zip64_interop_with_stdlib_both_directions():
    """ZIP64 (round 7): our forced-zip64 archives read back through
    stdlib zipfile, and stdlib's force_zip64 output (0x0001 extra fields,
    EOCD64 + locator) reads back through our sentinel-aware parser."""
    import io
    import zipfile

    from emr_with_custom_metrics_spark.llm.archive import parse_zip, write_zip

    members = [
        ("a.txt", b"hello world" * 100),
        ("nested/path.bin", bytes(range(256)) * 11),
        ("empty", b""),
    ]
    ours = write_zip(members, zip64=True)
    assert [(m["name"], m["content"]) for m in parse_zip(ours)] == members
    zf = zipfile.ZipFile(io.BytesIO(ours))
    assert [(i.filename, zf.read(i.filename)) for i in zf.infolist()] == members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED, allowZip64=True) as out:
        for n, c in members:
            with out.open(zipfile.ZipInfo(n), "w", force_zip64=True) as f:
                f.write(c)
    assert [(m["name"], m["content"]) for m in parse_zip(buf.getvalue())] == members


def test_zip64_corruption_raises():
    """Byte flips in a ZIP64 archive must surface as ValueError /
    NotImplementedError (CRC-32, size checks, sentinel/locator
    validation), never escape as struct.error or misread content."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.archive import parse_zip, write_zip

    members = [("a", b"abcdef" * 50), ("b", b"xyz"), ("c", b"qq" * 99)]
    base = bytearray(write_zip(members, zip64=True))
    rng = np.random.default_rng(9)
    bad = 0
    for _ in range(4000):
        z = bytearray(base)
        pos = int(rng.integers(0, len(z)))
        z[pos] ^= int(rng.integers(1, 256))
        try:
            got = parse_zip(bytes(z))
            if [(m["name"], m["content"]) for m in got] != members:
                bad += 1
        except (ValueError, NotImplementedError):
            pass
        except Exception:
            bad += 1
    assert bad == 0


def test_zip64_member_at_offset_65535_not_spuriously_rejected():
    """Round-9 ADVICE regression: 0xFFFF is the sentinel for the 16-bit
    disk field ONLY — a 32-bit header-offset value legitimately equal to
    65535 in a record whose SIZES are zip64-deferred must not consume an
    extra-field slot (the old `v == _MAX16` test made _zip64_extra run
    out of slots and reject the archive). Craft it with stdlib: pad the
    first member so the second member's local header lands at exactly
    65535, with force_zip64 sizes."""
    import io
    import zipfile

    from emr_with_custom_metrics_spark.llm.archive import parse_zip

    def build(pad: int) -> bytes:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as out:
            with out.open(zipfile.ZipInfo("pad"), "w", force_zip64=True) as f:
                f.write(b"p" * pad)
            with out.open(zipfile.ZipInfo("at65535"), "w", force_zip64=True) as f:
                f.write(b"target content")
        return buf.getvalue()

    probe = zipfile.ZipFile(io.BytesIO(build(1000)))
    off_probe = probe.infolist()[1].header_offset
    pad = 1000 + (65535 - off_probe)
    assert pad > 0
    z = build(pad)
    zf = zipfile.ZipFile(io.BytesIO(z))
    assert zf.infolist()[1].header_offset == 65535  # the crafted condition
    got = parse_zip(z)
    assert [(m["name"], m["content"]) for m in got] == [
        ("pad", b"p" * pad),
        ("at65535", b"target content"),
    ]

    # and a member whose stored size is exactly 65535 parses exactly
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as out:
        with out.open(zipfile.ZipInfo("sz"), "w", force_zip64=True) as f:
            f.write(b"s" * 65535)
    got = parse_zip(buf.getvalue())
    assert got[0]["name"] == "sz" and got[0]["content"] == b"s" * 65535
