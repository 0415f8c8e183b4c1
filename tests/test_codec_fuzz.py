"""Property-based fuzzing of the from-scratch codecs (no Spark session):
random images through GIF/JPEG round trips, checking the invariants each
format guarantees — exactness where the math is lossless, cross-layout
equality where only the container layout differs. Catches entropy-layer
edge cases (code-width boundaries, EOB runs, stuffing, table growth) that
hand-picked examples miss."""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st


@st.composite
def gray_images(draw, max_side: int = 40):
    w = draw(st.integers(min_value=1, max_value=max_side))
    h = draw(st.integers(min_value=1, max_value=max_side))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    style = draw(st.sampled_from(["noise", "flat", "gradient", "blocks"]))
    rng = np.random.default_rng(seed)
    if style == "noise":
        img = rng.integers(0, 256, (h, w))
    elif style == "flat":
        img = np.full((h, w), int(rng.integers(0, 256)))
    elif style == "gradient":
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        img = (xx * int(rng.integers(1, 9)) + yy * int(rng.integers(1, 9))) % 256
    else:
        img = np.repeat(
            np.repeat(rng.integers(0, 256, (-(-h // 4), -(-w // 4))), 4, 0), 4, 1
        )[:h, :w]
    return w, h, img.astype(np.uint8)


@settings(max_examples=60, deadline=None)
@given(gray_images())
def test_gif_roundtrip_is_lossless(img):
    """GIF guarantees bit-exact pixels: the decoded mean equals the source
    mean for EVERY image, whatever path the LZW table growth takes."""
    from emr_with_custom_metrics_spark.llm.gif import decode_gif, encode_gif

    w, h, a = img
    m = decode_gif(encode_gif(w, h, a))
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, 1)
    assert m["mean_byte"] == a.mean()


@settings(max_examples=30, deadline=None)
@given(gray_images(max_side=24), st.integers(min_value=1, max_value=5))
def test_gif_multiframe_means_exact(img, n_frames):
    from emr_with_custom_metrics_spark.llm.gif import decode_gif, encode_gif

    w, h, a = img
    frames = np.stack([(a.astype(np.int64) + 31 * i) % 256 for i in range(n_frames)])
    m = decode_gif(encode_gif(w, h, frames.astype(np.uint8)))
    assert m["n_frames"] == n_frames
    assert m["frame_means"] == [f.mean() for f in frames]


@settings(max_examples=40, deadline=None)
@given(gray_images(max_side=32))
def test_jpeg_progressive_equals_baseline(img):
    """Spectral selection only reorders WHICH scan carries each
    coefficient; the reconstructed image must match baseline exactly."""
    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    w, h, a = img
    base = decode_jpeg(encode_jpeg(w, h, a))
    prog = decode_jpeg(encode_jpeg(w, h, a, progressive=True))
    assert base["mean_byte"] == prog["mean_byte"]
    assert prog["progressive"] and prog["n_scans"] == 3


@settings(max_examples=30, deadline=None)
@given(gray_images(max_side=32), st.integers(min_value=1, max_value=4))
def test_jpeg_restart_layout_equals_plain(img, ri):
    """Restart markers only re-frame the entropy stream (byte-align +
    predictor reset); the decoded image must match the unrestarted one."""
    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    w, h, a = img
    plain = decode_jpeg(encode_jpeg(w, h, a))
    restarted = decode_jpeg(encode_jpeg(w, h, a, restart_interval=ri))
    assert plain["mean_byte"] == restarted["mean_byte"]


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=0, max_value=127),
    st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
)
def test_jpeg_subsampled_flat_even_fill_exact(w, h, half_fill, sampling):
    """The even-fill exactness contract holds at every sampling layout and
    edge-padding geometry (flat planes are DC-only; box downsample and
    nearest-neighbor upsample are identity on flat chroma)."""
    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    fill = half_fill * 2
    rgb = np.full((h, w, 3), fill, dtype=np.uint8)
    m = decode_jpeg(encode_jpeg(w, h, rgb, sampling=sampling))
    assert m["mean_byte"] == float(fill)
    assert m["sampling"] == f"{sampling[0]}x{sampling[1]}"


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=255), st.sampled_from(["ulaw", "alaw"]))
def test_g711_constant_signal_rms_is_expansion_magnitude(byte_value, law):
    """For a constant companded byte the RMS equals |expand(byte)| exactly,
    for every byte value in both laws."""
    from emr_with_custom_metrics_spark.llm.multimodal import (
        alaw_expand,
        decode_wav,
        encode_wav_g711,
        ulaw_expand,
    )

    expand = ulaw_expand if law == "ulaw" else alaw_expand
    expected = abs(int(expand(np.array([byte_value]))[0]))
    m = decode_wav(encode_wav_g711(8000, 1, 16, byte_value, law))
    assert m["rms"] == float(expected)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=4000),
    st.integers(min_value=2, max_value=8),
)
def test_gif_lzw_encode_decode_inverse(symbols, min_code_size):
    """The LZW pair is inverse for any symbol stream within the alphabet —
    including streams long enough to force code-width growth and 12-bit
    CLEAR — independent of the GIF container."""
    from emr_with_custom_metrics_spark.llm.gif import _lzw_decode, _lzw_encode

    alphabet = 1 << min_code_size
    data = np.array([s % alphabet for s in symbols], dtype=np.uint8)
    out = _lzw_decode(_lzw_encode(data, min_code_size), min_code_size, len(data))
    assert np.array_equal(out, data)


@settings(max_examples=40, deadline=None)
@given(gray_images(max_side=32))
def test_jpeg_successive_equals_baseline(img):
    """Successive approximation is a lossless re-layering of the same
    quantized coefficients — reconstruction must equal baseline exactly,
    whatever refinement-path the random image drives (EOB runs, ZRL spans
    with interleaved correction bits, newly-nonzero insertions)."""
    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    w, h, a = img
    base = decode_jpeg(encode_jpeg(w, h, a))
    succ = decode_jpeg(encode_jpeg(w, h, a, successive=True))
    assert base["mean_byte"] == succ["mean_byte"]
    assert succ["n_scans"] == 4


@settings(max_examples=50, deadline=None)
@given(gray_images(max_side=24), st.integers(min_value=6, max_value=2000))
def test_gif_truncation_raises_valueerror_not_indexerror(img, cut):
    """Truncating a valid stream anywhere past the magic must either still
    parse (a cut at the trailer is a valid shorter stream) or raise
    ValueError/NotImplementedError — the error types ``_decode_any``'s stub
    fallback catches. IndexError/struct.error would escape it and kill a
    whole mapInPandas batch on one malformed blob (r5 ADVICE)."""
    from emr_with_custom_metrics_spark.llm.gif import decode_gif, encode_gif

    w, h, a = img
    payload = encode_gif(w, h, a)
    truncated = payload[: min(cut, len(payload) - 1)]
    try:
        decode_gif(truncated)
    except (ValueError, NotImplementedError):
        pass


def test_jpeg_non_interleaved_subsampled_scan_raises_nie():
    """A baseline stream whose subsampled component arrives in its own
    single-component scan walks a different (non-MCU-padded) grid per T.81
    §A.2.2 — out of implemented scope, so it must fall to the stub tier
    via NotImplementedError instead of mis-decoding (r5 ADVICE). Built by
    rewriting an interleaved 4:2:0 stream's SOS header to ns=1 over the
    2x2-sampled luma component; the guard fires before any entropy read."""
    import pytest

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    rgb = np.full((16, 16, 3), 120, dtype=np.uint8)
    payload = encode_jpeg(16, 16, rgb, sampling=(2, 2))
    sos = payload.index(b"\xff\xda")
    luma_id, luma_tdta = payload[sos + 5], payload[sos + 6]
    single = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, luma_id, luma_tdta, 0x00, 0x3F, 0x00])
    spliced = payload[:sos] + single + payload[sos + 14 :]
    with pytest.raises(NotImplementedError, match="non-interleaved subsampled"):
        decode_jpeg(spliced)


def test_jpeg_progressive_with_dri_raises_nie():
    """SOF2 + DRI is out of scope (the progressive AC path has no RSTn
    handling): the decoder must say so at SOS time instead of dying
    mid-scan with a corrupt-data ValueError (r5 ADVICE)."""
    import pytest

    from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg, encode_jpeg

    payload = encode_jpeg(16, 16, np.full((16, 16), 100, np.uint8), progressive=True)
    sos = payload.index(b"\xff\xda")
    spliced = payload[:sos] + b"\xff\xdd\x00\x04\x00\x04" + payload[sos:]
    with pytest.raises(NotImplementedError, match="restart intervals"):
        decode_jpeg(spliced)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([44100, 48000, 32000]),
    st.integers(min_value=2, max_value=5),
)
def test_mpeg1_tone_roundtrip_snr(seed, fs, n_frames):
    """Layer I-shaped encode→decode must reconstruct band-limited tone
    mixes at ≥ 40 dB SNR (interior samples; the lapped-transform edges
    lack overlap partners). Fixed static allocation, so this bound holds
    for ANY tone mix the generator draws — no psychoacoustic tuning."""
    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        FRAME_SAMPLES,
        decode_mpeg1_layer1,
        encode_mpeg1_layer1,
    )

    rng = np.random.default_rng(seed)
    n = FRAME_SAMPLES * n_frames
    t = np.arange(n)
    x = np.zeros(n)
    for _ in range(int(rng.integers(1, 4))):
        f = float(rng.uniform(100, 0.04 * fs))
        x += float(rng.uniform(0.05, 0.4)) * np.sin(2 * np.pi * f * t / fs + float(rng.uniform(0, 6.28)))
    m = decode_mpeg1_layer1(encode_mpeg1_layer1(x, fs))
    y = m["samples"]
    xi, yi = x[32:-32], y[32:-32]
    snr = 10 * np.log10(np.sum(xi * xi) / max(np.sum((xi - yi) ** 2), 1e-300))
    assert snr >= 40.0, snr
    assert m["n_frames"] == n_frames and m["n_samples"] == n


def test_mpeg1_filterbank_is_exact_pr():
    """With quantization bypassed, analysis→synthesis is the identity to
    fp precision — the property the ISO pseudo-QMF only approximates and
    this module's MDCT bank guarantees (module docstring scope)."""
    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        mdct_analysis,
        mdct_synthesis,
    )

    rng = np.random.default_rng(3)
    x = rng.standard_normal(32 * 60)
    y = mdct_synthesis(mdct_analysis(x))
    err = x[32:-32] - y[32:-32]
    snr = 10 * np.log10(np.sum(x[32:-32] ** 2) / max(np.sum(err**2), 1e-300))
    assert snr > 250.0, snr


def test_pqmf_prototype_properties():
    """The in-code near-PR prototype must actually meet the design spec
    the banner claims: linear phase (symmetric taps), Table-C-class
    stopband (< -96 dB), band-overlap power flatness (< 2e-3), and the
    (-1)^(i//64) sign pattern the Z-fold requires (the structural fact
    that explains Table C's alternating sign groups)."""
    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        _PQMF_C,
        _PQMF_SIGN,
        _PQMF_TAPS,
        _pqmf_prototype,
    )

    p = _pqmf_prototype()
    assert np.allclose(p, p[::-1])  # linear phase
    assert np.allclose(_PQMF_C, p * _PQMF_SIGN)
    n = np.arange(_PQMF_TAPS)
    # stopband: beyond 1.5x the band spacing
    grid = np.linspace(1.5 / 32, 0.5, 300)
    Hs = np.abs(np.exp(-2j * np.pi * grid[:, None] * n) @ p)
    assert 20 * np.log10(Hs.max() / np.abs(p.sum())) < -96.0
    # near-PR: |H(f)|^2 + |H(1/64 - f)|^2 flat across the band overlap
    g = np.linspace(0.0, 1.0 / 128, 64)
    H1 = np.abs(np.exp(-2j * np.pi * g[:, None] * n) @ p)
    H2 = np.abs(np.exp(-2j * np.pi * (1.0 / 64 - g)[:, None] * n) @ p)
    G = H1**2 + H2**2
    assert np.max(np.abs(G / G[0] - 1.0)) < 2e-3


def test_pqmf_chain_near_pr_and_alias_cancellation():
    """§2.4.3.2 machinery end-to-end: unit gain (the 1/4 structural gain
    is calibrated into D), >30 dB broadband SNR at the documented 481-
    sample delay, and >40 dB on a tone AT a band edge — the case where
    both straddling subbands carry energy and only the cosine-modulated
    phase relationship cancels the aliasing (a wrong sign pattern or a
    wrong U-mapping fails this loudly, measured ~12 dB)."""
    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        _PQMF_DELAY,
        pqmf_analysis,
        pqmf_synthesis,
    )

    rng = np.random.default_rng(3)
    x = rng.standard_normal(32 * 500) * 0.2
    y = pqmf_synthesis(pqmf_analysis(x))
    a, b = x[: len(x) - _PQMF_DELAY], y[_PQMF_DELAY:]
    gain = float(a @ b) / float(a @ a)
    assert abs(gain - 1.0) < 0.01, gain
    err = b - a
    assert 10 * np.log10((a @ a) / (err @ err)) > 30.0

    t = np.arange(32 * 500)
    tone = 0.5 * np.sin(2 * np.pi * (1.0 / 64.0) * t)  # exactly at edge
    y = pqmf_synthesis(pqmf_analysis(tone))
    a, b = tone[1000 : len(tone) - _PQMF_DELAY], y[1000 + _PQMF_DELAY :]
    err = b - a
    assert 10 * np.log10((a @ a) / (err @ err)) > 40.0


def test_layer1_pqmf_codec_roundtrip_and_signature():
    """filterbank='pqmf' encodes through the real polyphase flow, marks
    the copyright bit, decodes back through the V-FIFO synthesis with
    >25 dB SNR, and is deterministic; the default path is unchanged
    (codec name 'mpeg1-layer1-mdct'); a mid-stream signature flip is a
    corrupt stream, not a silent filterbank switch."""
    import pytest

    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        FRAME_BYTES,
        FRAME_SAMPLES,
        _PQMF_DELAY,
        decode_mpeg1_layer1,
        encode_mpeg1_layer1,
    )

    fs = 32000
    t = np.arange(FRAME_SAMPLES * 20)
    x = 0.5 * np.sin(2 * np.pi * 440 * t / fs) + 0.2 * np.sin(
        2 * np.pi * 3000 * t / fs
    )
    enc = encode_mpeg1_layer1(x, fs, filterbank="pqmf")
    assert enc == encode_mpeg1_layer1(x, fs, filterbank="pqmf")
    dec = decode_mpeg1_layer1(enc)
    assert dec["codec"] == "mpeg1-layer1-pqmf"
    y = dec["samples"]
    a, b = x[1000 : len(y) - _PQMF_DELAY], y[1000 + _PQMF_DELAY :]
    err = b - a
    assert 10 * np.log10((a @ a) / (err @ err)) > 25.0

    assert decode_mpeg1_layer1(encode_mpeg1_layer1(x, fs))["codec"] == (
        "mpeg1-layer1-mdct"
    )

    # flip the second frame's copyright bit (byte 3, bit 3 of its header)
    mixed = bytearray(enc)
    mixed[FRAME_BYTES + 3] ^= 0x08
    with pytest.raises(ValueError, match="signature changes"):
        decode_mpeg1_layer1(bytes(mixed))


def test_mpeg1_stream_contract():
    """Constant frame size; truncation → ValueError; foreign layouts →
    NotImplementedError naming the unsupported feature."""
    import pytest

    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        FRAME_BYTES,
        FRAME_SAMPLES,
        decode_mpeg1_layer1,
        encode_mpeg1_layer1,
    )

    fs = 44100
    t = np.arange(FRAME_SAMPLES * 3)
    payload = encode_mpeg1_layer1(0.4 * np.sin(2 * np.pi * 500 * t / fs), fs)
    assert len(payload) == 3 * FRAME_BYTES

    with pytest.raises(ValueError, match="truncated"):
        decode_mpeg1_layer1(payload[: FRAME_BYTES + 100])

    # flip private_bit (bit 23 of the 32-bit header = byte 2, bit 0):
    # an ISO Table-C prototype stream must fall to the stub tier
    iso = bytearray(payload)
    iso[2] &= 0xFE
    with pytest.raises(NotImplementedError, match="Table-C prototype"):
        decode_mpeg1_layer1(bytes(iso))

    # rewrite layer field (bits 13-14 = byte 1, bits 1-2) to Layer III (01)
    l3 = bytearray(payload)
    l3[1] = (l3[1] & 0xF9) | 0x02
    with pytest.raises(NotImplementedError, match="Layer III"):
        decode_mpeg1_layer1(bytes(l3))

    with pytest.raises(ValueError):
        decode_mpeg1_layer1(b"\x00\x01")


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_avi_rle8_delta_roundtrip_lossless(seed):
    """BI_RLE8 temporal coding is lossless: random keyframe + random rect
    updates reconstruct EVERY frame exactly through the persistent-canvas
    replay, whatever run/skip structure the diffs produce."""
    from emr_with_custom_metrics_spark.llm.avi import (
        decode_avi_rle,
        encode_avi_rle_delta,
    )

    rng = np.random.default_rng(seed)
    h = int(rng.integers(4, 24))
    w = int(rng.integers(4, 48))
    n = int(rng.integers(2, 8))
    frames = np.zeros((n, h, w), dtype=np.uint8)
    frames[0] = rng.integers(0, 256, (h, w))
    for k in range(1, n):
        frames[k] = frames[k - 1]
        if rng.random() < 0.85:  # some frames are pure repeats (all-skip)
            r0 = int(rng.integers(0, h))
            c0 = int(rng.integers(0, w))
            r1 = int(rng.integers(r0 + 1, h + 1))
            c1 = int(rng.integers(c0 + 1, w + 1))
            frames[k, r0:r1, c0:c1] = int(rng.integers(0, 256))
    m = decode_avi_rle(encode_avi_rle_delta(frames))
    assert m["frame_sums"] == [int(f.sum()) for f in frames]
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, n)


def test_avi_rle8_truncation_raises_valueerror():
    from emr_with_custom_metrics_spark.llm.avi import (
        decode_avi_rle,
        encode_avi_rle_delta,
        rle8_apply,
    )
    import pytest

    frames = np.arange(2 * 8 * 16, dtype=np.uint8).reshape(2, 8, 16) % 251
    payload = encode_avi_rle_delta(frames)
    with pytest.raises(ValueError):
        decode_avi_rle(payload[:-10])  # size-field mismatch
    canvas = np.zeros((8, 16), dtype=np.uint8)
    with pytest.raises(ValueError, match="end-of-bitmap"):
        rle8_apply(b"\x03\x07", canvas)  # run then stream just stops


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([44100, 48000, 32000]),
    st.integers(min_value=1, max_value=3),
)
def test_mpeg1_layer2_tone_roundtrip_snr(seed, fs, n_frames):
    """Layer II round trip: ≥ 45 dB on tone mixes (the 3-scalefactor
    frames track amplitude 3x finer than Layer I). White noise is NOT in
    this bound — the 3-level top bands quantize broadband content at
    ~1.6 bits, the codec's documented trade."""
    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        L2_FRAME_SAMPLES,
        decode_mpeg1_layer2,
        encode_mpeg1_layer2,
    )

    rng = np.random.default_rng(seed)
    n = L2_FRAME_SAMPLES * n_frames
    t = np.arange(n)
    x = np.zeros(n)
    for _ in range(int(rng.integers(1, 4))):
        f = float(rng.uniform(100, 0.04 * fs))
        x += float(rng.uniform(0.05, 0.4)) * np.sin(
            2 * np.pi * f * t / fs + float(rng.uniform(0, 6.28))
        )
    m = decode_mpeg1_layer2(encode_mpeg1_layer2(x, fs))
    y = m["samples"]
    xi, yi = x[32:-32], y[32:-32]
    snr = 10 * np.log10(np.sum(xi * xi) / max(np.sum((xi - yi) ** 2), 1e-300))
    assert snr >= 45.0, snr
    assert m["n_frames"] == n_frames and m["layer"] == 2


def test_mpeg1_layer_cross_rejection():
    """Each layer's decoder names a foreign layer explicitly instead of
    mis-parsing its field layout."""
    import pytest

    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        FRAME_SAMPLES,
        L2_FRAME_SAMPLES,
        decode_mpeg1_layer1,
        decode_mpeg1_layer2,
        encode_mpeg1_layer1,
        encode_mpeg1_layer2,
    )

    tone = lambda n, fs: 0.4 * np.sin(2 * np.pi * 500 * np.arange(n) / fs)  # noqa: E731
    l1 = encode_mpeg1_layer1(tone(FRAME_SAMPLES, 44100), 44100)
    l2 = encode_mpeg1_layer2(tone(L2_FRAME_SAMPLES, 44100), 44100)
    with pytest.raises(NotImplementedError, match="Layer II stream"):
        decode_mpeg1_layer1(l2)
    with pytest.raises(NotImplementedError, match="Layer I stream"):
        decode_mpeg1_layer2(l1)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 5)), min_size=1, max_size=500
    )
)
def test_mq_coder_roundtrip(stream):
    """The raw MQ-family coder inverts exactly for ANY decision/context
    sequence — the foundation invariant under the arithmetic JPEG tier."""
    from emr_with_custom_metrics_spark.llm.jpeg_arith import (
        _Contexts,
        _MQDecoder,
        _MQEncoder,
    )

    enc, cxe = _MQEncoder(), _Contexts()
    for bit, cid in stream:
        enc.encode(bit, cxe.get(("t", cid)))
    data = enc.flush()
    dec, cxd = _MQDecoder(data), _Contexts()
    got = [dec.decode(cxd.get(("t", cid))) for _, cid in stream]
    assert got == [b for b, _ in stream]


@settings(max_examples=40, deadline=None)
@given(gray_images(max_side=32))
def test_jpeg_arithmetic_equals_huffman(img):
    """Same DCT/quant pipeline, two lossless entropy layers: SOF9
    arithmetic decode must reproduce the SOF0 Huffman decode exactly, for
    every image — a whole-pipeline equality, not a tolerance."""
    from emr_with_custom_metrics_spark.llm import jpeg as J
    from emr_with_custom_metrics_spark.llm.jpeg_arith import (
        decode_jpeg_arithmetic,
        encode_jpeg_arithmetic,
    )

    w, h, arr = img
    da = decode_jpeg_arithmetic(encode_jpeg_arithmetic(w, h, arr))
    dh = J.decode_jpeg(J.encode_jpeg(w, h, arr))
    assert da["mean_byte"] == dh["mean_byte"]
    assert (da["width"], da["height"]) == (dh["width"], dh["height"])


def test_jpeg_arithmetic_foreign_stream_falls_to_stub():
    """An SOF9 stream WITHOUT this engine's COM tag must raise
    NotImplementedError (the honesty boundary), both directly and through
    the multimodal dispatch."""
    import pytest

    from emr_with_custom_metrics_spark.llm import jpeg_arith as JA
    from emr_with_custom_metrics_spark.llm.multimodal import _decode_any, decode_image

    p = JA.encode_jpeg_arithmetic(8, 8, 100)
    com = (
        b"\xff\xfe"
        + (len(JA.COM_TAG) + 2).to_bytes(2, "big")
        + JA.COM_TAG
    )
    assert com in p
    foreign = p.replace(com, b"")
    with pytest.raises(NotImplementedError):
        JA.decode_jpeg_arithmetic(foreign)
    with pytest.raises(NotImplementedError):
        decode_image(foreign)
    # the tiered dispatch sends the foreign stream to the deterministic
    # stub decoder, while the tagged stream decodes for real
    from emr_with_custom_metrics_spark.llm.multimodal import fake_decode_image

    assert _decode_any(foreign) == fake_decode_image(foreign)
    assert _decode_any(p)[:2] == (8, 8)


def test_jpeg_arithmetic_compresses_better_on_flat_content():
    """Adaptive arithmetic coding's raison d'etre: on highly-predictable
    content the adaptive coder beats the fixed Huffman tables."""
    from emr_with_custom_metrics_spark.llm import jpeg as J
    from emr_with_custom_metrics_spark.llm.jpeg_arith import encode_jpeg_arithmetic

    pa = encode_jpeg_arithmetic(64, 64, 128)
    ph = J.encode_jpeg(64, 64, 128)
    # compare entropy payloads net of fixed headers (Huffman carries DHT)
    assert len(pa) < len(ph)


def _parse_p_frame_mvs(data: bytes, w: int, h: int):
    """Walk a P-frame payload and return the per-MB motion vectors
    (skipping coded blocks properly)."""
    import struct as st

    from emr_with_custom_metrics_spark.llm.video_mc import _read_block

    assert data[0:1] == b"P"
    pos = 1
    mvs = {}
    ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
    for my in range(0, ph, 16):
        for mx in range(0, pw, 16):
            dx, dy = st.unpack_from("<bb", data, pos)
            pos += 2
            cbp = data[pos]
            pos += 1
            for bi in range(4):
                if cbp & (1 << bi):
                    _, pos = _read_block(data, pos)
            mvs[(mx, my)] = (dx, dy, cbp)
    assert pos == len(data)
    return mvs


def test_video_mc_recovers_planted_translation():
    """A textured patch translated by a known (dx, dy) must be recovered
    EXACTLY by the motion search for every macroblock fully inside the
    patch — with zero residual (cbp == 0)."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.video_mc import _encode_frame

    rng = np.random.default_rng(11)
    for dx0, dy0 in ((5, 3), (-7, 2), (8, -8), (0, 6)):
        prev = np.full((112, 128), 100.0)
        tex = rng.integers(0, 256, (80, 96)).astype(np.float64)
        prev[16:96, 16:112] = tex
        cur = np.full((112, 128), 100.0)
        cur[16 + dy0 : 96 + dy0, 16 + dx0 : 112 + dx0] = tex
        data = _encode_frame(cur.astype(np.uint8), prev)
        mvs = _parse_p_frame_mvs(data, 128, 112)
        # MBs fully inside the moved patch (1-MB margin from its border)
        inner = [(mx, my) for (mx, my) in mvs
                 if 16 + dx0 + 16 <= mx and mx + 32 <= 112 + dx0
                 and 16 + dy0 + 16 <= my and my + 32 <= 96 + dy0]
        assert inner, (dx0, dy0)
        for key in inner:
            dx, dy, cbp = mvs[key]
            assert (dx, dy) == (-dx0, -dy0) or cbp == 0, (key, mvs[key])
            assert cbp == 0, (key, mvs[key])


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_video_mc_flat_even_videos_are_exact(seed):
    """Any video of 8-aligned even-level rectangles round-trips with exact
    per-frame means (the flat-block contract), whatever motion occurs."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.video_mc import (
        decode_video_mc,
        encode_video_mc,
    )

    rng = np.random.default_rng(seed)
    w, h, k = 48, 32, 3
    fr = np.full((k, h, w), int(rng.integers(0, 128)) * 2, dtype=np.uint8)
    for i in range(k):
        for _ in range(int(rng.integers(1, 4))):
            x, y = 8 * int(rng.integers(0, w // 8 - 1)), 8 * int(rng.integers(0, h // 8 - 1))
            fr[i, y : y + 8, x : x + 8] = int(rng.integers(0, 128)) * 2
    d = decode_video_mc(encode_video_mc(fr))
    assert d["frame_means"] == [float(f.mean()) for f in fr.astype(np.float64)]
    assert d["n_frames"] == k and d["n_p_frames"] == k - 1


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_video_mc_lossy_content_bounded_error(seed):
    """General random content is lossy (quantized residuals) but bounded:
    closed-loop prediction means NO drift — late frames are no worse than
    the intra frame's own quantization error envelope."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.video_mc import (
        decode_video_mc,
        encode_video_mc,
        _decode_frame,
    )

    rng = np.random.default_rng(seed)
    w, h, k = 48, 32, 4
    base = rng.integers(40, 216, (h, w)).astype(np.int16)
    fr = np.stack([np.clip(base + rng.integers(-8, 9, (h, w)), 0, 255)
                   for _ in range(k)]).astype(np.uint8)
    d = decode_video_mc(encode_video_mc(fr))
    for i in range(k):
        assert abs(d["frame_means"][i] - float(fr[i].mean())) < 6.0, (i, d["frame_means"][i])


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(0, 25))
def test_phash_brightness_invariance_and_sensitivity(seed, shift4):
    """pHash is exactly invariant to uniform brightness (DC-only change)
    and sensitive to actual content change (different random image)."""
    from emr_with_custom_metrics_spark.llm.multimodal import phash64

    rng = np.random.default_rng(seed)
    img = rng.integers(30, 131, (32, 32))
    shifted = (img + shift4 * 4).astype(np.uint8)
    assert phash64(img.astype(np.uint8)) == phash64(shifted)
    other = np.random.default_rng(seed + 1).integers(30, 131, (32, 32))
    assert phash64(img.astype(np.uint8)) != phash64(other.astype(np.uint8))


@settings(max_examples=12, deadline=None)
@given(st.integers(0, 2**31 - 1), st.sampled_from([44100, 48000, 32000]))
def test_mpeg1_layer3_tone_roundtrip_snr(seed, fs):
    """Layer III-shaped hybrid codec: tones round-trip at >= 45 dB away
    from the lapped-transform stream edges (the 9/7/5-bit power-law
    quantizer's envelope, measured ~53 dB)."""
    from emr_with_custom_metrics_spark.llm import mpeg_audio as M

    rng = np.random.default_rng(seed)
    freq = float(rng.uniform(120.0, 3000.0))
    amp = float(rng.uniform(0.1, 0.8))
    n = 6 * M.L3_FRAME_SAMPLES
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * freq * t / fs)
    d = M.decode_mpeg1_layer3(M.encode_mpeg1_layer3(x, fs))
    y = d["samples"][:n]
    sl = slice(M.L3_FRAME_SAMPLES, n - M.L3_FRAME_SAMPLES)
    err = y[sl] - x[sl]
    snr = 10 * np.log10(np.mean(x[sl] ** 2) / max(np.mean(err ** 2), 1e-300))
    assert snr >= 45.0, (freq, amp, fs, snr)
    assert d["layer"] == 3 and d["n_frames"] == 6


def test_mpeg1_hybrid_filterbank_is_exact_pr():
    """The two-stage (32-band x 18-line) hybrid filterbank reconstructs
    random signals exactly (>= 200 dB) away from stream edges with
    quantization bypassed — the property that makes the quantizer the
    only loss source."""
    from emr_with_custom_metrics_spark.llm import mpeg_audio as M

    rng = np.random.default_rng(5)
    x = rng.uniform(-0.5, 0.5, 8 * M.L3_FRAME_SAMPLES)
    S = M.mdct_analysis(x)
    lines = np.stack([M._mdct18_analysis(S[:, sb]) for sb in range(32)], axis=1)
    S2 = np.stack([M._mdct18_synthesis(lines[:, sb, :]) for sb in range(32)], axis=1)
    y = M.mdct_synthesis(S2)
    sl = slice(M.L3_FRAME_SAMPLES, len(x) - M.L3_FRAME_SAMPLES)
    err = y[sl] - x[sl]
    snr = 10 * np.log10(np.mean(x[sl] ** 2) / np.mean(err ** 2))
    assert snr >= 200.0, snr


def test_mpeg1_layer3_cross_rejection_and_boundary():
    """The layer field routes every decoder pair to NotImplementedError,
    and a private_bit=0 (true ISO) L3 stream falls to the stub tier."""
    import pytest

    from emr_with_custom_metrics_spark.llm import mpeg_audio as M

    x = 0.3 * np.sin(2 * np.pi * 440 * np.arange(M.L3_FRAME_SAMPLES) / 44100)
    p3 = M.encode_mpeg1_layer3(x, 44100)
    for dec in (M.decode_mpeg1_layer1, M.decode_mpeg1_layer2):
        with pytest.raises(NotImplementedError):
            dec(p3)
    # flip the private bit (bit 23 of the 32-bit header) -> ISO stream
    b = bytearray(p3)
    b[2] ^= 0x01  # header byte 2 bit0 = private_bit
    with pytest.raises(NotImplementedError):
        M.decode_mpeg1_layer3(bytes(b))


# ---------------------------------------------------------------------------
# FLAC (subset) lossless codec (llm/flac.py)
# ---------------------------------------------------------------------------
@settings(max_examples=40, deadline=None)
@given(
    x=st.lists(st.integers(-32768, 32767), min_size=1, max_size=600),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
)
def test_flac_roundtrip_is_lossless(x, rate):
    from emr_with_custom_metrics_spark.llm.flac import decode_flac, encode_flac

    sig = np.array(x, dtype=np.int16)
    meta = decode_flac(encode_flac(sig, rate))
    assert meta["sample_rate"] == rate
    assert np.array_equal(meta["samples"], sig)


def test_flac_block_boundary_lengths_and_compression():
    """Lengths straddling the 4096 block boundary roundtrip exactly, and
    predictable content (ramps/sines) actually compresses — a Rice coder
    that silently fell back to verbatim everywhere would pass roundtrip
    tests while compressing nothing."""
    from emr_with_custom_metrics_spark.llm.flac import decode_flac, encode_flac

    for n in (4095, 4096, 4097, 8192, 8193):
        sig = (np.arange(n, dtype=np.int64) * 7 % 4001 - 2000).astype(np.int16)
        enc = encode_flac(sig, 44100)
        meta = decode_flac(enc)
        assert np.array_equal(meta["samples"], sig)
        assert meta["n_frames"] == -(-n // 4096)
        assert len(enc) < 0.5 * 2 * n  # ramps must beat raw PCM by 2x+

    tone = (5000 * np.sin(np.arange(6000) * 0.02)).astype(np.int16)
    assert len(encode_flac(tone, 44100)) < 0.35 * 2 * len(tone)


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(0, 10_000), cut=st.floats(0.3, 0.99))
def test_flac_corruption_is_detected(seed, cut):
    """Flipping any byte of the frame payload must raise (CRC-8, CRC-16,
    MD5, or a structural ValueError) — never return wrong samples."""
    from emr_with_custom_metrics_spark.llm.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    sig = rng.integers(-3000, 3000, 900).astype(np.int16)
    enc = bytearray(encode_flac(sig, 44100))
    pos = 4 + 4 + 34 + int((len(enc) - 42) * cut)  # inside frame data
    enc[min(pos, len(enc) - 1)] ^= 0x55
    try:
        meta = decode_flac(bytes(enc))
        # A flip that lands in zero-padding of the last byte can decode;
        # then the samples MUST still be exact (integrity held by MD5).
        assert np.array_equal(meta["samples"], sig)
    except (ValueError, NotImplementedError):
        pass


def test_flac_unsupported_features_fall_to_stub():
    """Foreign conformant features beyond the subset (>2 channels) raise
    NotImplementedError — the multimodal dispatch stub contract — not a
    mis-decode. (Stereo and LPC graduated from this list in round 6.)"""
    import pytest

    from emr_with_custom_metrics_spark.llm.flac import decode_flac, encode_flac

    sig = np.arange(100, dtype=np.int16)
    enc = bytearray(encode_flac(sig, 44100))
    # STREAMINFO channels field: channels-1 sits in bits [100:103] of
    # STREAMINFO → byte 12 of the 34-byte block (stream offset 8 + 12),
    # bits 4-6 (mask 0x0E).
    enc[8 + 12] |= 0x04  # channels-1: 0 -> 2 (3 channels)
    with pytest.raises(NotImplementedError, match="multi-channel"):
        decode_flac(bytes(enc))


# ---------------------------------------------------------------------------
# FLAC round-6 additions: LPC subframes + stereo decorrelation
# ---------------------------------------------------------------------------
@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 100_000),
    n=st.integers(1, 700),
    mode=st.sampled_from(["independent", "left_side", "right_side", "mid_side", "auto"]),
)
def test_flac_stereo_roundtrip_all_modes(seed, n, mode):
    """Every channel assignment must reconstruct both channels bit-exactly
    on arbitrary int16 content — including full-range values where the
    17-bit side channel and the mid/side parity identity are actually
    exercised."""
    from emr_with_custom_metrics_spark.llm.flac import decode_flac, encode_flac_stereo

    rng = np.random.default_rng(seed)
    left = rng.integers(-32768, 32768, n).astype(np.int16)
    right = rng.integers(-32768, 32768, n).astype(np.int16)
    meta = decode_flac(encode_flac_stereo(left, right, 44100, mode))
    assert meta["n_channels"] == 2
    assert np.array_equal(meta["samples"][:, 0], left)
    assert np.array_equal(meta["samples"][:, 1], right)
    if mode != "auto":
        assert meta["mode"] == mode


def test_flac_lpc_engages_and_stereo_decorrelation_compresses():
    """The LPC path must actually WIN on strongly autocorrelated content
    (else the subframe chooser silently degenerates to FIXED and the LPC
    decode path goes untested), and a correlated stereo pair must encode
    smaller under side-channel coding than under independent L/R."""
    from emr_with_custom_metrics_spark.llm.flac import (
        decode_flac,
        encode_flac,
        encode_flac_stereo,
    )

    # Period-7 content: an order-8 LPC fit captures x[t] ~= x[t-7] exactly,
    # while FIXED (order <= 4 differencing) sees a large sawtooth residual —
    # LPC must win the cost comparison here or the chooser is broken.
    saw = ((np.arange(9000) % 7) * 800 - 2400).astype(np.int16)
    meta = decode_flac(encode_flac(saw, 44100))
    assert np.array_equal(meta["samples"], saw)
    assert meta["subframe_types"].get("lpc", 0) > 0

    n = 9000
    left = ((3 * np.arange(n) + 5) % 4001 - 2000).astype(np.int16)
    right = (left + (np.arange(n) % 7) - 3).astype(np.int16)
    sizes = {
        m: len(encode_flac_stereo(left, right, 48000, m))
        for m in ("independent", "left_side", "auto")
    }
    assert sizes["left_side"] < sizes["independent"]
    # auto must pick something at least as small as the best forced mode
    assert sizes["auto"] <= sizes["left_side"]


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000), cut=st.floats(0.3, 0.99))
def test_flac_stereo_corruption_is_detected(seed, cut):
    """Byte flips in stereo/LPC frames must raise or still decode exactly
    (MD5 backstop) — never return wrong samples."""
    from emr_with_custom_metrics_spark.llm.flac import decode_flac, encode_flac_stereo

    rng = np.random.default_rng(seed)
    left = rng.integers(-3000, 3000, 700).astype(np.int16)
    right = (left + rng.integers(-5, 6, 700)).astype(np.int16)
    enc = bytearray(encode_flac_stereo(left, right, 44100, "auto"))
    pos = 4 + 4 + 34 + int((len(enc) - 42) * cut)
    enc[min(pos, len(enc) - 1)] ^= 0x55
    try:
        meta = decode_flac(bytes(enc))
        assert np.array_equal(meta["samples"][:, 0], left)
        assert np.array_equal(meta["samples"][:, 1], right)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=20, deadline=None)
@given(img=st.integers(0, 10_000))
def test_gif_interlace_roundtrip_exact_pixels(img):
    """Interlaced encode -> decode must reproduce the EXACT pixel array
    (mean-based checks are permutation-blind; only per-pixel equality
    catches a wrong 4-pass row schedule)."""
    from emr_with_custom_metrics_spark.llm.gif import decode_gif, encode_gif

    rng = np.random.default_rng(img)
    h = int(rng.integers(1, 40))
    w = int(rng.integers(1, 20))
    px = rng.integers(0, 256, (h, w)).astype(np.uint8)
    for inter in (False, True):
        meta = decode_gif(encode_gif(w, h, px, interlaced=inter), return_pixels=True)
        assert np.array_equal(meta["pixels"][0], px), (h, w, inter)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_gif_local_color_table_overrides_global(seed):
    """Frames with a local color table must map through IT (non-identity
    inverse palette), while LCT-less frames in the same stream keep the
    global grayscale table — exact per-frame means prove which table was
    used."""
    from emr_with_custom_metrics_spark.llm.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    n, h, w = 3, int(rng.integers(1, 12)), int(rng.integers(1, 10))
    idx = rng.integers(0, 256, (n, h, w)).astype(np.uint8)
    inv = np.stack([255 - np.arange(256)] * 3, axis=1).astype(np.uint8)
    meta = decode_gif(
        encode_gif(w, h, idx, local_palettes=[inv, None, inv]), return_pixels=True
    )
    for f in range(n):
        assert np.array_equal(meta["pixels"][f], idx[f])
        table = inv if f != 1 else np.stack([np.arange(256)] * 3, axis=1)
        assert abs(meta["frame_means"][f] - table[idx[f]].mean()) < 1e-9


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_png_adam7_roundtrip_exact_pixels(seed):
    """Adam7 encode -> decode reproduces the exact pixel array for random
    content and dimensions (incl. dims smaller than the 8x8 pass grid,
    where several passes are empty), and composes with the palette path."""
    from emr_with_custom_metrics_spark.llm.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 30))
    w = int(rng.integers(1, 30))
    px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    m = decode_png(encode_png(w, h, 0, pixels=px, interlace=True), return_pixels=True)
    assert np.array_equal(m["pixels"], px), (h, w)
    pal = np.stack([(np.arange(256) * 7) % 256] * 3, axis=1).astype(np.uint8)
    idx = rng.integers(0, 256, (h, w)).astype(np.uint8)
    m2 = decode_png(
        encode_png(w, h, 0, pixels=idx, palette=pal, interlace=True),
        return_pixels=True,
    )
    assert np.array_equal(m2["pixels"], pal[idx]), (h, w)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 10_000))
def test_png_16bit_roundtrip_exact(seed):
    """16-bit RGB PNG roundtrips bit-exact in both interlace modes — the
    filter byte-offset (6 bytes/pixel) and the big-endian sample split
    are the two things a depth-16 implementation can get wrong."""
    from emr_with_custom_metrics_spark.llm.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 20))
    w = int(rng.integers(1, 20))
    px = rng.integers(0, 65536, (h, w, 3)).astype(np.uint16)
    for inter in (False, True):
        m = decode_png(
            encode_png(w, h, 0, pixels=px, depth16=True, interlace=inter),
            return_pixels=True,
        )
        assert np.array_equal(m["pixels"], px), (h, w, inter)


# ---------------------------------------------------------------------------
# PDF 1.4 subset writer/extractor (llm/pdf.py)
# ---------------------------------------------------------------------------
@settings(max_examples=40, deadline=None)
@given(
    pages=st.lists(
        st.text(
            # latin-1-safe printable range incl. the three escape chars
            st.characters(min_codepoint=0x20, max_codepoint=0xFF),
            max_size=120,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_pdf_roundtrip_recovers_exact_page_text(pages):
    from emr_with_custom_metrics_spark.llm.pdf import encode_pdf, extract_pdf_text

    meta = extract_pdf_text(encode_pdf(pages))
    assert meta["n_pages"] == len(pages)
    assert meta["pages"] == pages


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    frac=st.floats(0.05, 0.98),
    xor=st.integers(1, 255),
)
@example(seed=0, frac=0.3046875, xor=0x41)  # r6: flip lands in '/Filter' key
def test_pdf_corruption_raises_never_misreads(seed, frac, xor):
    """A byte flip anywhere (ANY xor value — digit-to-digit ref flips
    included, which redirect one page onto another's content stream)
    must either still extract the exact text (flip landed in slack like
    the binary comment line) or raise — the verified xref offsets,
    /Length framing, stream-dict key allowlist, zlib adler-32 over every
    content stream, the page-tree cycle / /Count / content-distinctness
    checks, and the tokenizer's dangling-operand / zero-show-text
    refusals are the integrity surface. KeyError is deliberately NOT
    tolerated: corrupt structure must surface as ValueError (r6 ADVICE,
    llm/pdf.py _req)."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.pdf import encode_pdf, extract_pdf_text

    rng = np.random.default_rng(seed)
    pages = ["alpha beta (gamma)", "delta \\ epsilon", "zeta"]
    pdf = bytearray(encode_pdf(pages))
    pos = int(len(pdf) * frac)
    pdf[pos] ^= xor
    try:
        meta = extract_pdf_text(bytes(pdf))
        assert meta["pages"] == pages
    except (ValueError, NotImplementedError):
        pass


def test_pdf_non_latin1_text_falls_to_stub_tier():
    """Octal escapes cover 0-255 only; beyond that is CID-font territory
    and must raise NotImplementedError (stub tier), never
    UnicodeEncodeError inside a mapInPandas batch (r6 ADVICE)."""
    import pytest

    from emr_with_custom_metrics_spark.llm.pdf import encode_pdf

    with pytest.raises(NotImplementedError, match="CID"):
        encode_pdf(["café ok", "€ price"])  # € is U+20AC


def test_pdf_raw_stream_interop_read():
    """The writer now always emits FlateDecode, but raw (no /Filter)
    streams are legal PDF and the reader keeps that path for interop —
    with the documented caveat that raw bodies are unprotected."""
    import re
    import zlib

    from emr_with_custom_metrics_spark.llm.pdf import encode_pdf, extract_pdf_text

    pdf = encode_pdf(["hello raw"])
    # Demote the single content stream to raw: inflate the body and
    # rewrite the dict, then fix the xref/startxref offsets by
    # re-deriving them (the writer's own layout rules).
    m = re.search(
        rb"<< /Length (\d+) /Filter /FlateDecode >>\nstream\n", pdf, re.S
    )
    assert m
    length = int(m.group(1))
    body = pdf[m.end() : m.end() + length]
    content = zlib.decompress(body)
    head_new = f"<< /Length {len(content)} >>".encode()
    rebuilt = (
        pdf[: m.start()] + head_new + b"\nstream\n" + content
        + pdf[m.end() + length :]
    )
    # Offsets after the edited object shift; rebuild xref numbers.
    delta = len(rebuilt) - len(pdf)
    xref_at = rebuilt.rindex(b"xref\n")
    sx = rebuilt.rindex(b"startxref\n")
    old_sx = int(re.match(rb"startxref\n(\d+)", rebuilt[sx:]).group(1))
    rebuilt = (
        rebuilt[:sx]
        + b"startxref\n" + str(old_sx + delta).encode()
        + b"\n%%EOF\n"
    )
    # The only object after the content stream is none (it's last before
    # xref), so per-object offsets are unchanged; only startxref moved.
    meta = extract_pdf_text(bytes(rebuilt))
    assert meta["pages"] == ["hello raw"]


def test_pdf_foreign_features_fall_to_stub():
    import pytest

    from emr_with_custom_metrics_spark.llm.pdf import encode_pdf, extract_pdf_text

    pdf = encode_pdf(["one", "two"])
    with pytest.raises(NotImplementedError, match="filter"):
        extract_pdf_text(pdf.replace(b"/FlateDecode", b"/LZWDecode__", 1))
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pdf_text(pdf.replace(b"/Size", b"/Encrypt 9 0 R /Size", 1))
    with pytest.raises(ValueError):
        extract_pdf_text(b"%PDF-1.4\nnot really")


# ---------------------------------------------------------------------------
# MPEG-1 Layer III Huffman + bit reservoir (llm/mpeg_audio.py, round 7)
# ---------------------------------------------------------------------------
@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    fs=st.sampled_from([44100, 48000, 32000]),
    n_frames=st.integers(1, 6),
)
def test_mp3_huffman_tone_roundtrip_snr(seed, fs, n_frames):
    """The full entropy path — three-region Huffman coding, linbits
    escapes, sign bits, scalefactor transmission, inner/outer rate loops,
    bit-reservoir frame assembly — must round-trip tones at >= 35 dB SNR
    (interior samples; the lapped filterbank edges are excluded)."""
    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        L3_FRAME_SAMPLES,
        decode_mp3_huffman,
        encode_mp3_huffman,
    )

    rng = np.random.default_rng(seed)
    n = L3_FRAME_SAMPLES * n_frames
    t = np.arange(n)
    f0 = float(rng.uniform(100, 3000))
    amp = float(rng.uniform(0.05, 0.9))
    x = amp * np.sin(2 * np.pi * f0 * t / fs)
    payload = encode_mp3_huffman(x, fs)
    m = decode_mp3_huffman(payload)
    assert m["n_frames"] == n_frames
    assert m["sample_rate"] == fs
    y = m["samples"]
    if n_frames >= 3:
        a, b = 1152, n - 1152
        err = x[a:b] - y[a:b]
        snr = 10 * np.log10(np.sum(x[a:b] ** 2) / max(np.sum(err**2), 1e-30))
        assert snr >= 35.0, snr


def test_mp3_huffman_reservoir_backpointers_used():
    """A bursty signal (loud/silent alternation) must actually exercise
    the reservoir: at least one frame's main_data_begin is nonzero, and
    the stream still decodes exactly as laid out."""
    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        L3_FRAME_SAMPLES,
        _BitReader,
        _L3_BITRATES,
        decode_mp3_huffman,
        encode_mp3_huffman,
    )

    fs = 44100
    n = L3_FRAME_SAMPLES * 12
    t = np.arange(n)
    env = ((t // L3_FRAME_SAMPLES) % 2).astype(float)  # alternate frames
    x = 0.7 * env * np.sin(2 * np.pi * 900 * t / fs)
    payload = encode_mp3_huffman(x, fs)
    # walk headers, collect main_data_begin
    begins = []
    pos = 0
    while pos < len(payload):
        r = _BitReader(payload, pos)
        assert r.read(12) == 0xFFF
        r.read(1 + 2 + 1)
        bi = r.read(4)
        rate = {0: 44100, 1: 48000, 2: 32000}[r.read(2)]
        r.read(1 + 1 + 2 + 2 + 1 + 1 + 2)
        begins.append(r.read(9))
        pos += 144_000 * _L3_BITRATES[bi] // rate
    assert any(b > 0 for b in begins), begins
    decode_mp3_huffman(payload)  # must still decode cleanly


def test_mp3_encoder_raises_on_int_scaled_pcm():
    """Round-9 ADVICE regression: absurd-amplitude input (e.g. PCM left
    int16-scaled instead of normalized to [-1, 1]) must raise the
    linbits-ceiling ValueError at gg=255, never spin the inner rate
    loop forever (the loop coarsens global_gain by +4 per pass; at 255
    it can no longer make progress)."""
    import pytest

    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        L3_FRAME_SAMPLES,
        encode_mp3_huffman,
    )

    fs = 44100
    t = np.arange(L3_FRAME_SAMPLES)
    x = 32767.0 * np.sin(2 * np.pi * 500 * t / fs)  # int16 amplitudes
    # either overflow raise is acceptable (linbits ceiling or
    # part2_3_length at gg=255) — the contract is LOUD, not which guard
    with pytest.raises(ValueError, match="255"):
        encode_mp3_huffman(x * 1e4, fs)  # |xs| ~ 4e8 territory
    with pytest.raises(ValueError, match="255"):
        encode_mp3_huffman(x * 1e7, fs)  # past the linbits ceiling too


def test_mp3_huffman_stream_contract():
    """Truncation -> ValueError; foreign layouts -> NotImplementedError
    naming the feature; free-format frames route to the shaped tier;
    true-ISO streams (private_bit=0) stay behind the honesty boundary;
    encoding is deterministic."""
    import pytest

    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        L3_FRAME_SAMPLES,
        decode_mp3_huffman,
        encode_mp3_huffman,
    )

    fs = 44100
    t = np.arange(L3_FRAME_SAMPLES * 3)
    x = 0.4 * np.sin(2 * np.pi * 500 * t / fs)
    payload = encode_mp3_huffman(x, fs)
    assert payload == encode_mp3_huffman(x, fs)  # deterministic

    with pytest.raises(ValueError, match="truncated"):
        decode_mp3_huffman(payload[: len(payload) // 2 + 3])

    iso = bytearray(payload)
    iso[2] &= 0xFE  # private_bit -> 0: claims true ISO Table B.7 stream
    with pytest.raises(NotImplementedError, match="B.7"):
        decode_mp3_huffman(bytes(iso))

    l1 = bytearray(payload)
    l1[1] |= 0x06  # layer field -> 11 (Layer I)
    with pytest.raises(NotImplementedError, match="Layer I"):
        decode_mp3_huffman(bytes(l1))

    free = bytearray(payload)
    free[2] &= 0x0F  # bitrate index -> 0 (free format)
    with pytest.raises(NotImplementedError, match="free-format"):
        decode_mp3_huffman(bytes(free))

    with pytest.raises(ValueError):
        decode_mp3_huffman(b"\x00\x01")


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 10_000), frac=st.floats(0.01, 0.99),
       xor=st.integers(1, 255))
def test_mp3_huffman_corruption_never_crashes_wrongly(seed, frac, xor):
    """Layer III carries no content checksum (a CRC-less ISO stream is
    the same), so a byte flip may legally alter decoded AUDIO — but it
    must never escape the documented error surface: decode either
    returns (possibly different samples) or raises ValueError /
    NotImplementedError. part2_3_length verification, Huffman prefix
    validity, and the side-info range checks are what catch most flips."""
    from emr_with_custom_metrics_spark.llm.mpeg_audio import (
        L3_FRAME_SAMPLES,
        decode_mp3_huffman,
        encode_mp3_huffman,
    )

    rng = np.random.default_rng(seed)
    fs = 44100
    t = np.arange(L3_FRAME_SAMPLES * 3)
    x = 0.5 * np.sin(2 * np.pi * 440 * t / fs)
    payload = bytearray(encode_mp3_huffman(x, fs))
    payload[int(len(payload) * frac)] ^= xor
    try:
        m = decode_mp3_huffman(bytes(payload))
        assert np.all(np.isfinite(m["samples"]))
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=40, deadline=None)
@given(
    pages=st.lists(
        st.text(st.characters(min_codepoint=0x20, max_codepoint=0xFF), max_size=120),
        min_size=1,
        max_size=6,
    )
)
def test_pdf15_roundtrip_recovers_exact_page_text(pages):
    """PDF 1.5 layout (object stream + predicted xref stream) recovers
    the same text the 1.4 writer does, with the 5 + 2n object graph."""
    from emr_with_custom_metrics_spark.llm.pdf import encode_pdf_15, extract_pdf_text

    meta = extract_pdf_text(encode_pdf_15(pages))
    assert meta["n_pages"] == len(pages)
    assert meta["pages"] == pages
    assert meta["n_objects"] == 5 + 2 * len(pages)


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 10_000), frac=st.floats(0.01, 0.99),
       xor=st.integers(1, 255))
def test_pdf15_corruption_raises_never_misreads(seed, frac, xor):
    """Same raises-never-misreads contract on the 1.5 layout: the Flate
    adler-32 now also covers the object stream and the (predicted) xref
    stream binary entries; the objstm header-pair check catches
    redirected compressed objects; 45k-flip soak ran clean offline."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.pdf import encode_pdf_15, extract_pdf_text

    rng = np.random.default_rng(seed)
    pages = ["alpha beta (gamma)", "delta \\ epsilon", "zeta"]
    pdf = bytearray(encode_pdf_15(pages))
    pdf[int(len(pdf) * frac)] ^= xor
    try:
        meta = extract_pdf_text(bytes(pdf))
        assert meta["pages"] == pages
    except (ValueError, NotImplementedError):
        pass


def test_pdf15_png_predictor_all_filter_types():
    """The read-side predictor inverts every PNG row filter (0-4), not
    just the Up rows our writer emits — third-party xref streams mix
    them per row."""
    import numpy as np

    from emr_with_custom_metrics_spark.llm.pdf import _png_unpredict

    rng = np.random.default_rng(3)
    cols = 7
    raw = rng.integers(0, 256, (20, cols)).astype(np.uint8)
    # forward-filter each row with a cycling filter type
    enc = bytearray()
    prev = np.zeros(cols, dtype=np.int64)
    for r, row in enumerate(raw.astype(np.int64)):
        tag = r % 5
        enc.append(tag)
        if tag == 0:
            out = row
        elif tag == 1:
            out = row.copy()
            out[1:] -= row[:-1]
        elif tag == 2:
            out = row - prev
        elif tag == 3:
            left = np.concatenate([[0], row[:-1]])
            out = row - (left + prev) // 2
        else:
            left = np.concatenate([[0], row[:-1]])
            ul = np.concatenate([[0], prev[:-1]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            out = row - pred
        enc += (out % 256).astype(np.uint8).tobytes()
        prev = row
    got = _png_unpredict(bytes(enc), cols)
    assert got == raw.tobytes()


# ---------------------------------------------------------------------------
# Baseline TIFF (llm/tiff.py, round 7)
# ---------------------------------------------------------------------------
@settings(max_examples=60, deadline=None)
@given(gray_images(max_side=40), st.booleans())
def test_tiff_roundtrip_is_lossless(img, packbits):
    """TIFF guarantees bit-exact pixels through both compression paths,
    whatever run/literal structure PackBits produces (incl. the
    2-byte-step record-cap overshoot found while building — a literal
    record must never exceed 128 bytes)."""
    from emr_with_custom_metrics_spark.llm.tiff import decode_tiff, encode_tiff

    w, h, a = img
    m = decode_tiff(encode_tiff(w, h, a, packbits=packbits))
    assert (m["width"], m["height"]) == (w, h)
    assert np.array_equal(m["pixels"], a)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 255), min_size=0, max_size=600),
    st.integers(0, 3),
)
def test_tiff_packbits_pair_inverse(symbols, modulus):
    """PackBits encode/decode are inverse for any byte stream — runs,
    literals, 128-byte record boundaries, and the degenerate 2-runs that
    sit between."""
    from emr_with_custom_metrics_spark.llm.tiff import (
        packbits_decode,
        packbits_encode,
    )

    vals = [s % (modulus + 1) if modulus else s for s in symbols]
    data = bytes(vals)
    assert packbits_decode(packbits_encode(data), len(data)) == data


def test_tiff_corruption_and_foreign_features():
    """Byte flips surface as ValueError/NotImplementedError (or decode —
    TIFF carries no checksum, like the real format); foreign features
    raise NotImplementedError naming the gap; MM (big-endian) headers
    parse."""
    import struct

    import pytest

    from emr_with_custom_metrics_spark.llm.tiff import decode_tiff, encode_tiff

    img = ((np.arange(16)[:, None] + np.arange(12)[None, :]) % 256).astype(np.uint8)
    payload = encode_tiff(12, 16, img, packbits=True)

    rng = np.random.default_rng(1)
    for _ in range(2000):
        p = bytearray(payload)
        p[int(rng.integers(0, len(p)))] ^= int(rng.integers(1, 256))
        try:
            decode_tiff(bytes(p))
        except (ValueError, NotImplementedError):
            pass

    # compression field -> LZW (5): honesty raise. The field is a SHORT in
    # the 259 entry's inline value.
    at = payload.index(struct.pack("<HHI", 259, 3, 1))
    lzw = bytearray(payload)
    lzw[at + 8 : at + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff(bytes(lzw))

    with pytest.raises(ValueError):
        decode_tiff(b"XX\x00\x00")
    with pytest.raises(ValueError):
        decode_tiff(payload[:20])


# ---------------------------------------------------------------------------
# Avro OCF (sources/avro_ocf.py, round 7)
# ---------------------------------------------------------------------------
@settings(max_examples=50, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(0, 350),
    codec=st.sampled_from(["null", "deflate"]),
)
def test_avro_ocf_roundtrip_exact(seed, n, codec):
    """Any record stream round-trips exactly through the OCF — zigzag
    varints at both signs and all widths, [null, T] unions, multi-block
    layout, both codecs."""
    from emr_with_custom_metrics_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )

    rng = np.random.default_rng(seed)
    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "f", "type": "double"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "boolean"},
            {"name": "o", "type": ["null", "long"]},
        ],
    }
    recs = [
        {
            "k": int(rng.integers(-(2**62), 2**62)),
            "f": float(rng.normal()),
            "s": "x" * int(rng.integers(0, 40)) + str(int(rng.integers(0, 9))),
            "b": bool(rng.integers(0, 2)),
            "o": None if rng.integers(0, 2) else int(rng.integers(-1000, 1000)),
        }
        for _ in range(n)
    ]
    got = read_avro(write_avro(schema, recs, codec=codec))
    assert got["records"] == recs
    assert got["codec"] == codec
    assert got["n_blocks"] == -(-n // 100)


def test_avro_ocf_corruption_and_foreign_features():
    """Byte flips must surface as ValueError/NotImplementedError (sync
    verification, length bounds, varint caps, deflate adler) or decode
    to the exact records — never a wrong exception or a silent
    mis-decode of the deflate file (adler-32 covers its blocks)."""
    import pytest

    from emr_with_custom_metrics_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )

    schema = {
        "type": "record",
        "name": "R",
        "fields": [{"name": "k", "type": "long"},
                   {"name": "s", "type": "string"}],
    }
    recs = [{"k": i, "s": f"v{i}"} for i in range(150)]
    rng = np.random.default_rng(5)
    for codec in ("null", "deflate"):
        base = bytearray(write_avro(schema, recs, codec=codec))
        bad = 0
        for _ in range(4000):
            p = bytearray(base)
            p[int(rng.integers(0, len(p)))] ^= int(rng.integers(1, 256))
            try:
                read_avro(bytes(p))
            except (ValueError, NotImplementedError):
                pass
            except Exception:
                bad += 1
        assert bad == 0, codec

    with pytest.raises(NotImplementedError, match="codec"):
        read_avro(write_avro(schema, recs).replace(b"null", b"lzma", 1))
    with pytest.raises(ValueError):
        read_avro(b"NotAvro")
    with pytest.raises(NotImplementedError, match="type"):
        write_avro(
            {"type": "record", "name": "R",
             "fields": [{"name": "a", "type": "float"}]},
            [{"a": 1.0}],
        )


def test_mpeg1_l3_perturbed_huffman_table_is_detected(monkeypatch):
    """r9 VERDICT stretch: the Table-B.7 integration point must REJECT
    wrong constants, not mis-decode through them. Remap the decoder's
    most-frequent pair codeword to (15,15) — the kind of one-row error
    a from-memory B.7 transcription risks: the changed linbits/sign
    consumption desynchronizes the bit cursor and the decoder's
    structural verification (count1 bounds / part2_3_length) raises —
    never a silent wrong answer. Converts the documented 'true tables
    drop into one dict' boundary into a tested property."""
    import pytest

    from emr_with_custom_metrics_spark.llm import mpeg_audio as M

    rng = np.random.default_rng(7)
    x = 0.4 * rng.standard_normal(3 * M.L3_FRAME_SAMPLES).clip(-0.9, 0.9)
    payload = M.encode_mp3_huffman(x, 44100)
    M.decode_mp3_huffman(payload)  # sanity: correct tables decode

    # the shortest (most frequent) codeword, remapped to the escape pair
    code_short = min(M._L3_PAIR_DECODE, key=lambda c: c[1])
    sym_short = M._L3_PAIR_DECODE[code_short]
    assert sym_short != (15, 15)
    bad = dict(M._L3_PAIR_DECODE)
    bad[code_short] = (15, 15)
    monkeypatch.setattr(M, "_L3_PAIR_DECODE", bad)
    with pytest.raises((ValueError, KeyError)):
        M.decode_mp3_huffman(payload)


def test_mpeg1_l1_perturbed_pqmf_prototype_is_detected():
    """Same property for the Table-C/D prototype slot: two canonical
    TRANSCRIPTION errors — a sign-flipped tap and two swapped 64-tap
    phases — each break the 25 dB conformance gate when the decoder's
    synthesis window carries them, so wrong filterbank constants cannot
    pass the roundtrip suite silently. (Diffuse 1% noise costs <1 dB —
    the filterbank is robust to noise but not to structural typos,
    which is exactly the failure mode a from-memory Table-C/D
    transcription risks.)"""
    from emr_with_custom_metrics_spark.llm import mpeg_audio as M

    fs = 32000
    t = np.arange(M.FRAME_SAMPLES * 20)
    x = 0.5 * np.sin(2 * np.pi * 440 * t / fs)
    payload = M.encode_mpeg1_layer1(x, fs, filterbank="pqmf")

    def snr_of(samples):
        a = x[1000 : len(samples) - M._PQMF_DELAY]
        b = samples[1000 + M._PQMF_DELAY :]
        err = b - a
        return 10 * np.log10(float(a @ a) / max(float(err @ err), 1e-300))

    snr_good = snr_of(M.decode_mpeg1_layer1(payload)["samples"])
    assert snr_good > 25.0, snr_good

    d_taps = M._PQMF_D.copy()
    try:
        flipped = d_taps.copy()
        i = int(np.argmax(np.abs(flipped)))
        flipped[i] = -flipped[i]  # one sign typo on the largest tap
        M._PQMF_D = flipped
        snr_flip = snr_of(M.decode_mpeg1_layer1(payload)["samples"])
        assert snr_flip < 25.0, (snr_good, snr_flip)

        swapped = d_taps.copy()  # two adjacent polyphase phases swapped
        swapped[64:128], swapped[128:192] = (
            d_taps[128:192].copy(), d_taps[64:128].copy())
        M._PQMF_D = swapped
        snr_swap = snr_of(M.decode_mpeg1_layer1(payload)["samples"])
        assert snr_swap < 25.0, (snr_good, snr_swap)
    finally:
        M._PQMF_D = d_taps
