"""MJPEG-in-AVI container codec: RIFF walk + per-frame JPEG decode.

Upgrades the video-container tier from stub to REAL for the one video
format that needs no inter-frame codec: Motion JPEG, where every frame is
an independent baseline JPEG — decoded here by ``llm.jpeg``'s from-scratch
T.81 pipeline. AVI itself is plain RIFF bookkeeping (the same chunk
grammar as WAV): ``RIFF('AVI ' LIST('hdrl' avih ...) LIST('movi'
00dc...))``.

Scope, honestly stated: single video stream, '00dc'/'00db' frame chunks,
no index required (idx1 skipped when present), frames decodable by
``decode_jpeg``'s scope. Inter-frame codecs (H.264 etc.) remain the
honest stub — they genuinely need ffmpeg.
"""

from __future__ import annotations

import struct

import numpy as np

from emr_with_custom_metrics_spark.llm.jpeg import decode_jpeg


def encode_avi_mjpeg(
    width: int, height: int, jpeg_frames: list[bytes], fps: int = 25
) -> bytes:
    """Minimal spec-conforming AVI wrapper around pre-encoded JPEG frames."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, 0, 0, 0x10, len(jpeg_frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(jpeg_frames), 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D, 0, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> dict:
    """Walk the RIFF tree, decode every MJPEG frame chunk, return container
    metadata plus per-frame means (same hook shape as ``decode_gif``)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (declared,) = struct.unpack_from("<I", payload, 4)
    if declared + 8 != len(payload):
        raise ValueError("AVI size field mismatch")

    usec_per_frame = 0
    avih_frames = 0
    width = height = 0
    frame_means: list[float] = []
    fw = fh = 0

    def walk(start: int, end: int) -> None:
        nonlocal usec_per_frame, avih_frames, width, height, fw, fh
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("AVI chunk overruns container")
            if cid == b"LIST":
                walk(body_start + 4, body_end)  # skip the 4-byte list kind
            elif cid == b"avih":
                (usec_per_frame, _, _, _, avih_frames, _, _, _, width, height) = (
                    struct.unpack_from("<IIIIIIIIII", payload, body_start)
                )
            elif cid[2:4] in (b"dc", b"db"):  # compressed / uncompressed frame
                m = decode_jpeg(payload[body_start:body_end])
                frame_means.append(m["mean_byte"])
                fw, fh = m["width"], m["height"]
            pos = body_end + (size & 1)

    walk(12, len(payload))
    if not frame_means:
        raise ValueError("AVI contains no video frames")
    if avih_frames and avih_frames != len(frame_means):
        raise ValueError(
            f"AVI header declares {avih_frames} frames, stream has {len(frame_means)}"
        )
    if width and (fw, fh) != (width, height):
        raise ValueError("frame dimensions disagree with the AVI header")
    return {
        "format": "avi-mjpeg",
        "width": int(fw),
        "height": int(fh),
        "n_frames": len(frame_means),
        "duration_us": int(usec_per_frame) * len(frame_means),
        "frame_means": frame_means,
        "mean_byte": float(np.mean(frame_means)),
    }
