"""Stdlib MJPEG-in-AVI video codec (round 9 — shrinks the "video is
NotImplemented" boundary to inter-frame codecs only).

Motion-JPEG stores every frame as an independent baseline JPEG inside
an AVI (RIFF) container — both formats are public specifications
(Microsoft AVI RIFF, 1992; ITU-T T.81), and this container is what
cheap dashcams and webcams actually emit. The container layer here is
a from-scratch RIFF chunk walk (fourcc + little-endian u32 size +
even-padded payload); the frame layer reuses the real baseline JPEG
codec (operators/jpeg.py). Inter-frame codecs (H.264/H.265/VP9) have
no stdlib-expressible decoder and stay honestly out of scope at the
decode_video seam.

Writer: minimal but spec-correct AVI — RIFF('AVI ') containing
LIST('hdrl') with avih + one LIST('strl') (strh 'vids'/'MJPG' + strf
BITMAPINFOHEADER) and LIST('movi') with one '00dc' chunk per frame.
Reader: tolerant chunk walk — finds LIST('movi'), collects
'00dc'/'00db' payloads, validates counts against avih, raises
ValueError on truncation.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[bytes], w: int, h: int, fps: int = 10) -> bytes:
    """Wrap pre-encoded JPEG frames into a minimal spec-correct AVI."""
    n = len(frames)
    max_sz = max((len(f) for f in frames), default=0)
    # avih: MainAVIHeader (56 bytes)
    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        max_sz * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags (no idx1 chunk is written)
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_sz,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved
    )
    # strh: AVIStreamHeader (56 bytes):
    # fccType fccHandler dwFlags wPriority wLanguage dwInitialFrames
    # dwScale dwRate dwStart dwLength dwSuggestedBufferSize dwQuality
    # dwSampleSize rcFrame(l t r b)
    strh = struct.pack(
        "<4s4sIHH8I4H",
        b"vids", b"MJPG",
        0, 0, 0,
        0, 1, fps, 0, n, max_sz, 0, 0,
        0, 0, w, h,
    )
    # strf: BITMAPINFOHEADER (40 bytes)
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len); bounds-checked."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated AVI: chunk header ends early")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError("truncated AVI: chunk payload ends early")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def extract_mjpeg_frames(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """AVI bytes → (width, height, declared_frame_count, jpeg frames).

    Tolerant to extra chunks (idx1, JUNK, extra streams) — only the
    avih header and the movi payloads are load-bearing."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI signature)")
    if len(data) < 12:
        raise ValueError("truncated AVI: RIFF header ends early")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(8 + riff_size, len(data))
    if 8 + riff_size > len(data):
        raise ValueError("truncated AVI: file shorter than RIFF size")
    w = h = declared = None
    frames: list[bytes] = []
    for fourcc, p, sz in _walk_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = data[p : p + 4]
        if list_type == b"hdrl":
            for fc2, p2, sz2 in _walk_chunks(data, p + 4, p + sz):
                if fc2 == b"avih":
                    if sz2 < 40:
                        raise ValueError("corrupt AVI: avih too short")
                    vals = struct.unpack("<10I", data[p2 : p2 + 40])
                    declared, w, h = vals[4], vals[8], vals[9]
        elif list_type == b"movi":
            for fc2, p2, sz2 in _walk_chunks(data, p + 4, p + sz):
                if fc2[2:4] in (b"dc", b"db"):
                    frames.append(data[p2 : p2 + sz2])
    if w is None:
        raise ValueError("corrupt AVI: no avih header")
    if declared is not None and declared != len(frames):
        raise ValueError(
            f"corrupt AVI: avih declares {declared} frames, movi holds {len(frames)}"
        )
    return int(w), int(h), int(declared or 0), frames


def decode_video(data: bytes, sample_every: int = 1):
    """Decode an MJPEG AVI: returns (width, height, uint8 array
    (n_frames, h, w, 3)) taking every ``sample_every``-th frame (frame
    sampling belongs in the codec seam so unsampled frames are never
    pixel-decoded — at 100 TB that is most of the compute). Frames
    whose JPEG dimensions disagree with the container raise."""
    from matt3r_data_ingestion_serverless_spark.operators.jpeg import decode_jpeg

    w, h, _n, raw = extract_mjpeg_frames(data)
    picked = raw[::sample_every]
    out = np.empty((len(picked), h, w, 3), dtype=np.uint8)
    for i, fr in enumerate(picked):
        fw, fh, px = decode_jpeg(fr)
        if (fw, fh) != (w, h):
            raise ValueError(
                f"corrupt AVI: frame {i} is {fw}x{fh}, container says {w}x{h}"
            )
        out[i] = px
    return w, h, out
