"""Pins for the MJPEG-AVI video codec (operators/video.py, round 9).
Layered like test_jpeg.py/test_gif.py: container round-trip, header
validation, in-seam frame sampling, truncation → ValueError at every
cut point, and the synth_avi corpus arithmetic the oracle regenerates.
"""

from __future__ import annotations

import numpy as np
import pytest

from matt3r_data_ingestion_serverless_spark.operators.jpeg import encode_jpeg
from matt3r_data_ingestion_serverless_spark.operators.multimodal import (
    _avi_dims,
    sniff_format,
    synth_avi,
)
from matt3r_data_ingestion_serverless_spark.operators.video import (
    decode_video,
    encode_avi_mjpeg,
    extract_mjpeg_frames,
)


def _const_block_frame(doc_id: int, k: int, w: int, h: int) -> np.ndarray:
    by, bx = np.ogrid[0 : h // 8, 0 : w // 8]
    blocks = ((doc_id * 13 + k * 7 + by * 31 + bx * 17) % 256).astype(np.uint8)
    return np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)


def test_container_roundtrip_bit_exact():
    w, h, nf = 24, 16, 4
    frames = [encode_jpeg(_const_block_frame(3, k, w, h)) for k in range(nf)]
    avi = encode_avi_mjpeg(frames, w, h)
    assert sniff_format(avi) == "avi"
    gw, gh, declared, raw = extract_mjpeg_frames(avi)
    assert (gw, gh, declared) == (w, h, nf) and raw == frames
    W, H, px = decode_video(avi)
    assert (W, H, px.shape[0]) == (w, h, nf)
    for k in range(nf):
        want = np.repeat(_const_block_frame(3, k, w, h)[:, :, None], 3, axis=2)
        assert np.array_equal(px[k], want), k


def test_frame_sampling_in_seam():
    """sample_every=2 returns frames 0, 2, 4 — and skipped frames are
    never JPEG-decoded (decode_video slices the raw frame list before
    any pixel work)."""
    w, h, nf = 16, 8, 5
    frames = [encode_jpeg(_const_block_frame(9, k, w, h)) for k in range(nf)]
    avi = encode_avi_mjpeg(frames, w, h)
    _, _, px = decode_video(avi, sample_every=2)
    assert px.shape[0] == 3
    for j, k in enumerate((0, 2, 4)):
        want = np.repeat(_const_block_frame(9, k, w, h)[:, :, None], 3, axis=2)
        assert np.array_equal(px[j], want)


def test_header_validation():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_video(b"RIFF\x04\x00\x00\x00WAVE")
    # frame-count mismatch between avih and movi
    frames = [encode_jpeg(_const_block_frame(1, k, 16, 8)) for k in range(2)]
    avi = bytearray(encode_avi_mjpeg(frames, 16, 8))
    # avih dwTotalFrames sits 16 bytes into the avih payload; locate it
    at = bytes(avi).index(b"avih") + 8 + 16
    avi[at] = 7
    with pytest.raises(ValueError, match="declares"):
        decode_video(bytes(avi))
    # frame dims disagreeing with the container
    wrong = encode_avi_mjpeg([encode_jpeg(_const_block_frame(1, 0, 24, 8))], 16, 8)
    with pytest.raises(ValueError, match="container says"):
        decode_video(wrong)


def test_truncation_raises_valueerror_everywhere():
    avi = synth_avi(5)
    for cut in range(len(avi)):
        with pytest.raises(ValueError):
            decode_video(avi[:cut])


def test_synth_avi_matches_oracle_arithmetic():
    """decode_video(synth_avi(id), 2) must equal the closed form the
    DuckDB oracle (_VIDEO_SQL) regenerates for the SAMPLED frames."""
    for doc_id in (0, 7, 11, 42):
        w, h, nf = _avi_dims(doc_id)
        W, H, px = decode_video(synth_avi(doc_id), sample_every=2)
        assert (W, H) == (w, h) and px.shape[0] == len(range(0, nf, 2))
        for j, k in enumerate(range(0, nf, 2)):
            want = np.repeat(
                _const_block_frame(doc_id, k, w, h)[:, :, None], 3, axis=2
            )
            assert np.array_equal(px[j], want), (doc_id, k)
