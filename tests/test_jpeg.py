"""Pins for the stdlib baseline JPEG codec (operators/jpeg.py —
VERDICT r07 next-step 4).

Layers tested separately so a failure localizes:
- DCT/IDCT inversion and orthonormality (pure numpy);
- the entropy layer DIFFERENTIALLY: decode_jpeg(_return_coefs=True)
  must reproduce the encoder's pre-IDCT quantized-dequantized
  coefficients exactly — Huffman tables, DC prediction, run-lengths,
  ZRL/EOB, byte stuffing and restart resync all sit between the two;
- round-trip error bounds on random images (lossy but tightly bounded
  at unit quantization);
- the exact-round-trip regime (constant 8x8 blocks) the graded
  mm_mixed_format_decode corpus relies on;
- marker-walk rejection of corrupt/unsupported streams.
"""

from __future__ import annotations

import numpy as np
import pytest

from matt3r_data_ingestion_serverless_spark.operators.jpeg import (
    _quantize,
    decode_jpeg,
    encode_jpeg,
    fdct2,
    idct2,
)
from matt3r_data_ingestion_serverless_spark.operators.multimodal import (
    _jpeg_dims,
    decode_image,
    sniff_format,
    synth_jpeg,
)


def test_dct_roundtrip_and_orthonormality():
    rng = np.random.default_rng(1)
    b = rng.uniform(-128, 127, (5, 8, 8))
    assert np.allclose(idct2(fdct2(b)), b, atol=1e-10)
    # Parseval: energy preserved
    c = fdct2(b)
    assert np.allclose((b * b).sum(axis=(1, 2)), (c * c).sum(axis=(1, 2)))


def test_constant_block_dc_quantizes_exactly():
    """Float DC of a constant block is 8·(v−128) within ~1e-12; the
    unit-table quantizer rounds it to that integer EXACTLY and every AC
    quantizes to zero — the two facts the bit-exact corpus rests on."""
    for v in (0, 1, 127, 128, 200, 255):
        b = np.full((1, 8, 8), float(v) - 128.0)
        c = fdct2(b)
        assert abs(c[0, 0, 0] - 8.0 * (v - 128.0)) < 1e-9
        assert np.abs(c[0].reshape(-1)[1:]).max() < 1e-9
        q = _quantize(c, np.ones((8, 8)))
        assert q[0, 0, 0] == 8 * (v - 128)
        assert np.count_nonzero(q[0].reshape(-1)[1:]) == 0


@pytest.mark.parametrize("shape", [(8, 8), (24, 40), (13, 22), (64, 9)])
def test_gray_roundtrip_error_bound(shape):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (shape[1], shape[0])
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 0] == out[:, :, 2]).all()
    err = np.abs(out[:, :, 0].astype(int) - img.astype(int)).max()
    assert err <= 2, err


def test_color_444_roundtrip_error_bound():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (24, 16)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_color_420_shape_and_luma_fidelity():
    """4:2:0 loses chroma detail by design; luma must stay tight and
    dims exact even when neither dimension is MCU-aligned."""
    rng = np.random.default_rng(4)
    # mid-range pixels keep the YCbCr->RGB reconstruction away from the
    # 0/255 clamp, so luma error measures the codec, not the clipping
    img = rng.integers(60, 196, (21, 35, 3), dtype=np.uint8)
    w, h, out = decode_jpeg(encode_jpeg(img, subsampling="4:2:0"))
    assert (w, h) == (35, 21)
    y_in = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    y_out = 0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2]
    assert np.abs(y_in - y_out).max() <= 6.0


def test_entropy_layer_differential_vs_encoder_coefficients():
    """The dequantized coefficients recovered through the FULL entropy
    stack (canonical Huffman + DC prediction + runs + stuffing) must
    equal the encoder's quantizer output times the quant table, block
    for block — a pure entropy-layer differential with the transform
    stage factored out."""
    rng = np.random.default_rng(5)
    for q in (1, 4):
        img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        # independent reference: transform + quantize exactly as the
        # encoder does, without any entropy machinery
        blocks = (
            img.astype(np.float64).reshape(3, 8, 4, 8).swapaxes(1, 2) - 128.0
        )
        ref = _quantize(fdct2(blocks), np.full((8, 8), float(q))) * float(q)
        (coefs,) = decode_jpeg(encode_jpeg(img, quant=q), _return_coefs=True)
        assert coefs.shape == (3, 4, 8, 8)
        assert np.array_equal(coefs, ref.astype(np.float64)), f"q={q}"


def test_restart_interval_roundtrip_and_resync():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (16, 80), dtype=np.uint8)
    data = encode_jpeg(img, restart_interval=3)
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    w, h, out = decode_jpeg(data)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_byte_stuffing_survives_ff_heavy_streams():
    """An all-extreme image drives big coefficients whose value bits
    often emit 0xFF bytes; the stuffed stream must still parse."""
    img = np.zeros((16, 16), dtype=np.uint8)
    img[::2, ::2] = 255
    data = encode_jpeg(img)
    w, h, out = decode_jpeg(data)
    assert (w, h) == (16, 16)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 2


def test_marker_walk_rejects_corrupt_and_unsupported():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")  # not a JPEG
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data[:20]))  # truncated before SOS
    # flip SOF0 to SOF2 (progressive) — must refuse loudly
    sof = bytes(data).find(b"\xff\xc0")
    prog = bytes(data[:sof]) + b"\xff\xc2" + bytes(data[sof + 2 :])
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(prog)


def test_synth_jpeg_exact_through_dispatch():
    """The graded corpus regime: block-constant gray + unit quant table
    round-trips BIT-EXACTLY through sniff -> decode_image."""
    for d in (2, 5, 11, 17, 23):
        blob = synth_jpeg(d)
        assert sniff_format(blob) == "jpeg"
        w, h, px = decode_image(blob)
        assert (w, h) == _jpeg_dims(d)
        by, bx = np.ogrid[0 : h // 8, 0 : w // 8]
        expect = ((d * 13 + by * 31 + bx * 17) % 256).astype(np.uint8)
        expect = np.repeat(np.repeat(expect, 8, axis=0), 8, axis=1)
        for c in range(3):
            assert np.array_equal(px[:, :, c], expect), d
