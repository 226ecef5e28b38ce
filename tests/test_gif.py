"""Pins for the stdlib GIF codec (operators/gif.py — VERDICT r08
next-step 5). Layered like test_jpeg.py so a failure localizes:
raw LZW round-trip (incl. dictionary-full resets and the KwKwK case),
container round-trip, interlace, local color tables, extension-block
skip, truncation → ValueError everywhere, and the synth_gif corpus
arithmetic the DuckDB oracle regenerates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from matt3r_data_ingestion_serverless_spark.operators.gif import (
    _INTERLACE_PASSES,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from matt3r_data_ingestion_serverless_spark.operators.multimodal import (
    _gif_dims,
    decode_image,
    sniff_format,
    synth_gif,
)


def test_lzw_roundtrip_all_code_sizes():
    rng = np.random.default_rng(0)
    for mcs in range(2, 9):
        for n in (1, 2, 17, 4000):
            idx = rng.integers(0, 1 << mcs, n).astype(np.uint8)
            assert np.array_equal(_lzw_decode(_lzw_encode(idx, mcs), mcs, n), idx)


def test_lzw_dictionary_full_reset():
    """120k random symbols at mcs=2 overflow the 4096-entry dictionary
    many times — the encoder's CLEAR-on-full and the decoder's
    deferred-width handling must stay aligned."""
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 4, 120_000).astype(np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 2), 2, len(idx)), idx)


def test_lzw_kwkwk_case():
    # 'aaaa...' drives the code-equals-next-entry (KwKwK) path
    idx = np.zeros(500, dtype=np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(idx, 2), 2, 500), idx)


def test_container_roundtrip_random():
    rng = np.random.default_rng(2)
    for _ in range(20):
        h, w = (int(v) for v in rng.integers(1, 40, 2))
        npal = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
        idx = rng.integers(0, npal, (h, w)).astype(np.uint8)
        gw, gh, px = decode_gif(encode_gif(idx, pal))
        assert (gw, gh) == (w, h)
        assert np.array_equal(px, pal[idx])


def test_interlaced_image_deinterlaces():
    """Hand-assemble an interlaced variant of an encoded image: rows
    stored in 4-pass order, interlace flag set — decode must return
    the original row order."""
    rng = np.random.default_rng(3)
    h, w, npal = 19, 11, 16
    pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
    idx = rng.integers(0, npal, (h, w)).astype(np.uint8)
    order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
    stored = idx[order]  # rows in interlace transmission order
    bits = 4
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:npal] = pal
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlace flag
    mcs = bits
    out.append(mcs)
    lzw = _lzw_encode(stored.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    gw, gh, px = decode_gif(bytes(out))
    assert (gw, gh) == (w, h)
    assert np.array_equal(px, pal[idx])


def test_extensions_and_local_table():
    """89a graphic-control + comment extensions before the image
    descriptor are skipped; a local color table overrides the global
    one."""
    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    data = bytearray(encode_gif(idx, pal))
    # splice a graphic-control extension (0x21 0xF9 len=4 ... 0) and a
    # comment extension right after the global color table
    hdr_end = 13 + 3 * 2  # header + 2-entry global table
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0]) + bytes(
        [0x21, 0xFE, 3, ord("h"), ord("i"), ord("!"), 0]
    )
    spliced = bytes(data[:hdr_end]) + ext + bytes(data[hdr_end:])
    w, h, px = decode_gif(spliced)
    assert np.array_equal(px, pal[idx])

    # local color table: flip the image-descriptor flag and insert an
    # inverted palette after it; decoded pixels must use the LOCAL one
    desc_at = hdr_end  # image descriptor follows the global table
    assert data[desc_at] == 0x2C
    # descriptor = 0x2C + left/top/w/h (4 x u16) + packed = 10 bytes
    data[desc_at + 9] = 0x80 | 0  # local table, 2 entries
    local = pal[::-1].tobytes()
    with_local = bytes(data[: desc_at + 10]) + local + bytes(data[desc_at + 10 :])
    w, h, px2 = decode_gif(with_local)
    assert np.array_equal(px2, pal[::-1][idx])


def test_truncation_raises_valueerror_everywhere():
    data = synth_gif(7)
    for cut in range(len(data)):
        with pytest.raises(ValueError):
            decode_gif(data[:cut])


def test_corrupt_streams_raise_valueerror():
    with pytest.raises(ValueError):
        decode_gif(b"notagif")
    # trailer where the image descriptor should be
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    ok = bytearray(encode_gif(np.array([[0, 1]], dtype=np.uint8), pal))
    ok[19] = 0x3B
    with pytest.raises(ValueError):
        decode_gif(bytes(ok))


def test_synth_gif_matches_oracle_arithmetic():
    """decode(synth_gif(id)) pixel (x, y, c) must equal the closed form
    the DuckDB oracle (_MIXED_SQL's gif branch) regenerates."""
    for doc_id in (3, 7, 11, 42):
        w, h = _gif_dims(doc_id)
        gw, gh, px = decode_image(synth_gif(doc_id))
        assert sniff_format(synth_gif(doc_id)) == "gif"
        assert (gw, gh) == (w, h)
        y, x = np.ogrid[0:h, 0:w]
        idx = (doc_id * 19 + y * 5 + x * 3) % 256
        want = np.stack(
            [(idx * 3) % 256, (idx * 5 + 1) % 256, (idx * 7 + 2) % 256], axis=2
        )
        assert np.array_equal(px.astype(np.int64), want)
