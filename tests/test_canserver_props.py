"""Property-based round-trip tests for the CANServer v2 decoder
(hypothesis): encode a frame with known field values using independent
bit-packing code written from the layout spec (SURVEY.md §2.3,
parse_canserver_filtered_log.py:146-184), decode through the engine,
and require exact field recovery. Golden fixtures in test_canserver.py
pin specific corners; these sweep the whole value space.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from matt3r_data_ingestion_serverless_spark.sources import canserver as cs

SYNC_US = 1_700_000_000_000_000


def _decode_one(fid: int, payload: bytes, offset_ms: int = 0):
    data = cs.encode_header() + cs.encode_sync(SYNC_US) + cs.encode_frame(offset_ms, fid, payload)
    sig = cs.frames_to_signals(cs.decode_frames(data, "dev"))
    assert len(sig) == 1
    return sig.iloc[0]


@settings(max_examples=30, deadline=None)
@given(
    st.integers(-32768, 32767),
    st.integers(-32768, 32767),
    st.integers(-32768, 32767),
)
def test_accel_int16_roundtrip(ax, ay, az):
    payload = b"".join(v.to_bytes(2, "little", signed=True) for v in (ax, ay, az))
    row = _decode_one(273, payload)
    assert row["channel"] == "accel"
    assert row["values"] == pytest.approx([v * 0.00125 for v in (ax, ay, az)])


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 4095))
def test_speed_12bit_roundtrip(raw):
    # raw = byte2 ∥ byte1-high-nibble (parse_canserver_filtered_log.py:168)
    payload = bytes([0x00, (raw & 0xF) << 4, raw >> 4])
    row = _decode_one(599, payload)
    assert row["values"] == pytest.approx([raw * 0.08 - 40.0])


@settings(max_examples=30, deadline=None)
@given(
    st.integers(-(2**27), 2**27 - 1),
    st.integers(-(2**27), 2**27 - 1),
)
def test_gps_28bit_twos_complement_roundtrip(lat_raw, lon_raw):
    # lat = b3-low-nibble ∥ b2 ∥ b1 ∥ b0; lon = b6 ∥ b5 ∥ b4 ∥ b3-high-nibble
    ula, ulo = lat_raw & 0xFFFFFFF, lon_raw & 0xFFFFFFF
    payload = bytes(
        [
            ula & 0xFF,
            (ula >> 8) & 0xFF,
            (ula >> 16) & 0xFF,
            ((ula >> 24) & 0xF) | ((ulo & 0xF) << 4),
            (ulo >> 4) & 0xFF,
            (ulo >> 12) & 0xFF,
            (ulo >> 20) & 0xFF,
        ]
    )
    row = _decode_one(79, payload)
    assert row["values"] == pytest.approx([lat_raw * 1e-6, lon_raw * 1e-6], abs=1e-12)


@settings(max_examples=30, deadline=None)
@given(st.integers(-16384, 16383), st.integers(-16384, 16383), st.integers(-32768, 32767))
def test_gyro_15bit_cross_byte_roundtrip(pitch_raw, roll_raw, yaw_raw):
    # yaw int16-LE in b0..b1; pitch s15 = b3[6:0] ∥ b2;
    # roll s15 = b5[5:0] ∥ b4 ∥ b3[7] (parse_canserver_filtered_log.py:156-165)
    up, ur = pitch_raw & 0x7FFF, roll_raw & 0x7FFF
    b2 = up & 0xFF
    b3 = ((up >> 8) & 0x7F) | ((ur & 0x1) << 7)
    b4 = (ur >> 1) & 0xFF
    b5 = (ur >> 9) & 0x3F
    payload = yaw_raw.to_bytes(2, "little", signed=True) + bytes([b2, b3, b4, b5])
    row = _decode_one(257, payload)
    assert row["channel"] == "gyro"
    assert row["values"] == pytest.approx(
        [yaw_raw * 1e-4, pitch_raw * 2.5e-4, roll_raw * 2.5e-4], abs=1e-12
    )


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 65535), st.integers(0, 4095))
def test_timestamp_offset_assembly(offset_ms, raw):
    payload = bytes([0x00, (raw & 0xF) << 4, raw >> 4])
    row = _decode_one(599, payload, offset_ms=offset_ms)
    assert row["ts_us"] == SYNC_US + offset_ms * 1000


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 65535),
            st.sampled_from([273, 257, 79, 599, 921, 1234]),
            st.binary(min_size=0, max_size=8),
        ),
        max_size=20,
    ),
    st.binary(min_size=0, max_size=32),
)
def test_fast_path_equals_classic_path(frames, garbage):
    # decode_signals (position scan + vectorized gather) must be
    # row-identical to frames_to_signals(decode_frames(...)) on
    # arbitrary frame mixes, including marks, garbage, unknown ids
    data = (
        cs.encode_header()
        + cs.encode_mark("m")
        + cs.encode_sync(SYNC_US)
        + b"".join(cs.encode_frame(o, f, p) for o, f, p in frames)
        + garbage
    )
    fast = cs.decode_signals(data, "dev")
    classic = cs.frames_to_signals(cs.decode_frames(data, "dev"))
    key = ["device_id", "ts_us", "channel"]
    a = fast.sort_values(key).reset_index(drop=True).astype(str)
    b = classic.sort_values(key).reset_index(drop=True).astype(str)
    assert a.to_dict("records") == b.to_dict("records")


@settings(max_examples=20, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_scanner_survives_trailing_garbage(garbage):
    # valid frames followed by arbitrary bytes: never raises, the valid
    # prefix always decodes (garbage may add bogus frames or stop clean)
    data = (
        cs.encode_header()
        + cs.encode_sync(SYNC_US)
        + cs.encode_frame(1, 921, b"\x03")
        + cs.encode_frame(2, 599, bytes([0x00, 0x40, 0x1F]))
        + garbage
    )
    frames = cs.decode_frames(data, "dev")
    got = {(r.frame_id, r.ts_us) for r in frames.itertuples()}
    assert (921, SYNC_US + 1000) in got
    assert (599, SYNC_US + 2000) in got
