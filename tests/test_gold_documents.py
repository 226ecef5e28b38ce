"""Gold-document shape tests: the engine's JSON outputs must carry the
reference's exact document structure (SURVEY §1.1-4;
infer_stationary_states.py:108-114, infer_autopilot_states.py:91-95).
"""

from __future__ import annotations

import json

from matt3r_data_ingestion_serverless_spark.operators.signal_views import (
    autopilot_documents,
    stationary_documents,
)


def test_stationary_document_shape(spark):
    iv = spark.createDataFrame(
        [
            ("dev0", 1_700_000_003_000_000, 1_700_000_020_000_000),
            ("dev0", 1_700_000_100_000_000, 1_700_000_140_000_000),
        ],
        "device_id string, start_us long, end_us long",
    )
    rows = stationary_documents(iv).collect()
    assert len(rows) == 1
    doc = json.loads(rows[0]["document"])
    assert list(doc) == ["IMU-telematics"]
    states = doc["IMU-telematics"]["stationary-state"]
    assert states == [
        {"start": 1_700_000_003.0, "end": 1_700_000_020.0},
        {"start": 1_700_000_100.0, "end": 1_700_000_140.0},
    ]


def test_autopilot_document_shape_keeps_all_events(spark):
    ev = spark.createDataFrame(
        [
            ("dev0", 1_700_000_001_000_000, "engagement", 3.0),
            ("dev0", 1_700_000_050_000_000, "disengagement", 2.0),
            ("dev0", 1_700_000_090_000_000, "engagement", 3.0),
        ],
        "device_id string, ts_us long, status string, canbus_state double",
    )
    rows = autopilot_documents(ev).collect()
    assert len(rows) == 1
    doc = json.loads(rows[0]["document"])
    assert list(doc) == ["auditory"]
    # BOTH engagements survive (the reference's last-event-wins dict
    # update is a documented bug; intended semantics keep all)
    assert [e["timestamp"] for e in doc["auditory"]["engagement"]] == [
        1_700_000_001.0,
        1_700_000_090.0,
    ]
    assert doc["auditory"]["disengagement"][0]["canbus_state"] == 2.0
