"""Brute-force property tests for plans/breadth_r82.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth import session_window_gaps
from matt3r_data_ingestion_serverless_spark.plans.breadth_r82 import (
    _NN_RADIUS,
    _RS_WINDOWS,
    _SEQ_CAP,
    geo_radius_nn_join,
    seq_edit_distance_drift,
    streamed_session_windows,
    ts_hurst_rs,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_drift_matches_bruteforce(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    days = defaultdict(list)
    for r in ev:
        days[(r.user_id, r.ts.date())].append((r.ts, r.event_id, r.event_type[0]))
    seqs = defaultdict(dict)
    for (u, d), recs in days.items():
        recs.sort()
        seqs[u][d] = "".join(ch for _, _, ch in recs)[:_SEQ_CAP]
    want = {}
    for u, byday in seqs.items():
        ds = sorted(byday)
        for prev_d, d in zip(ds, ds[1:]):
            a, b = byday[d], byday[prev_d]
            want[(u, d.strftime("%Y-%m-%d"))] = (len(a), len(b), _lev(a, b))
    got = {
        (r.user_id, r.day): (r.seq_len, r.prev_len, r.lev_dist)
        for r in seq_edit_distance_drift(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert any(d > 0 for _, _, d in want.values())


def test_hurst_matches_python_rs(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    import datetime as dt

    hours = [
        int(r.ts.replace(tzinfo=dt.timezone.utc).timestamp() // 3600) for r in ev
    ]
    h0 = min(hours)
    counts = [0] * 512
    for h in hours:
        if h - h0 < 512:
            counts[h - h0] += 1
    rows = {r.w: r for r in ts_hurst_rs(spark, SF_SMOKE).collect()}
    assert set(rows) == set(_RS_WINDOWS)
    pts = []
    for w in _RS_WINDOWS:
        rss = []
        for c0 in range(0, 512, w):
            blk = counts[c0 : c0 + w]
            s1, s2 = sum(blk), sum(x * x for x in blk)
            if s2 * w <= s1 * s1:
                continue
            mean = s1 / w
            cum, devs = 0, []
            for i, x in enumerate(blk):
                cum += x
                devs.append(cum - (i + 1) * mean)
            r_rng = max(devs) - min(devs)
            rss.append(r_rng / math.sqrt(s2 / w - mean * mean))
        rs_avg = sum(rss) / len(rss)
        assert math.isclose(rows[w].rs_avg_r, rs_avg, abs_tol=1e-6)
        assert rows[w].n_chunks == len(rss)
        pts.append((math.log(w), math.log(rows[w].rs_avg_r)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    h = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    for w in _RS_WINDOWS:
        assert math.isclose(rows[w].hurst_r, h, abs_tol=1e-6)
    assert 0.0 < h < 1.0, "R/S Hurst estimate must be a sane exponent"


def test_radius_nn_matches_bruteforce(spark):
    users = sorted(
        {r.user_id for r in load_table(spark, SF_SMOKE, "events").collect()}
    )
    pts = {
        u: (
            49.0 + (u * 2654435761 % 1000003) % 1000 / 1000.0,
            -123.0 + (u * 40503 % 65539) % 1000 / 1000.0,
        )
        for u in users
    }
    want = {}
    for u, (la, lo) in pts.items():
        best = None
        for v, (lb, lob) in pts.items():
            if v == u:
                continue
            d = math.sqrt((la - lb) ** 2 + (lo - lob) ** 2)
            if d <= _NN_RADIUS and (best is None or (d, v) < best):
                best = (d, v)
        if best:
            want[u] = best[1]
    got = {r.user_id: r.nn_id for r in geo_radius_nn_join(spark, SF_SMOKE).collect()}
    assert got == want
    assert want, "smoke corpus must contain at least one within-radius pair"


def test_streamed_sessions_equal_batch_session_window(spark):
    batch = {
        (r.user_id, r.session_start_us, r.session_end_us): r.n_events
        for r in session_window_gaps(spark, SF_SMOKE).collect()
    }
    streamed = {
        (r.user_id, r.session_start_us, r.session_end_us): r.n_events
        for r in streamed_session_windows(spark, SF_SMOKE).collect()
    }
    assert streamed == batch
