"""Brute-force property tests for plans/breadth_r21.py."""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timedelta

import numpy as np

from matt3r_data_ingestion_serverless_spark.plans.breadth_r21 import (
    _FSD_TAU,
    cohort_ltv_curve,
    ns_first_story_detection,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _monday(d):
    return d - timedelta(days=d.weekday())


def test_cohort_ltv_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    d0 = {}
    for r in ev:
        d = r.ts.date()
        if r.user_id not in d0 or d < d0[r.user_id]:
            d0[r.user_id] = d
    sizes = defaultdict(int)
    for uid, d in d0.items():
        sizes[_monday(d)] += 1
    rev = defaultdict(int)
    for r in ev:
        if r.event_type != "purchase":
            continue
        cw = _monday(d0[r.user_id])
        wi = (_monday(r.ts.date()) - cw).days // 7
        cents = int(math.floor(abs(r.value) * 100 + 0.5)) * (1 if r.value >= 0 else -1)
        rev[(cw, wi)] += cents
    got = {
        (r.cohort_week, r.week_idx): r for r in cohort_ltv_curve(spark, SF_SMOKE).collect()
    }
    by_cohort = defaultdict(list)
    for (cw, wi), cents in rev.items():
        by_cohort[cw].append((wi, cents))
    expected_keys = set()
    for cw, items in by_cohort.items():
        items.sort()
        cum = 0
        for wi, cents in items:
            cum += cents
            key = (cw.strftime("%Y-%m-%d"), wi)
            expected_keys.add(key)
            r = got[key]
            assert r.cum_revenue_cents == cum, key
            assert r.cohort_users == sizes[cw]
            assert abs(
                r.ltv_per_user - _round6(cum / sizes[cw] / 100.0)
            ) < 1e-9
    assert set(got) == expected_keys


def test_first_story_matches_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    emb.sort(key=lambda r: r.vec_id)
    ids = [r.vec_id for r in emb]
    X = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1)
    got = {r.vec_id: r for r in ns_first_story_detection(spark, SF_SMOKE).collect()}
    assert set(got) == set(ids)
    for i, vid in enumerate(ids):
        r = got[vid]
        if i == 0:
            assert r.max_prior_sim is None and r.is_novel is True
            continue
        cs = X[:i] @ X[i] / (nrm[:i] * nrm[i])
        mx = max(_round6(c) for c in cs)
        assert abs(r.max_prior_sim - mx) < 1e-12, vid
        assert r.is_novel == (mx < _FSD_TAU)
