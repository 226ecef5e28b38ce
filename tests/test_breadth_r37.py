"""Brute-force property tests for plans/breadth_r37.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r37 import (
    _HALF_DAYS,
    embedding_silhouette_by_label,
    ns_recency_weighted_engagement,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_recency_weighted_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    wm = max(int(r.ts.timestamp() * 1e6) for r in ev)
    per = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        age_days = (wm - int(r.ts.timestamp() * 1e6)) / 86400e6
        w = int(math.floor(math.exp(-age_days / _HALF_DAYS) * 1e6 + 0.5))
        cents = int(math.floor(r.value * 100 + 0.5))
        cell = per[r.user_id]
        cell[0] += 1
        cell[1] += w
        cell[2] += w * cents
    got = {r.user_id: r for r in ns_recency_weighted_engagement(spark, SF_SMOKE).collect()}
    assert set(got) == set(per)
    for uid, (n, w_sum, score) in per.items():
        r = got[uid]
        assert (r.n, r.weight_micro, r.score_micro_cents) == (n, w_sum, score)
        assert abs(r.weighted_mean_cents - _round6(score / w_sum)) <= 1e-6


def test_silhouette_matches_python(spark):
    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    vm = {r.vec_id: [int(math.floor(float(x) * 1e6 + 0.5)) for x in r.embedding] for r in rows}
    lab = {r.vec_id: r.label for r in rows}
    by_label = defaultdict(list)
    for vid, label in lab.items():
        by_label[label].append(vid)
    cent = {}
    for label, vids in by_label.items():
        n = len(vids)
        cent[label] = [sum(vm[v][i] for v in vids) / n / 1e6 for i in range(64)]
    sums = defaultdict(lambda: [0, 0])
    for vid, label in lab.items():
        dists = {}
        for cl, cv in cent.items():
            acc = 0.0
            for i in range(64):
                diff = vm[vid][i] / 1e6 - cv[i]
                acc += diff * diff
            dists[cl] = acc
        a = int(math.floor(math.sqrt(dists[label]) * 1e6 + 0.5))
        b = int(math.floor(math.sqrt(min(d for cl, d in dists.items() if cl != label)) * 1e6 + 0.5))
        x = (b - a) / max(a, b) * 1e6
        s_micro = int(math.floor(x + (0.5 if b >= a else -0.5)))
        cell = sums[label]
        cell[0] += 1
        cell[1] += s_micro
    got = {r.label: r for r in embedding_silhouette_by_label(spark, SF_SMOKE).collect()}
    assert set(got) == set(sums)
    for label, (n, total) in sums.items():
        r = got[label]
        assert (r.n, r.sum_s_micro) == (n, total)
        assert abs(r.mean_silhouette - _round6(total / n / 1e6)) <= 1e-6
        assert -1.0 <= r.mean_silhouette <= 1.0
