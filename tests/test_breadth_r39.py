"""Tests for plans/breadth_r39.py (stream-static enrichment)."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r39 import (
    streamed_dim_enrichment,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_streamed_enrichment_matches_batch_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    nation = {n.n_nationkey: n.n_name for n in load_table(spark, SF_SMOKE, "nation").collect()}
    agg = defaultdict(lambda: [0, 0, set()])
    for r in ev:
        name = nation[r.user_id % 25]
        cell = agg[name]
        cell[0] += 1
        cell[1] += int(math.floor(r.value * 100 + 0.5))
        cell[2].add(r.user_id)
    got = {r.nation: r for r in streamed_dim_enrichment(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for name, (n, cents, users) in agg.items():
        r = got[name]
        assert (r.n_events, r.sum_cents, r.n_users) == (n, cents, len(users))
