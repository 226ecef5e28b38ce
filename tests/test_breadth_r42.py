"""Brute-force property tests for plans/breadth_r42.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r42 import (
    _SNIP_RADIUS,
    _SNIP_TERM,
    search_snippet_extract,
    xyz_variability_classes,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_snippets_match_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    expected = {}
    for d in docs:
        pos = d.text.lower().find(_SNIP_TERM)
        if pos < 0:
            continue
        pos1 = pos + 1  # 1-based
        start = max(pos1 - _SNIP_RADIUS, 1)
        snippet = d.text[start - 1 : start - 1 + 2 * _SNIP_RADIUS + len(_SNIP_TERM)]
        expected[d.doc_id] = (pos1, snippet, len(d.text))
    got = {
        r.doc_id: (r.hit_pos, r.snippet, r.doc_len)
        for r in search_snippet_extract(spark, SF_SMOKE).collect()
    }
    assert got == expected
    for pos1, snippet, _ in got.values():
        assert _SNIP_TERM in snippet.lower()


def test_xyz_classes_match_python(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    monthly = defaultdict(lambda: defaultdict(int))
    for r in li:
        monthly[r.l_partkey][r.l_shipdate.strftime("%Y-%m")] += int(r.l_quantity)
    agg = defaultdict(lambda: [0, 0, []])
    for pk, months in monthly.items():
        qs = list(months.values())
        n, s = len(qs), sum(qs)
        q = sum(x * x for x in qs)
        if n < 2 or s == 0:
            cv = None
        else:
            cv = math.sqrt((n * q - float(s) * s) / (n - 1)) * n / (float(s) * math.sqrt(n))
        if cv is None or cv >= 1.0:
            cls = "Z"
        elif cv < 0.5:
            cls = "X"
        else:
            cls = "Y"
        cell = agg[cls]
        cell[0] += 1
        cell[1] += s
        if cv is not None:
            cell[2].append(_round6(cv))
    got = {r.xyz: r for r in xyz_variability_classes(spark, SF_SMOKE).collect()}
    assert set(got) == set(agg)
    for cls, (n_parts, total, cvs) in agg.items():
        r = got[cls]
        assert (r.n_parts, r.total_qty) == (n_parts, total)
        if cvs:
            assert abs(r.mean_cv - _round6(sum(cvs) / len(cvs))) <= 2e-6
        else:
            assert r.mean_cv is None
