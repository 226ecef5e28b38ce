"""Brute-force property tests for plans/breadth_r30.py."""

from __future__ import annotations

import math
import re
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r30 import (
    geometric_mean_by_type,
    ns_readability_flesch,
    theil_index_by_nation,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_flesch_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    got = {r.doc_id: r for r in ns_readability_flesch(spark, SF_SMOKE).collect()}
    expected_ids = {d.doc_id for d in docs if any(t for t in d.text.split(" "))}
    assert set(got) == expected_ids
    for d in docs:
        words = [t for t in d.text.split(" ") if t != ""]
        if not words:
            continue
        ns = max(len(re.findall(r"[.!?]+", d.text)), 1)
        nw = len(words)
        sy = max(len(re.findall(r"[aeiouy]+", d.text.lower())), 1)
        r = got[d.doc_id]
        assert (r.n_sentences, r.n_words, r.n_syllables) == (ns, nw, sy)
        flesch = 206.835 - 1.015 * (nw / ns) - 84.6 * (sy / nw)
        assert abs(r.flesch - _round6(flesch)) <= 1e-6


def test_geometric_mean_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    sums = defaultdict(lambda: [0, 0])
    for r in ev:
        if r.value <= 0:
            continue
        ln = math.log(r.value)
        micro = int(math.copysign(math.floor(abs(ln) * 1e6 + 0.5), ln))
        cell = sums[r.event_type]
        cell[0] += 1
        cell[1] += micro
    got = {r.event_type: r for r in geometric_mean_by_type(spark, SF_SMOKE).collect()}
    assert set(got) == set(sums)
    for et, (n, s1) in sums.items():
        r = got[et]
        assert (r.n, r.sum_ln_micro) == (n, s1)
        assert abs(r.geo_mean - _round6(math.exp(s1 / n / 1e6))) <= 1e-6


def test_theil_matches_python_and_is_nonnegative(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    sup = {s.s_suppkey: s.s_nationkey for s in load_table(spark, SF_SMOKE, "supplier").collect()}
    nat = {n.n_nationkey: n.n_name for n in load_table(spark, SF_SMOKE, "nation").collect()}
    rev = defaultdict(lambda: defaultdict(int))
    for r in li:
        cents = int(math.floor(r.l_extendedprice * (1 - r.l_discount) * 100 + 0.5))
        rev[sup[r.l_suppkey]][r.l_suppkey] += cents
    got = {r.nation: r for r in theil_index_by_nation(spark, SF_SMOKE).collect()}
    assert set(got) == {nat[nk] for nk in rev}
    for nk, sups in rev.items():
        total = sum(sups.values())
        n = len(sups)
        acc = 0
        for c in sups.values():
            ratio = float(c) * n / total
            ln = math.log(ratio)
            ln_micro = int(math.copysign(math.floor(abs(ln) * 1e6 + 0.5), ln))
            acc += ((c * 1000000) // total) * ln_micro
        r = got[nat[nk]]
        assert r.n_suppliers == n
        assert abs(r.theil_t - _round6(acc / 1e12)) <= 1e-6
        # Theil T is nonnegative up to quantization error
        assert r.theil_t >= -1e-4
