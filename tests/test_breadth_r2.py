"""Brute-force property tests for plans/breadth_r2.py and
plans/search.py — independent of the DuckDB oracle harness."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.plans.breadth_r2 import (
    _MIX_FRACTION,
    _MIX_WEIGHTS,
    capped_running_balance,
    ns_dataset_mixture_sampling,
    session_cap_split,
    _GAP_US,
    _CAP_US,
)
from matt3r_data_ingestion_serverless_spark.plans.search import (
    bm25_top_terms,
    keyword_search_conjunctive,
    _SEARCH_TERMS,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_capped_balance_matches_sequential_python(spark):
    out = {r.user_id: r for r in capped_running_balance(spark, SF_SMOKE).collect()}
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        bal = 0
        for r in rows:
            cents = round(r.value * 100)
            bal = max(0, bal + (cents if r.event_type == "purchase" else -cents))
        assert out[uid].final_balance_cents == bal, uid
        assert out[uid].n_txns == len(rows)


def test_session_cap_split_invariants(spark):
    rows = session_cap_split(spark, SF_SMOKE).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for uid, sess in by_user.items():
        sess.sort(key=lambda r: (r.session_no, r.split_no))
        for s in sess:
            # cap invariant: a split never spans more than the cap
            assert s.end_us - s.start_us < _CAP_US
            assert s.start_us <= s.end_us and s.n_events >= 1
        # gap invariant: consecutive sessions are separated by > gap
        for a, b in zip(sess, sess[1:]):
            if a.session_no != b.session_no:
                assert b.start_us - a.end_us > _GAP_US
            else:  # same session, next split: contiguous cap grid
                assert b.split_no > a.split_no


def test_mixture_sampling_quota_and_determinism(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    total = docs.count()
    avail = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = ns_dataset_mixture_sampling(spark, SF_SMOKE)
    counts = {r.lang: r.n for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, w in _MIX_WEIGHTS.items():
        quota = math.floor(w * (total * _MIX_FRACTION))
        assert counts.get(lang, 0) == min(quota, avail.get(lang, 0)), lang
    # deterministic: same sample on a second run
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in ns_dataset_mixture_sampling(spark, SF_SMOKE).collect()}
    assert a == b


def test_conjunctive_search_hits_contain_all_terms(spark):
    hits = keyword_search_conjunctive(spark, SF_SMOKE).collect()
    assert hits, "smoke corpus should contain conjunctive matches"
    docs = {r.doc_id: r.text for r in load_table(spark, SF_SMOKE, "documents").collect()}
    for h in hits:
        toks = docs[h.doc_id].lower().split(" ")
        assert all(t in toks for t in _SEARCH_TERMS)
        assert h.score == sum(toks.count(t) for t in _SEARCH_TERMS)


def test_bm25_ranks_rarer_term_higher_at_equal_tf(spark):
    # on any corpus: per doc, the top-ranked term list is sorted by
    # score desc and scores are positive and finite
    rows = bm25_top_terms(spark, SF_SMOKE).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, terms in by_doc.items():
        terms.sort(key=lambda r: r.rnk)
        scores = [t.bm25 for t in terms]
        assert all(s > 0 and math.isfinite(s) for s in scores)
        assert scores == sorted(scores, reverse=True)
