"""Brute-force property tests for plans/breadth_r71.py."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r71 import (
    _BPE_MAX_WORD,
    _BPE_WORDS,
    docs_pareto_frontier,
    ivm_delta_agg_maintenance,
    ns_bpe_merge_rounds,
    ns_sample_weight_proportional,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_ivm_merge_equals_full_recompute(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    expected: dict[tuple[int, str], list[int]] = defaultdict(lambda: [0, 0])
    for r in ev:
        key = (r.user_id % 97, r.event_type)
        expected[key][0] += 1
        # same cents rule as the plan: round-half-away-from-zero of value*100
        cents = int(abs(r.value) * 100 + 0.5) * (1 if r.value >= 0 else -1)
        expected[key][1] += cents
    got = {
        (r.ubucket, r.event_type): (r.n_events, r.sum_cents)
        for r in ivm_delta_agg_maintenance(spark, SF_SMOKE).collect()
    }
    assert got == {k: tuple(v) for k, v in expected.items()}


def test_weight_proportional_sample_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    expected: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for d in docs:
        if _h60(str(d.doc_id)) % 2000 < min(d.n_chars, 1000):
            expected[d.lang][0] += 1
            expected[d.lang][1] += d.n_chars
    got = {
        r.lang: (r.n_sampled, r.sum_chars_sampled)
        for r in ns_sample_weight_proportional(spark, SF_SMOKE).collect()
    }
    assert got == {k: tuple(v) for k, v in expected.items()}
    # longer docs must be over-represented vs a uniform coin: the kept
    # fraction of total chars exceeds the kept fraction of docs
    n_all = len(docs)
    c_all = sum(d.n_chars for d in docs)
    n_kept = sum(v[0] for v in expected.values())
    c_kept = sum(v[1] for v in expected.values())
    assert c_kept / c_all > n_kept / n_all


def test_pareto_frontier_is_exactly_the_non_dominated_set(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    pts = Counter()
    for d in docs:
        if d.n_chars > 0:
            toks = len([w for w in re.split(r"\s+", d.text) if w])
            pts[(d.n_chars, toks)] += 1
    keys = list(pts)
    frontier = {
        p
        for p in keys
        if not any(
            q != p and q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in keys
        )
    }
    got = {
        (r.n_chars, r.n_tokens): r.n_docs
        for r in docs_pareto_frontier(spark, SF_SMOKE).collect()
    }
    assert set(got) == frontier
    for p in frontier:
        assert got[p] == pts[p]


def _bpe_words(docs) -> list[str]:
    out = []
    for d in docs:
        if d.n_chars > 0:
            ws = [
                w
                for w in re.split("[^a-z]+", d.text.lower())
                if 1 <= len(w) <= _BPE_MAX_WORD
            ]
            out.extend(ws[:_BPE_WORDS])
    return out


def _greedy_merge(syms: list[str], pair: tuple[str, str]) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_bpe_rounds_match_reference_greedy_merge(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    corpus = [list(w) for w in _bpe_words(docs)]
    rows = {r.rnd: r for r in ns_bpe_merge_rounds(spark, SF_SMOKE).collect()}
    assert set(rows) == {1, 2}
    for rnd in (1, 2):
        counts = Counter()
        for syms in corpus:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += 1
        top = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        r = rows[rnd]
        assert (r.sym_a, r.sym_b) == top[0]
        assert r.pair_count == top[1]
        assert r.n_distinct_pairs == len(counts)
        corpus = [_greedy_merge(s, top[0]) for s in corpus]
