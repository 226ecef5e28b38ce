"""Brute-force property tests for plans/breadth_r19.py."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r19 import (
    _BOOT_B,
    _MIX_BUDGET,
    _NOISE_16THS,
    ns_bootstrap_se,
    ns_crowd_label_majority,
    ns_mixture_temperature,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

LANGS = ["de", "en", "es", "fr", "zh"]


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _vote(a: int, doc_id: int, true_lang: str) -> str:
    h = _h(f"ann{a}-{doc_id}")
    if h % 16 < _NOISE_16THS[a]:
        return LANGS[(h >> 4) % 5]
    return true_lang


def test_crowd_majority_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    agree_m = Counter()
    agree_t = Counter()
    for d in docs:
        votes = {a: _vote(a, d.doc_id, d.lang) for a in _NOISE_16THS}
        counts = Counter(votes.values())
        majority = max(
            counts, key=lambda v: counts[v] * 1_000_000 - (LANGS.index(v) + 1)
        )
        for a, v in votes.items():
            if v == majority:
                agree_m[a] += 1
            if v == d.lang:
                agree_t[a] += 1
    got = {r.annotator: r for r in ns_crowd_label_majority(spark, SF_SMOKE).collect()}
    assert set(got) == set(_NOISE_16THS)
    for a in _NOISE_16THS:
        r = got[a]
        assert r.n_votes == len(docs)
        assert (r.agree_majority, r.agree_truth) == (agree_m[a], agree_t[a]), a
        assert abs(r.majority_agreement - _round6(agree_m[a] / len(docs))) < 1e-12
    # annotator 3 (least noisy) must beat annotator 1 (noisiest) on truth
    assert got[3].agree_truth > got[1].agree_truth


def test_mixture_temperature_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    counts = Counter(d.lang for d in docs)
    z = 0.0
    for lang in sorted(counts):
        z += math.sqrt(counts[lang])
    got = {r.lang: r for r in ns_mixture_temperature(spark, SF_SMOKE).collect()}
    assert set(got) == set(counts)
    total_weight = 0.0
    for lang, n in counts.items():
        share = math.sqrt(n) / z
        r = got[lang]
        assert r.n_docs == n
        assert abs(r.mix_weight - _round6(share)) < 1e-12
        assert r.budget_docs == math.floor(share * _MIX_BUDGET)
        total_weight += share
    assert abs(total_weight - 1.0) < 1e-9
    # temperature sampling compresses the mix: the rarest language's
    # weight exceeds its proportional share, the commonest falls below
    n_tot = sum(counts.values())
    rare = min(counts, key=counts.get)
    common = max(counts, key=counts.get)
    assert got[rare].mix_weight > counts[rare] / n_tot
    assert got[common].mix_weight < counts[common] / n_tot


def test_bootstrap_se_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    by_source = defaultdict(list)
    for d in docs:
        by_source[d.source].append((d.doc_id, d.n_chars))
    got = {r.source: r for r in ns_bootstrap_se(spark, SF_SMOKE).collect()}
    for src, members in by_source.items():
        means = []
        for b in range(_BOOT_B):
            sw = tw = 0
            for doc_id, n_chars in members:
                w = _h(f"boot-{b}-{doc_id}") % 4
                sw += w * n_chars
                tw += w
            if tw > 0:
                means.append(sw / tw)
        s1 = s2 = 0.0
        for m in means:  # b-ordered fold, like the plan
            s1 += m
        for m in means:
            s2 += m * m
        nb = len(means)
        se = math.sqrt((s2 - s1 * s1 / nb) / (nb - 1))
        r = got[src]
        assert r.n_replicates == nb, src
        assert abs(r.boot_mean - _round6(s1 / nb)) < 1e-9
        assert abs(r.boot_se - _round6(se)) < 1e-9
