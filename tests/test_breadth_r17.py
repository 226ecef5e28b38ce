"""Brute-force property tests for plans/breadth_r17.py."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from matt3r_data_ingestion_serverless_spark.plans.breadth_r17 import (
    _MP_M,
    binary_auc_rank,
    ts_matrix_profile,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_auc_matches_pairwise_definition(spark):
    """AUC must equal P(score_pos > score_neg) + 0.5 P(tie) — the
    probabilistic definition, computed by brute force over all
    (pos, neg) pairs."""
    ev = load_table(spark, SF_SMOKE, "events").collect()
    pos, neg = [], []
    for r in ev:
        cents = int(math.floor(abs(r.value) * 100 + 0.5)) * (1 if r.value >= 0 else -1)
        (pos if r.event_type == "error" else neg).append(cents)
    wins = ties = 0
    neg_sorted = sorted(neg)
    import bisect

    for p in pos:
        lo = bisect.bisect_left(neg_sorted, p)
        hi = bisect.bisect_right(neg_sorted, p)
        wins += lo
        ties += hi - lo
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    r = binary_auc_rank(spark, SF_SMOKE).collect()[0]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    assert abs(r.auc - _round6(auc)) < 1e-9


def test_matrix_profile_matches_numpy(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    daily = defaultdict(lambda: defaultdict(int))
    for r in ev:
        di = (r.ts.date() - __import__("datetime").date(2024, 1, 1)).days
        v = int(math.floor(abs(r.value) + 0.5)) * (1 if r.value >= 0 else -1)
        daily[r.event_type][di] += v
    got = {
        (r.event_type, r.win_start): r
        for r in ts_matrix_profile(spark, SF_SMOKE).collect()
    }
    m = _MP_M
    for et, by_di in daily.items():
        dis = sorted(by_di)
        # windows valid only where all m consecutive day-indices exist
        starts = [
            i for i in dis if all(i + k in by_di for k in range(m))
        ]
        prof = {}
        for i in starts:
            wi = np.array([by_di[i + k] for k in range(m)], dtype=np.int64)
            si, ssi = int(wi.sum()), int((wi * wi).sum())
            if m * ssi - si * si <= 0:
                continue
            best = None
            for j in starts:
                if j == i:
                    continue
                wj = np.array([by_di[j + k] for k in range(m)], dtype=np.int64)
                sj, ssj = int(wj.sum()), int((wj * wj).sum())
                if m * ssj - sj * sj <= 0:
                    continue
                d = int((wi * wj).sum())
                num = float(m * d - si * sj)
                dist = 2.0 * m * (
                    1.0 - num / (math.sqrt(m * ssi - si * si) * math.sqrt(m * ssj - sj * sj))
                )
                dm = int(math.floor(dist * 1e6 + 0.5))
                key = dm * 1000 + j
                if best is None or key < best[0]:
                    best = (key, j, dm)
            if best:
                prof[i] = (best[1], best[2])
        for i, (j, dm) in prof.items():
            r = got[(et, i)]
            assert (r.nn_start, r.dist_micro) == (j, dm), (et, i)
        assert {k[1] for k in got if k[0] == et} == set(prof)


def test_assortativity_matches_python(spark):
    from matt3r_data_ingestion_serverless_spark.plans.breadth_r17 import (
        graph_assortativity,
    )
    from matt3r_data_ingestion_serverless_spark.plans.northstar import (
        ns_dedup_minhash_lsh,
    )

    pairs = [
        (r.doc_a, r.doc_b)
        for r in ns_dedup_minhash_lsh(spark, SF_SMOKE).select("doc_a", "doc_b").collect()
    ]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    de = [
        (len(adj[u]), len(adj[w])) for u in adj for w in adj[u]
    ]
    r = graph_assortativity(spark, SF_SMOKE).collect()[0]
    assert r.n_directed_edges == len(de)
    n = len(de)
    sx = sum(x for x, _ in de)
    sy = sum(y for _, y in de)
    sxy = sum(x * y for x, y in de)
    sxx = sum(x * x for x, _ in de)
    syy = sum(y * y for _, y in de)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx > 0 and vy > 0:
        expect = _round6((n * sxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)))
        assert abs(r.assortativity - expect) < 1e-9
    else:
        assert r.assortativity is None


def test_source_diversity_matches_python(spark):
    from matt3r_data_ingestion_serverless_spark.plans.breadth_r17 import (
        ns_source_diversity,
    )

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    counts = defaultdict(lambda: defaultdict(int))
    for d in docs:
        counts[d.lang][d.source] += 1
    got = {r.lang: r for r in ns_source_diversity(spark, SF_SMOKE).collect()}
    assert set(got) == set(counts)
    for lang, by_src in counts.items():
        total = sum(by_src.values())
        pair_same = sum(n * (n - 1) for n in by_src.values())
        r = got[lang]
        assert (r.n_docs, r.source_richness) == (total, len(by_src))
        if total > 1:
            assert abs(
                r.simpson_diversity - _round6(1.0 - pair_same / (total * (total - 1)))
            ) < 1e-9
        assert abs(r.berger_parker - _round6(max(by_src.values()) / total)) < 1e-9
