"""Brute-force property tests for plans/breadth_r22.py."""

from __future__ import annotations

import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r22 import (
    graph_clustering_coefficient,
    ns_vocab_overlap_matrix,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_vocab_overlap_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    vocab = defaultdict(set)
    for d in docs:
        vocab[d.source].update(d.text.lower().split(" "))
    got = {
        (r.source_a, r.source_b): r
        for r in ns_vocab_overlap_matrix(spark, SF_SMOKE).collect()
    }
    sources = sorted(vocab)
    expected_keys = set()
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                continue
            expected_keys.add((a, b))
            r = got[(a, b)]
            union = len(vocab[a] | vocab[b])
            assert (r.vocab_a, r.vocab_b, r.shared_terms) == (
                len(vocab[a]),
                len(vocab[b]),
                inter,
            ), (a, b)
            assert abs(r.jaccard - _round6(inter / union)) < 1e-12
            assert abs(
                r.containment - _round6(inter / min(len(vocab[a]), len(vocab[b])))
            ) < 1e-12
    assert set(got) == expected_keys


def test_clustering_coefficient_matches_python(spark):
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
    got = {r.doc_id: r for r in graph_clustering_coefficient(spark, SF_SMOKE).collect()}
    assert set(got) == set(adj)
    for v, nbrs in adj.items():
        tri = sum(1 for u in nbrs for w in nbrs if u < w and w in adj[u]) if nbrs else 0
        d = len(nbrs)
        r = got[v]
        assert (r.degree, r.n_triangles) == (d, tri), v
        if d >= 2:
            assert abs(r.clustering_coef - _round6(2.0 * tri / (d * (d - 1)))) < 1e-12
        else:
            assert r.clustering_coef is None
