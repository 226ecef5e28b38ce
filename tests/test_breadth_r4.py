"""Brute-force property tests for plans/breadth_r4.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.plans.breadth_r4 import (
    _KM_K,
    _ZIPF_TOP,
    kmeans_embeddings,
    ns_zipf_slope,
    scd2_pit_join,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_kmeans_matches_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    ids = np.array([r.vec_id for r in emb])
    X = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    cents = X[np.argsort(ids)][: _KM_K]  # vec_id < K, in id order

    def assign(c):
        d2 = (
            (X * X).sum(1)[:, None] - 2 * X @ c.T + (c * c).sum(1)[None, :]
        )
        d2u = np.floor(d2 * 1e6 + 0.5).astype(np.int64)
        # argmin with tie-break on cluster id = plain argmin (first min)
        return d2u.argmin(1), d2u

    lab1, _ = assign(cents)
    c1 = np.zeros_like(cents)
    for k in range(_KM_K):
        c1[k] = [ _round6(v) for v in X[lab1 == k].mean(0) ]
    lab2, d2u = assign(c1)
    exp_sizes = Counter(lab2.tolist())
    exp_inertia = defaultdict(int)
    for i, k in enumerate(lab2):
        exp_inertia[int(k)] += int(d2u[i, k])
    out = {r.cid: r for r in kmeans_embeddings(spark, SF_SMOKE).collect()}
    assert {k: v.n_members for k, v in out.items()} == dict(exp_sizes)
    for k, r in out.items():
        assert r.inertia_micro == exp_inertia[k], k


def test_scd2_pit_every_order_matches_one_version(spark):
    rows = scd2_pit_join(spark, SF_SMOKE).collect()
    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_custkey") <= 1000)
        .collect()
    )
    # every qualifying order attributed exactly once
    assert sum(r.n_orders for r in rows) == len(orders)
    assert sum(r.revenue_cents for r in rows) == sum(
        round(o.o_totalprice * 100) for o in orders
    )
    # leakage rule: DELINQUENT segment only carries orders on/after eff date
    from matt3r_data_ingestion_serverless_spark.plans.llmprep import _SCD2_EFF

    eff_year = int(_SCD2_EFF[:4])
    for r in rows:
        if r.segment == "DELINQUENT":
            assert r.order_year >= eff_year


def test_zipf_slope_matches_numpy(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    vocab = Counter(t for r in docs for t in r.text.split(" ") if t)
    ranked = sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOP]
    x = np.log(np.arange(1, len(ranked) + 1, dtype=np.float64))
    y = np.log(np.array([c for _, c in ranked], dtype=np.float64))
    slope = np.polyfit(x, y, 1)[0]
    r = ns_zipf_slope(spark, SF_SMOKE).collect()[0]
    assert r.n_terms == len(ranked)
    assert abs(r.zipf_slope - slope) < 1e-4
    assert r.zipf_slope < 0  # frequency decreases with rank
    assert 0.0 <= r.r2 <= 1.0


def test_semdedup_matches_numpy(spark):
    from matt3r_data_ingestion_serverless_spark.plans.breadth_r4 import (
        _SEM_TAU,
        ns_semdedup_clusters,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    ids = np.array([r.vec_id for r in emb])
    order = np.argsort(ids)
    ids, X = ids[order], np.array([list(r.embedding) for r in emb], dtype=np.float64)[order]
    cents = X[: _KM_K]
    d2 = (X * X).sum(1)[:, None] - 2 * X @ cents.T + (cents * cents).sum(1)[None, :]
    lab = np.floor(d2 * 1e6 + 0.5).astype(np.int64).argmin(1)
    nrm = np.linalg.norm(X, axis=1)
    exp = {}
    for k in range(_KM_K):
        members = np.where(lab == k)[0]
        dropped = set()
        for i_pos, i in enumerate(members):
            for j in members[i_pos + 1:]:
                cos = round(float(X[i] @ X[j] / (nrm[i] * nrm[j])), 6)
                if cos >= _SEM_TAU:
                    dropped.add(int(ids[j]))
        exp[k] = (len(members), len(dropped))
    out = {r.cid: r for r in ns_semdedup_clusters(spark, SF_SMOKE).collect()}
    for k, (n, nd) in exp.items():
        if n == 0:
            assert k not in out
            continue
        assert (out[k].n_members, out[k].n_dropped, out[k].n_kept) == (n, nd, n - nd)


def test_shard_balance_totals(spark):
    from matt3r_data_ingestion_serverless_spark.plans.breadth_r4 import (
        _N_SHARDS,
        ns_shard_balance_audit,
    )

    docs = load_table(spark, SF_SMOKE, "documents").collect()
    rows = ns_shard_balance_audit(spark, SF_SMOKE).collect()
    assert sum(r.n_docs for r in rows) == len(docs)
    assert sum(r.total_tokens for r in rows) == sum(len(d.text.split(" ")) for d in docs)
    assert len(rows) <= _N_SHARDS
    # load factors average ~1 over the ideal split
    avg = sum(r.load_factor * 1 for r in rows) / len(rows)
    assert 0.5 < avg < 1.5
