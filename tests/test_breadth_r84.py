"""Brute-force property tests for plans/breadth_r84.py."""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r84 import (
    _CHANNELS,
    _CUPED_SPLIT,
    _N_CH,
    _NPROBES,
    _TOPK,
    _W1_A,
    _W1_B,
    ab_cuped_adjustment,
    attribution_shapley_subsets,
    drift_wasserstein_1d,
    ns_ivf_recall_curve,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_shapley_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    fp = {}
    for r in ev:
        if r.event_type == "purchase":
            fp[r.user_id] = min(fp.get(r.user_id, r.ts), r.ts)
    touch = defaultdict(set)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type != "purchase" and (
            r.user_id not in fp or r.ts < fp[r.user_id]
        ):
            touch[r.user_id].add(r.event_type)
    n_users = defaultdict(int)
    n_conv = defaultdict(int)
    bit = {ch: 1 << i for i, ch in enumerate(_CHANNELS)}
    for u in users:
        m = sum(bit[t] for t in touch[u])
        n_users[m] += 1
        n_conv[m] += u in fp
    v = {
        m: (n_conv[m] / n_users[m] if n_users[m] else 0.0)
        for m in range(1 << _N_CH)
    }
    want = {}
    for i, ch in enumerate(_CHANNELS):
        b = 1 << i
        tot = 0.0
        for s in range(1 << _N_CH):
            if s & b:
                continue
            size = bin(s).count("1")
            w = (
                math.factorial(size)
                * math.factorial(_N_CH - 1 - size)
                / math.factorial(_N_CH)
            )
            tot += w * (v[s | b] - v[s])
        want[ch] = tot
    got = {
        r.channel: r.shapley_r
        for r in attribution_shapley_subsets(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for ch in want:
        assert math.isclose(got[ch], want[ch], abs_tol=1e-6), (ch, got[ch], want[ch])
    # efficiency axiom: credits sum to v(grand coalition) - v(empty set)
    grand = (1 << _N_CH) - 1
    assert math.isclose(sum(want.values()), v[grand] - v[0], abs_tol=1e-9)


def test_wasserstein_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    a = sorted(
        int(math.floor(r.value * 100 + 0.5)) for r in ev if r.event_type == _W1_A
    )
    b = sorted(
        int(math.floor(r.value * 100 + 0.5)) for r in ev if r.event_type == _W1_B
    )
    support = sorted(set(a) | set(b))
    w1 = 0.0
    for c, nxt in zip(support, support[1:]):
        ca = sum(1 for x in a if x <= c) / len(a)
        cb = sum(1 for x in b if x <= c) / len(b)
        w1 += abs(ca - cb) * (nxt - c)
    row = drift_wasserstein_1d(spark, SF_SMOKE).collect()[0]
    assert (row.na, row.nb, row.n_support) == (len(a), len(b), len(support))
    assert math.isclose(row.w1_r, w1 / 100, abs_tol=1e-6)
    assert row.w1_r > 0


def test_cuped_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    split = dt.datetime.fromisoformat(_CUPED_SPLIT)
    xy = defaultdict(lambda: [0, 0])
    for r in ev:
        c = int(math.floor(r.value * 100 + 0.5))
        xy[r.user_id][0 if r.ts < split else 1] += c
    n = len(xy)
    sx = sum(v[0] for v in xy.values())
    sy = sum(v[1] for v in xy.values())
    sxy = sum(v[0] * v[1] for v in xy.values())
    sxx = sum(v[0] * v[0] for v in xy.values())
    syy = sum(v[1] * v[1] for v in xy.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    mx_pool = sx / n
    rows = {r.variant: r for r in ab_cuped_adjustment(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1}
    for variant, r in rows.items():
        us = [u for u in xy if u % 2 == variant]
        my = sum(xy[u][1] for u in us) / len(us)
        mx = sum(xy[u][0] for u in us) / len(us)
        assert r.n_users == len(us)
        assert math.isclose(r.mean_y_r, my / 100, abs_tol=1e-6)
        assert math.isclose(
            r.mean_y_adj_r, (my - theta * (mx - mx_pool)) / 100, abs_tol=1e-6
        )
        assert math.isclose(r.theta_r, theta, abs_tol=1e-6)
        assert math.isclose(r.rho2_r, rho2, abs_tol=1e-6)
    assert 0 <= rho2 <= 1


def test_ivf_recall_curve_monotone_and_bounded(spark):
    rows = {r.nprobe: r for r in ns_ivf_recall_curve(spark, SF_SMOKE).collect()}
    assert set(rows) == set(_NPROBES)
    nq = {r.n_queries for r in rows.values()}
    assert len(nq) == 1 and nq.pop() > 0
    rec = [rows[p].recall_r for p in sorted(_NPROBES)]
    assert all(0.0 <= r <= 1.0 for r in rec)
    # more probes can only add candidates: recall is non-decreasing
    assert rec == sorted(rec)
    # probing every cell (nprobe >= k cells = 4 labels... smoke has
    # len(labels) cells) must beat or equal the 1-probe recall strictly
    # unless already perfect
    assert rec[-1] >= rec[0]


def test_ivf_recall_at_full_probe_is_one(spark):
    """Probing ALL cells makes IVF exhaustive — recall must be exactly
    1.0 against the brute-force oracle (top-k ties break on match_id in
    both plans, so the lists coincide element-for-element)."""
    from matt3r_data_ingestion_serverless_spark.plans.northstar import (
        _ivf_topk,
        ns_ann_cosine_topk,
    )

    n_cells = (
        load_table(spark, SF_SMOKE, "embeddings").select("label").distinct().count()
    )
    ivf = _ivf_topk(spark, SF_SMOKE, nprobe=n_cells).select(
        "query_id", "match_id"
    )
    brute = ns_ann_cosine_topk(spark, SF_SMOKE).select("query_id", "match_id")
    assert ivf.exceptAll(brute).count() == 0
    assert brute.exceptAll(ivf).count() == 0
    assert brute.count() > 0
