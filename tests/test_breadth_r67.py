"""Brute-force property tests for plans/breadth_r67.py."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from matt3r_data_ingestion_serverless_spark.plans.breadth_r67 import (
    ns_curriculum_stages,
    type_cooccurrence_lift,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _round6(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_cooccurrence_lift_matches_python(spark):
    ev = load_table(spark, SF_SMOKE, "events").collect()
    per_user = defaultdict(set)
    for r in ev:
        per_user[r.user_id].add(r.event_type)
    n_users = len(per_user)
    with_type = Counter()
    both = Counter()
    for types in per_user.values():
        for t in types:
            with_type[t] += 1
        ts = sorted(types)
        for i, a in enumerate(ts):
            for b in ts[i + 1 :]:
                both[(a, b)] += 1
    got = {(r.type_a, r.type_b): r for r in type_cooccurrence_lift(spark, SF_SMOKE).collect()}
    assert set(got) == set(both)
    for (a, b), nb in both.items():
        r = got[(a, b)]
        assert (r.n_both, r.n_a, r.n_b) == (nb, with_type[a], with_type[b])
        assert r.lift_milli == (nb * n_users * 1000) // (with_type[a] * with_type[b])
        lift = nb * n_users / (with_type[a] * with_type[b])
        assert abs(r.lift - _round6(lift)) <= 1e-6


def _ntile4(n):
    base, rem = divmod(n, 4)
    out = []
    for q in range(1, 5):
        out.extend([q] * (base + (1 if q <= rem else 0)))
    return out


def test_curriculum_stages_match_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    toks = {
        d.doc_id: [t for t in d.text.lower().split(" ") if t != ""] for d in docs
    }
    lens = {i: len(ts) for i, ts in toks.items() if ts}
    ordered = sorted(lens.items(), key=lambda kv: (kv[1], kv[0]))
    tiles = _ntile4(len(ordered))
    stage_of = {doc: q for (doc, _), q in zip(ordered, tiles)}
    df = Counter()
    for ts in toks.values():
        for t in set(ts):
            df[t] += 1
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, tok_mass, n_tokens, hapax
    for doc, q in stage_of.items():
        cell = agg[q]
        cell[0] += 1
        cell[1] += lens[doc]
        for t in toks[doc]:
            cell[2] += 1
            cell[3] += df[t] == 1
    got = {r.stage: r for r in ns_curriculum_stages(spark, SF_SMOKE).collect()}
    assert set(got) == {1, 2, 3, 4}
    mean_prev = 0
    for q in range(1, 5):
        n_docs, mass, n_tok, hapax = agg[q]
        r = got[q]
        assert (r.n_docs, r.token_mass, r.hapax_tokens) == (n_docs, mass, hapax)
        assert r.mean_len_milli == (mass * 1000) // n_docs
        assert r.hapax_share_micro == (hapax * 1000000) // n_tok
        # the curriculum is monotone in mean length by construction
        assert r.mean_len_milli >= mean_prev
        mean_prev = r.mean_len_milli
