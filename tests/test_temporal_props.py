"""Property-based invariants for the temporal operators (hypothesis):
interval coalescing and the stationary zero-run sessionizer, checked
against brute-force Python models on arbitrary generated inputs — the
same strategy the decode layer uses for bit-level round-trips.

Spark invocations are batched per example via a module session; input
sizes stay small (the properties concern SEMANTICS, not scale — scale
properties live in test_plan_shapes.py / SCALE.md).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from matt3r_data_ingestion_serverless_spark.operators.temporal import coalesce_intervals

_settings = settings(
    max_examples=12,  # each example is a Spark job — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

intervals_strategy = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 30)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=0,
    max_size=12,
)


def _model_coalesce(iv: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Brute-force model: sort, then merge overlapping-or-touching."""
    out: list[list[int]] = []
    for s, e in sorted(iv):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return [tuple(x) for x in out]


@given(intervals_strategy)
@_settings
def test_coalesce_matches_bruteforce_model(spark, iv):
    if not iv:
        return
    df = spark.createDataFrame(
        [("k", s, e) for s, e in iv], "key string, start_us long, end_us long"
    )
    got = {
        (r.start_us, r.end_us)
        for r in coalesce_intervals(df, key="key", start="start_us", end="end_us").collect()
    }
    assert got == set(_model_coalesce(iv))


@given(intervals_strategy)
@_settings
def test_coalesce_is_idempotent(spark, iv):
    if not iv:
        return
    df = spark.createDataFrame(
        [("k", s, e) for s, e in iv], "key string, start_us long, end_us long"
    )
    once = coalesce_intervals(df, key="key", start="start_us", end="end_us")
    twice = coalesce_intervals(once.drop("n_merged"), key="key", start="start_us", end="end_us")
    assert {(r.start_us, r.end_us) for r in once.collect()} == {
        (r.start_us, r.end_us) for r in twice.collect()
    }
