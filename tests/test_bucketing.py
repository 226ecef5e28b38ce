"""Plan-level proof that bucketed tables eliminate the join shuffle
(SCALE.md §2: 'co-locate joins via bucketing')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matt3r_data_ingestion_serverless_spark.operators.bucketing import (
    n_exchanges,
    write_bucketed,
)
from matt3r_data_ingestion_serverless_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def bucketed_tables(spark):
    # warehouse dir is set statically in session.py (outside the repo)
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_orderdate")
    write_bucketed(li, "li_b", bucket_col="l_orderkey", n_buckets=8, sort_col="l_orderkey")
    write_bucketed(o, "o_b", bucket_col="o_orderkey", n_buckets=8, sort_col="o_orderkey")
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_b, o_b = spark.table("li_b"), spark.table("o_b")
    # disable broadcast so the planner MUST consider a shuffle join —
    # bucket co-location is what removes the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey).groupBy(
            "o_orderdate"
        )
        agg = joined.agg(F.sum("l_extendedprice").alias("rev"))
        plain = agg.count()  # force planning + execution
        # the join itself: zero Exchange (the groupBy adds its own)
        j = li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey).select("l_extendedprice")
        j.count()
        assert n_exchanges(spark, j) == 0
        # correctness: same result as the unbucketed join
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders")
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert j.count() == want and plain > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
