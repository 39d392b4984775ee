"""Bucketed-table co-location: the write-time shuffle elimination that
carries big-big joins at 100 TB (SCALE.md).  The same lineitem⋈orders
join must plan with two shuffle exchanges over plain parquet and ZERO
over bucketed tables — the plan, not the result, is the contract."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from etl_wildweb_spark.io import table, write_bucketed
from etl_wildweb_spark.plans import audit

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    loc = tempfile.mkdtemp(prefix="bucketdemo_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{loc}'")
    li = write_bucketed(
        table(spark, sf_dir, "lineitem"),
        "bucketdemo.lineitem_b",
        ["l_orderkey"],
        N_BUCKETS,
    )
    o = write_bucketed(
        table(spark, sf_dir, "orders"),
        "bucketdemo.orders_b",
        ["o_orderkey"],
        N_BUCKETS,
    )
    yield li, o
    spark.sql("DROP DATABASE bucketdemo CASCADE")
    shutil.rmtree(loc, ignore_errors=True)


def _join_plan(spark, li, o):
    # force the sort-merge path: broadcast would mask the exchange story
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )
        return audit.formatted_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_plain_join_shuffles_both_sides(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = _join_plan(spark, li, o)
    assert audit.node_count(p, "SortMergeJoin") > 0
    # two join-input exchanges + the groupBy re-partition
    assert audit.exchanges(p)["shuffle"] >= 3, audit.exchanges(p)


def test_bucketed_join_is_exchange_free(spark, bucketed):
    li, o = bucketed
    p = _join_plan(spark, li, o)
    assert audit.node_count(p, "SortMergeJoin") > 0
    # co-located scan: the ONLY shuffle left is the groupBy on a
    # different key; neither join input exchanges
    assert audit.exchanges(p)["shuffle"] == 1, audit.exchanges(p)
    assert "SelectedBucketsCount" in p or "Bucketed: true" in p, p[:2000]


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed):
    li_b, o_b = bucketed
    plain = (
        table(spark, sf_dir, "lineitem")
        .join(table(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucketed_res = (
        li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed_res.collect())
    )


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    from etl_wildweb_spark.io import write_partitioned

    o = table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    back = write_partitioned(o, str(tmp_path / "orders_part"), ["o_year"])
    filtered = back.filter(F.col("o_year") == 1996)
    plan = audit.formatted_plan(filtered)
    assert "PartitionFilters" in plan and "o_year" in plan
    # pruning is semantic too: only 1996 rows come back
    expected = o.filter(F.year("o_orderdate") == 1996).count()
    assert filtered.count() == expected > 0
