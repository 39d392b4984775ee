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


def test_b145_zorder_prunes_both_dimensions(spark, sf_dir):
    """The Z-layout's measurable claim: for a suppkey-only box query a
    partkey-sorted layout can prune NOTHING (every bucket spans the
    full suppkey range) while the Z-layout touches a small fraction of
    buckets; for a partkey-only query the Z-layout still touches far
    fewer than all buckets (the documented trade: slightly worse than
    the dedicated single-column sort, usable on BOTH columns)."""
    import pyspark.sql.functions as F

    from etl_wildweb_spark import registry
    from etl_wildweb_spark.io import table

    registry.load_all()
    zboxes = [
        (r.min_pk, r.max_pk, r.min_sk, r.max_sk)
        for r in registry.QUERIES["b145_zorder_layout"](
            spark, sf_dir
        ).collect()
    ]
    # baseline layout: same bucket count, contiguous partkey ranges
    li = table(spark, sf_dir, "lineitem")
    pkmax = li.agg(F.max("l_partkey")).collect()[0][0]
    pboxes = [
        (r.min_pk, r.max_pk, r.min_sk, r.max_sk)
        for r in (
            li.groupBy(
                F.expr(f"(l_partkey * 32) div ({pkmax} + 1)").alias("b")
            ).agg(
                F.min("l_partkey").alias("min_pk"),
                F.max("l_partkey").alias("max_pk"),
                F.min("l_suppkey").alias("min_sk"),
                F.max("l_suppkey").alias("max_sk"),
            )
        ).collect()
    ]
    skmax = li.agg(F.max("l_suppkey")).collect()[0][0]

    def touched(boxes, pk_rng, sk_rng):
        return sum(
            1
            for (p0, p1, s0, s1) in boxes
            if p1 >= pk_rng[0] and p0 <= pk_rng[1]
            and s1 >= sk_rng[0] and s0 <= sk_rng[1]
        )

    # suppkey-only box (~20% of the suppkey domain), full partkey range
    sk_q = (skmax // 2, skmax // 2 + skmax // 5)
    z_sk = touched(zboxes, (0, pkmax), sk_q)
    p_sk = touched(pboxes, (0, pkmax), sk_q)
    assert p_sk == len(pboxes), "pk-sort must be useless for sk queries"
    assert z_sk * 2 <= p_sk, (z_sk, p_sk)

    # partkey-only box (~10% of the partkey domain), full suppkey range
    pk_q = (pkmax // 2, pkmax // 2 + pkmax // 10)
    z_pk = touched(zboxes, pk_q, (0, skmax))
    p_pk = touched(pboxes, pk_q, (0, skmax))
    assert p_pk <= 5, "dedicated sort should prune near-perfectly"
    assert z_pk < len(zboxes) // 2, (z_pk, len(zboxes))
