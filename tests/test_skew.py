"""Salted-join equivalence: identical rows to the plain join, with the
big side's shuffle scattered over (key, salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_wildweb_spark.io import table
from etl_wildweb_spark.operators.skew import salted_join
from etl_wildweb_spark.plans import audit


def _flag_dim(spark):
    return spark.createDataFrame(
        [("A", "returned"), ("N", "kept"), ("R", "refunded")],
        ["l_returnflag", "flag_desc"],
    )


def test_salted_join_row_identical(spark, sf_dir):
    # l_returnflag: 3 values over the whole fact table — maximal skew
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    dim = _flag_dim(spark)
    plain = li.join(dim, ["l_returnflag"]).groupBy("flag_desc").count()
    salted = salted_join(li, dim, ["l_returnflag"], n_salts=8).groupBy(
        "flag_desc"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_outer_keeps_unmatched(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    dim = _flag_dim(spark).filter(F.col("l_returnflag") != "A")  # drop one key
    plain = li.join(dim, ["l_returnflag"], "left")
    salted = salted_join(li, dim, ["l_returnflag"], n_salts=8, how="left")
    assert plain.count() == salted.count()
    assert (
        salted.filter(F.col("flag_desc").isNull()).count()
        == plain.filter(F.col("flag_desc").isNull()).count()
        > 0
    )


def test_salt_is_deterministic(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    dim = _flag_dim(spark)
    a = salted_join(li, dim, ["l_returnflag"], n_salts=8)
    # same plan twice → same rows (a rand() salt would not survive this
    # under retries; xxhash64 of the row does)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, a.collect()))
