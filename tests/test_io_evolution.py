"""Schema-evolution reads (io.read_evolving): merged footers, null
backfill, pushdown still intact on heterogeneous files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_wildweb_spark.io import read_evolving


@pytest.fixture()
def evolving_dir(spark, tmp_path):
    base = str(tmp_path / "evolving")
    # epoch 1: no quality column yet
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(base)
    # epoch 2: quality column added by a later ingest version
    spark.createDataFrame(
        [(3, "gamma", 0.9)], "doc_id long, text string, quality double"
    ).write.mode("append").parquet(base)
    return base


def test_merged_schema_unions_columns(spark, evolving_dir):
    df = read_evolving(spark, evolving_dir)
    assert set(df.columns) == {"doc_id", "text", "quality"}
    assert df.count() == 3
    # pre-evolution rows surface the new column as null
    assert df.filter(F.col("quality").isNull()).count() == 2


def test_defaults_backfill_missing(spark, evolving_dir):
    df = read_evolving(spark, evolving_dir, defaults={"quality": 0.5})
    got = {r.doc_id: r.quality for r in df.collect()}
    assert got == {1: 0.5, 2: 0.5, 3: 0.9}


def test_filter_on_late_column_keeps_old_files_out_safely(spark, evolving_dir):
    df = read_evolving(spark, evolving_dir, defaults={"quality": 0.5})
    # filtering on the evolved column must not error on old files
    assert df.filter(F.col("quality") >= 0.8).count() == 1
    assert df.filter(F.col("quality") < 0.8).count() == 2


def test_brand_new_column_via_defaults(spark, evolving_dir):
    df = read_evolving(spark, evolving_dir, defaults={"pipeline_version": 2})
    assert df.filter(F.col("pipeline_version") == 2).count() == 3
