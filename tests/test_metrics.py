"""A20 observability: df.observe counters collected during the action
(no second scan), mirroring the reference's per-center logged counts
(/root/reference/task.ts:94-106)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_wildweb_spark.ingest.wildweb import _synth_incidents, filter_valid_geo
from etl_wildweb_spark.metrics import ingest_counters, observed


def test_observed_resolves_after_action(spark, sf_dir):
    df, obs = observed(
        spark.range(100).toDF("n"),
        "demo",
        F.count(F.lit(1)).alias("rows"),
        F.sum("n").alias("total"),
    )
    df.write.format("noop").mode("overwrite").save()
    assert obs.get == {"rows": 100, "total": 4950}


def test_ingest_counters_match_pipeline_counts(spark, sf_dir):
    incidents = _synth_incidents(spark, sf_dir)
    counted, obs = ingest_counters(incidents)
    n_out = filter_valid_geo(counted).count()
    m = obs.get
    assert m["n_rows"] == incidents.count()
    # the geo counter is exactly the geo filter's selectivity
    assert m["n_valid_geo"] == n_out
    assert 0 < m["n_parseable_date"] <= m["n_rows"]
