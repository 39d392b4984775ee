"""B33 connector tests: partitioning, throttling, error-channel rows,
end-to-end pipeline consumption (hermetic fake transport)."""

from __future__ import annotations

import time

from etl_wildweb_spark import registry
from etl_wildweb_spark.ingest.wildweb import run_pipeline
from etl_wildweb_spark.sources import http as src
from pyspark.sql import functions as F

registry.load_all()

CENTERS = ["AAA", "BBB", "CCC", "DDD", "EEE_ERR", "FFF_NULL", "GGG_MULTI", "HHH_BAD"]


def test_partition_count_bounded_by_concurrency():
    r = src.HttpCentersReader(
        {"centers": ",".join(CENTERS), "maxConcurrency": "3", "transport": "fake"}
    )
    parts = r.partitions()
    assert len(parts) == 3
    got = sorted(c for p in parts for c in p.centers)
    assert got == sorted(CENTERS)


def test_fetch_rows_and_error_flags(spark):
    df = src.read_centers(spark, CENTERS, max_concurrency=4, transport="fake")
    rows = {r.center: r for r in df.collect()}
    assert len(rows) == len(CENTERS)
    assert rows["AAA"].http_ok and rows["AAA"].status == 200
    assert not rows["EEE_ERR"].http_ok and rows["EEE_ERR"].status == 500
    # failed center exhausted its retries
    assert rows["EEE_ERR"].attempts == 3
    assert rows["AAA"].attempts == 1


def test_rate_limiter_enforces_min_interval():
    lim = src.RateLimiter(rate=50)  # 20ms interval
    t0 = time.monotonic()
    for _ in range(5):
        lim.acquire()
    elapsed = time.monotonic() - t0
    assert elapsed >= 4 * 0.02 * 0.9  # 4 gaps, slack for timer coarseness


def test_pipeline_consumes_connector_output(spark):
    raw = src.read_centers(spark, CENTERS, max_concurrency=4, transport="fake")
    features, errors = run_pipeline(raw, None, F.current_timestamp())
    feat_centers = {r.center for r in features.select("center").distinct().collect()}
    err = {(r.center, r.stage) for r in errors.select("center", "stage").collect()}
    assert {"AAA", "BBB", "CCC", "DDD"} <= feat_centers
    assert ("EEE_ERR", "fetch") in err
    assert ("GGG_MULTI", "envelope") in err
    assert ("HHH_BAD", "decode") in err
    # _NULL → zero rows, no error (task.ts:99-104 semantics)
    assert "FFF_NULL" not in {c for c, _ in err}
    assert "FFF_NULL" not in feat_centers


def test_b33_registered_query(spark, sf_dir):
    out = {r.center: r for r in registry.QUERIES["b33_http_ingest"](spark, sf_dir).collect()}
    assert out["NVSFC_ERR"].n_errors == 1 and out["NVSFC_ERR"].n_features == 0
    assert out["AZPDC"].n_features >= 1 and out["AZPDC"].n_errors == 0
