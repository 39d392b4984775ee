"""A18 submit-sink tests: chunked delivery, partial-failure semantics,
streaming foreachBatch path."""

from __future__ import annotations

from etl_wildweb_spark import registry, sinks
from pyspark.sql import functions as F

registry.load_all()


def _features(spark, n=1000, poison_ids=()):
    rows = [(i, "POISON" if i in poison_ids else "ok") for i in range(n)]
    df = spark.createDataFrame(rows, "fid long, marker string")
    return df.select(
        F.struct(
            F.concat(F.lit("wildweb-"), F.col("fid")).alias("id"),
            F.col("marker").alias("marker"),
        ).alias("feature")
    )


def test_all_features_delivered_once(spark):
    feats = _features(spark, n=1000).repartition(7)
    st = sinks.submit_features(feats, sinks.fake_post, chunk_size=100)
    rows = st.collect()
    assert all(r.ok for r in rows)
    assert sum(r.n_features for r in rows) == 1000
    # chunk size respected
    assert all(r.n_features <= 100 for r in rows)


def test_partial_failure_ships_rest(spark):
    # one poisoned feature fails its chunk; every other chunk delivers
    feats = _features(spark, n=500, poison_ids=(123,)).repartition(5)
    st = sinks.submit_features(feats, sinks.fake_post, chunk_size=50).collect()
    failed = [r for r in st if not r.ok]
    assert len(failed) == 1 and failed[0].status == 500
    delivered = sum(r.n_features for r in st if r.ok)
    assert delivered == 500 - failed[0].n_features


def test_a18_registered_query(spark, sf_dir):
    out = {r.ok: r for r in registry.QUERIES["a18_submit_sink"](spark, sf_dir).collect()}
    assert True in out and False not in out
    # delivered total == pipeline output cardinality
    want = registry.QUERIES["wildweb_pipeline"](spark, sf_dir).count()
    assert out[True].n_features == want


def test_stream_submit_foreachbatch(spark, sf_dir):
    import tempfile

    from etl_wildweb_spark.streaming.windows import events_stream

    s = events_stream(spark, sf_dir).select(
        F.struct(F.col("event_id").alias("id")).alias("feature")
    )
    q = (
        sinks.stream_submit(s, sinks.fake_post, chunk_size=1000)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.lastProgress is not None


def test_datasource_writer_manifest_counts(spark, sf_dir, tmp_path):
    """b94: the committed manifest's row total equals the delivered
    DataFrame's cardinality and chunk math holds."""
    import math

    from etl_wildweb_spark.io import table
    from etl_wildweb_spark.sinks import write_submit

    feats = (
        table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .repartition(4)
    )
    n = feats.count()
    manifest = write_submit(feats, str(tmp_path / "m"), chunk_size=300)
    assert manifest["n_rows"] == n
    assert manifest["n_tasks"] == 4
    assert manifest["n_failed_chunks"] == 0
    # each task chunks independently: total chunks between ceil(n/300)
    # (perfect packing) and 4 partial tails
    assert math.ceil(n / 300) <= manifest["n_chunks"] <= math.ceil(n / 300) + 4


def test_datasource_writer_counts_failed_chunks(spark, tmp_path):
    """Partial-delivery semantics survive the writer API: poison rows
    fail their chunk (status row, not exception) and the commit still
    lands with the failure counted."""
    from etl_wildweb_spark.sinks import write_submit

    df = spark.createDataFrame(
        [("ok-1",), ("ok-2",), ("POISON",), ("ok-3",)], "payload string"
    ).coalesce(1)
    manifest = write_submit(df, str(tmp_path / "m2"), chunk_size=2)
    assert manifest["n_rows"] == 4
    assert manifest["n_failed_chunks"] >= 1
    assert manifest["n_chunks"] >= 2


def test_stream_sink_native_writer(spark, sf_dir, tmp_path):
    """b135: the native writeStream path delivers every row exactly
    once per epoch, writes one batchId-keyed manifest per micro-batch,
    and a restart against the same checkpoint neither re-delivers nor
    double-counts (the idempotent-commit contract).  A stale manifest
    from a FOREIGN checkpoint sitting in the same dir is excluded from
    the returned list (commit-log-scoped glob, ADVICE r5)."""
    import glob
    import json
    import os

    from etl_wildweb_spark.sinks import write_submit_stream
    from etl_wildweb_spark.streaming.windows import events_stream

    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    mdir, ckdir = str(tmp_path / "m"), str(tmp_path / "ck")

    # a leftover from some earlier run with a different checkpoint:
    # its batch id (999) is not in this checkpoint's commit log
    os.makedirs(mdir, exist_ok=True)
    with open(os.path.join(mdir, "batch-999.json"), "w") as f:
        json.dump({"batch_id": 999, "n_rows": 7, "n_failed_chunks": 0}, f)

    def run():
        s = events_stream(spark, sf_dir).select(
            "event_id", "user_id", "event_type"
        )
        return write_submit_stream(s, mdir, ckdir, chunk_size=4096)

    manifests = run()
    assert 999 not in {m["batch_id"] for m in manifests}
    assert sum(m["n_rows"] for m in manifests) == n_events
    assert all(m["n_failed_chunks"] == 0 for m in manifests)
    files_before = sorted(glob.glob(f"{mdir}/batch-*.json"))

    # restart on the same checkpoint: availableNow finds nothing new
    manifests2 = run()
    files_after = sorted(glob.glob(f"{mdir}/batch-*.json"))
    assert files_after == files_before
    assert sum(m["n_rows"] for m in manifests2) == n_events  # unchanged
