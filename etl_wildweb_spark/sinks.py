"""Submit sink — the reference's A18 boundary, distributed.

The reference POSTs one FeatureCollection to the CloudTAK layer
endpoint per run (/root/reference/task.ts:149) and submits even when
some centers failed (partial results shipped, errors escalated after —
task.ts:151-157).  A 100 TB engine can't funnel features through the
driver, so the sink is per-partition chunked submission:

  * each executor task groups its features into FeatureCollection
    chunks of ``chunk_size`` and POSTs each chunk independently;
  * failures are *status rows*, not exceptions — at-least-once with
    partial delivery, the reference's semantics (CHANGELOG.md:63
    "Error resilience") generalized;
  * streaming uses the same code path via ``foreachBatch`` — one
    delivery wave per micro-batch, idempotent downstream because
    feature ids are stable (A12: 'wildweb-' + uuid).

Transports are injectable exactly like sources/http.py: tests and the
registered query use a hermetic fake; production swaps one callable.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

STATUS_SCHEMA = "chunk_id string, n_features bigint, status int, ok boolean"

PostFn = Callable[[str], int]  # FeatureCollection JSON -> HTTP status


def fake_post(fc_json: str) -> int:
    """Hermetic transport double: accepts everything except collections
    carrying the poison marker (lets tests exercise partial failure)."""
    return 500 if "POISON" in fc_json else 200


def https_post(url: str) -> PostFn:
    """Production transport factory (stdlib, import-gated)."""

    def post(fc_json: str) -> int:
        import urllib.request

        req = urllib.request.Request(
            url, data=fc_json.encode(), headers={"Content-Type": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=30) as resp:  # noqa: S310
            return resp.status

    return post


def submit_features(
    features: DataFrame, post: PostFn = fake_post, chunk_size: int = 500
) -> DataFrame:
    """POST features as FeatureCollection chunks, per partition.

    Input: a DataFrame with a ``feature`` struct column (to_features
    output).  Returns one status row per chunk — delivery outcomes are
    data, queryable and joinable against the error channel."""
    payloads = features.select(F.to_json("feature").alias("fj"))

    def send(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        seq = 0

        def flush(chunk: list[str]) -> pd.DataFrame:
            nonlocal seq
            fc = '{"type":"FeatureCollection","features":[' + ",".join(chunk) + "]}"
            try:
                status = post(fc)
            except Exception:
                status = 0  # transport-level failure
            row = pd.DataFrame(
                {
                    "chunk_id": [f"p{pid}c{seq}"],
                    "n_features": [len(chunk)],
                    "status": [status],
                    "ok": [200 <= status < 300],
                }
            )
            seq += 1
            return row

        buf: list[str] = []
        for pdf in batches:
            for fj in pdf["fj"]:
                buf.append(fj)
                if len(buf) >= chunk_size:
                    yield flush(buf)
                    buf = []
        if buf:
            yield flush(buf)

    return payloads.mapInPandas(send, STATUS_SCHEMA)


def stream_submit(
    features_stream: DataFrame, post: PostFn = fake_post, chunk_size: int = 500
):
    """Streaming A18: same chunked submit per micro-batch via
    foreachBatch.  Returns the DataStreamWriter (caller starts it)."""

    def deliver(batch_df: DataFrame, epoch_id: int) -> None:
        # count() forces full delivery of the wave; statuses could also
        # be appended to a delivery-log table here
        submit_features(batch_df, post, chunk_size).count()

    return features_stream.writeStream.foreachBatch(deliver)


from .registry import query  # noqa: E402


@query("a18_submit_sink")  # delivery statuses, chunking is partition-dependent → rows-only
def a18_submit_sink(spark, sf_dir: str) -> DataFrame:
    """A18 end-to-end: run the synthetic WildWeb pipeline, deliver the
    features through the chunked submit sink (fake transport), report
    delivered-feature totals per outcome.  Total delivered features
    equals the pipeline's output cardinality (asserted in
    tests/test_sinks.py along with partial-failure semantics)."""
    from .ingest.wildweb import (
        _SYNTH_NOW,
        _synth_incidents,
        filter_time_range,
        filter_valid_geo,
        normalize_dates,
        to_features,
    )

    incidents = _synth_incidents(spark, sf_dir)
    in_window = filter_time_range(
        incidents, "1 Week", F.lit(_SYNTH_NOW).cast("timestamp")
    )
    dated, _ = normalize_dates(in_window)
    features = to_features(filter_valid_geo(dated))
    statuses = submit_features(features, fake_post, chunk_size=200)
    return statuses.groupBy("ok").agg(
        F.sum("n_features").alias("n_features"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
