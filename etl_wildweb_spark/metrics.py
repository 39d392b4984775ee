"""Observability (SURVEY.md §2 A20): the reference's per-center
``console.log`` counters (/root/reference/task.ts:94-106 — request
start, 0-message, N-message counts; DEBUG flag task.ts:41-44) become
``df.observe`` metrics — collected ON the executors DURING the action,
no second pass, no driver-side count() re-scans.

At 100 TB a separate ``df.count()`` per stage would double every scan;
``observe`` piggybacks metric accumulation on the one pass the job
already makes (same mechanism as Spark's own SQL metrics).  Streaming
plans report the identical metrics per micro-batch through
``StreamingQueryProgress.observedMetrics``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named observed metrics to a plan.  Metrics resolve after
    the first action on the returned DataFrame via ``obs.get``."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def ingest_counters(df: DataFrame) -> tuple[DataFrame, Observation]:
    """The reference's logged counters (task.ts:94-106) as one observed
    metric set: total rows, rows with valid geometry, rows with a
    parseable date — evaluated inline during whatever action consumes
    ``df`` (requires the raw incident columns, i.e. attach before
    to_features)."""
    from .functions.js_compat import geo_valid

    return observed(
        df,
        "ingest",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (geo_valid("longitude") & geo_valid("latitude")).cast("long")
        ).alias("n_valid_geo"),
        F.sum(F.try_to_timestamp("date").isNotNull().cast("long")).alias(
            "n_parseable_date"
        ),
    )
