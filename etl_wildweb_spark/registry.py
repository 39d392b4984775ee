"""Query + oracle registry backing the driver contract (__spark_entry__.py).

Every operator from SURVEY.md §2 registers here via the @query decorator:

    @query("b09_agg_q1", oracle="SELECT ...")
    def b09(spark, sf_dir): ...

The builder signature is ``(spark, sf_dir) -> DataFrame``.  ``oracle`` is
the equivalent DuckDB SQL over the pre-registered views (region nation
customer supplier part orders lineitem events documents embeddings); omit
it for non-SQL-expressible ops (the driver then records a rows-only
check).  Column names must match between the Spark result and the oracle —
alias everything on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .session import prepare

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(
            spark: SparkSession, sf_dir: str, *args, **kwargs
        ) -> DataFrame:
            # Re-assert runtime confs (UTC etc.) on whatever session the
            # driver hands us — correctness must not depend on its config.
            # Extra args pass through for test-harness knobs (e.g. the
            # funnel's replay_order); the driver always calls (spark, sf).
            prepare(spark)
            return fn(spark, sf_dir, *args, **kwargs)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return wrapped

    return deco


def schema_of(spark: SparkSession, sf_dir: str, name: str):
    """Result schema (StructType) of a registered query — resolved by
    Catalyst against the given corpus, no execution.  NOTE: the
    streaming rows-only queries (b23/b24) execute eagerly by design;
    introspect batch queries freely, streaming ones deliberately."""
    load_all()
    return QUERIES[name](spark, sf_dir).schema


def capabilities(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict:
    """Engine analog of the reference's capabilities endpoint
    (/root/reference/task.ts:52-65: schema(SchemaType.Input|Output) →
    TypeBox JSON-Schema for config UIs).  Publishes the ingest
    contract's declared schemas plus, on request, any registered
    query's resolved output schema — machine-readable, renderable."""
    from .ingest import wildweb

    return {
        "input": {
            "envelope": wildweb.ENVELOPE_SCHEMA.json(),
            "config": {
                "IncidentRange": list(wildweb.INCIDENT_RANGES),
                "DispatchCenters": "array<string>",
                "DEBUG": "boolean",
            },
        },
        "output": {
            "incident": wildweb.INCIDENT_SCHEMA.json(),
            "errors": wildweb.ERROR_SCHEMA.json(),
        },
        "queries": {n: schema_of(spark, sf_dir, n).json() for n in names or []},
    }


#: Explicit verification-priority order.  The driver's correctness
#: harness checks the FIRST 50 entries of ``__spark_entry__.queries()``
#: (dict insertion order) per round.  Rounds 1–3 verified every window
#: 50/50 green (CORRECTNESS_r01–r03, 0 failures).  Round 4's window =
#: the first 50 of round 3's PRIORITY_NEXT backlog, in its listed
#: order, per VERDICT r3 item 1 — all 63 backlog queries already pass
#: tests/test_oracle.py's sf0.01 DuckDB differential, so this is a
#: pure verification-window rotation with no code risk.
PRIORITY: list[str] = [
    "b32_ppm_decode",
    "b38_merge_upsert_broadcast",
    "b66_stream_scd1",
    "b67_stream_incremental_agg",
    "b68_cep_kleene",
    "b69_line_dedup",
    "b70_orc_roundtrip",
    "b71_partitioned_prune",
    "b72_stateful_sessionize",
    "b73_salted_agg",
    "b74_rolling_features",
    "b75_merge_full",
    "b76_snapshot_diff",
    "b77_interval_union",
    "b80_attribution",
    "b78_null_safe_join",
    "b85_grouped_mode",
    "b87_skyline",
    "b79_bucketed_join",
    "b83_checkpoint_recovery",
    "b82_incremental_neardup",
    "b90_temperature_mix",
    "b84_pagerank",
    "b91_stream_http_source",
    "b92_string_agg",
    "b93_window_distribution",
    "b94_datasource_writer",
    "b95_apply_in_arrow",
    "b96_udtf_analyze",
    "b97_kmeans_update",
    "b98_asof_snapshot",
    "b99_zorder_layout",
    "b100_compaction",
    "b101_group_entropy",
    "b102_markov_transitions",
    "b103_basket_pairs",
    "b104_zscore_outliers",
    "b105_event_paths",
    "b106_time_weighted_sum",
    "b107_sliding_distinct",
    "b108_dynamic_overwrite",
    "b109_heavy_hitters",
    "b110_bloom_prefilter_join",
    "b111_stream_topk",
    "b112_cohort_ltv",
    "b113_pareto_coverage",
    "b114_activity_heatmap",
    "b115_schema_evolution",
    "b116_bounce_rate",
    "b117_scd3_current",
]

#: The rotation candidates for the next round's PRIORITY: the 13
#: backlog queries that overflowed round 4's 50-slot window, plus any
#: additions made this round (kept to a handful — VERDICT r3 item 2
#: freezes new families until the never-verified backlog clears).
PRIORITY_NEXT: list[str] = [
    "b118_longest_streak",
    "b119_clamped_balance",
    "b120_record_linkage",
    "b32_ppm_resize",
    "b121_linear_interpolate",
    "b122_weekly_movers",
    "b124_group_sample_k",
    "b125_seasonal_anomaly",
    "b126_state_timeout_eviction",
    "b127_federated_union",
    "b128_slice_overlap",
    "b129_hierarchy_closure",
    "b130_token_drift",
    # round-4's sole addition (registration freeze, VERDICT r3 item 2):
    # general DAG reachability with exact path counts
    "b131_dag_path_count",
]


def ordered_queries() -> dict[str, QueryFn]:
    """All registered queries: PRIORITY (the current verification
    window) first, then PRIORITY_NEXT (this round's additions), then
    the rest in registration order.  This is the order the driver
    consumes."""
    load_all()
    head = [*PRIORITY, *PRIORITY_NEXT]
    missing = [n for n in head if n not in QUERIES]
    if missing:
        raise KeyError(f"PRIORITY names not registered: {missing}")
    rest = {n: f for n, f in QUERIES.items() if n not in set(head)}
    return {**{n: QUERIES[n] for n in head}, **rest}


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .operators import (  # noqa: F401
        analytics,
        skew,
        corpus,
        dedup,
        merge,
        mining,
        multimodal,
        packing,
        quality,
        relational,
        sampling,
        similarity,
        text,
        tpch,
        udx,
    )
    from .ingest import wildweb  # noqa: F401
    from .streaming import joins, stateful, windows  # noqa: F401
    from . import sinks  # noqa: F401
    from .sources import files, http  # noqa: F401
