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
    Catalyst against the given corpus, usually without execution.
    NOTE the exceptions: the streaming rows-only queries (b23/b24)
    execute eagerly by design, and the iterative/fixture builders
    (connected-components family b29_dup_clusters/b29_cc_bigstar/
    b144, the checkpointed closures b129/b131, b139's materialized
    coverage set, the side-effecting connector demos) run work at
    build time — introspect plain batch queries freely, these
    deliberately."""
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
#: (dict insertion order) per round.  Round 9's window, per VERDICT r8
#: items 1/5: the three r03-stale confirmations first (the only
#: registry entries whose latest driver row predates r4 —
#: b21_tumbling_window / b11_unpivot / b18_width_bucket, deliberately
#: deferred from r8's window), then 44 of the 46-query r04 cohort
#: (oldest remaining confirmations, 5 rounds of session churn since).
#: Two r04 entries wait for r10 — b38_merge_upsert_broadcast and
#: b75_merge_full, both of whose direct sibling b38_merge_upsert
#: re-passed r8 — so PRIORITY stays at 47 and this round's 3
#: PRIORITY_NEXT additions land INSIDE the 50-slot window (the
#: VERDICT r7 item 1 convention: additions are driver-checked the
#: round they register).
PRIORITY: list[str] = [
    # -- r03-stale confirmations (VERDICT r8 item 1) --
    "b21_tumbling_window",
    "b11_unpivot",
    "b18_width_bucket",
    # -- the r04 cohort, oldest confirmations left (VERDICT r8 item 5) --
    "b32_ppm_decode",
    "b66_stream_scd1",
    "b67_stream_incremental_agg",
    "b68_cep_kleene",
    "b69_line_dedup",
    "b70_orc_roundtrip",
    "b72_stateful_sessionize",
    "b76_snapshot_diff",
    "b77_interval_union",
    "b78_null_safe_join",
    "b79_bucketed_join",
    "b80_attribution",
    "b82_incremental_neardup",
    "b83_checkpoint_recovery",
    "b84_pagerank",
    "b85_grouped_mode",
    "b87_skyline",
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

#: Hard cap on per-round additions (VERDICT r6 items 2/7): the driver
#: window is 50 slots and must absorb both re-confirmation traffic and
#: the previous round's additions, so a round may register at most
#: this many new queries.  tests/test_registry_order.py enforces both
#: the cap and the backlog bound (never-driver-checked queries outside
#: the current PRIORITY window ≤ 2× this cap).
ADDITIONS_PER_ROUND_CAP = 10

#: Candidates for the NEXT round's window: additions made this round
#: (VERDICT r5 item 7: everything new enters PRIORITY_NEXT in the same
#: commit that registers it).  Round 9 keeps PRIORITY at 47 (3 stale
#: + 44 r04) so these 3 land inside the 50-slot window and are
#: driver-checked the same round they are registered.
PRIORITY_NEXT: list[str] = [
    # round-9: fastText-style vectorized linear quality classifier
    # (VERDICT r8 item 8) — hashed n-gram features x broadcast weight
    # dim, integer micro-logit decision; exact-oracled
    "b178_quality_classifier",
    # round-9: corpus-sampled recall probe for the IVF-PQ composition
    # (VERDICT r8 item 6) — the b175_observed measurement with the
    # exact-L2 ground-truth side restricted to a deterministic md5
    # corpus sample, making the linear probe sample-sized; rows-only
    # like its full twin (pytest replays the integer recall rows)
    "b175_ivfpq_observed_sampled",
    # round-9: streaming drop-late-metrics audit (VERDICT r8 item 8's
    # second option) — b23's watermark pipeline instrumented with
    # observe() + per-batch state metrics under a newest-first slice
    # replay; rows-only (engine metrics, no SQL twin), drop/evict
    # counts replayed exactly in tests/test_streaming.py
    "b179_stream_late_audit",
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
        geo,
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
    from .streaming import joins, pipeline, stateful, windows  # noqa: F401
    from . import sinks  # noqa: F401
    from .sources import files, http  # noqa: F401
