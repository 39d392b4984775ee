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
    NOTE the exceptions: the streaming queries (b23/b24/b58/b64/b177/
    b180 families) execute eagerly by design, and the iterative/fixture builders
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
#: (dict insertion order) per round.  Round 10's window, per VERDICT r9
#: items 1/2/3: FIRST the four round-9 streaming oracle upgrades whose
#: new exact oracles have never been driver-hash-checked
#: (b23/b24/b58/b64 — the round's single open gate), then the two
#: r04-stale merge rows in a file merge.py modified since their last
#: driver row, then b113 (its implementation changes this round —
#: range-bucketed prefix sum replaces the global window, VERDICT r9
#: item 6 — so it re-enters the window under the new plan), then 42 of
#: the 50-entry r05 cohort.  Eight r05 entries defer to r11, each with
#: a same-file direct sibling in-window this round (b05_join_left ↔
#: b05_join_full_outer, b06_join_anti ↔ b06_join_semi,
#: b08_asof_payload/b08_asof_tolerance ↔ b08_join_asof/b08_asof_forward,
#: b10_approx_distinct ↔ b10_distinct, b11_cube ↔ b11_rollup,
#: b28_hash_dedup ↔ b28_exact_dedup, b29_simhash ↔ the six other b29
#: entries — it gave its slot to this round's b180 addition so the
#: addition is driver-checked the round it registers); the staleness gate
#: (tests/test_registry_order.py::test_driver_row_staleness_bound)
#: forces them into r11's window the moment CORRECTNESS_r10 lands.
PRIORITY: list[str] = [
    # -- r9 streaming oracle upgrades, driver-unconfirmed (VERDICT r9 item 1) --
    "b23_watermark_tumbling",
    "b24_stream_dedup",
    "b58_stream_funnel",
    "b64_stream_stream_left_outer",
    # -- r04-stale rows in a since-modified merge.py (VERDICT r9 item 2) --
    "b38_merge_upsert_broadcast",
    "b75_merge_full",
    # -- re-check under the new bounded-window plan (VERDICT r9 item 6) --
    "b113_pareto_coverage",
    # -- the r05 cohort, oldest confirmations left (VERDICT r9 item 3) --
    "b01_scan_filter_project",
    "b03_join_inner",
    "b04_join_broadcast",
    "b05_join_full_outer",
    "b06_join_semi",
    "b07_join_range",
    "b08_asof_forward",
    "b08_join_asof",
    "b09_agg_q1",
    "b10_distinct",
    "b11_rollup",
    "b12_window_rank",
    "b28_exact_dedup",
    "b29_dedup_canonical",
    "b29_dup_clusters",
    "b29_edit_distance",
    "b29_embedding_near_dup",
    "b29_minhash_near_dedup",
    "b29_ngram_jaccard",
    "b32_frame_sample",
    "b32_multimodal_plumbing",
    "b32_ppm_resize",
    "b35_pack_utilization",
    "b35_sequence_pack",
    "b71_partitioned_prune",
    "b73_salted_agg",
    "b74_rolling_features",
    "b90_temperature_mix",
    "b118_longest_streak",
    "b119_clamped_balance",
    "b120_record_linkage",
    "b121_linear_interpolate",
    "b122_weekly_movers",
    "b124_group_sample_k",
    "b125_seasonal_anomaly",
    "b126_state_timeout_eviction",
    "b127_federated_union",
    "b128_slice_overlap",
    "b129_hierarchy_closure",
    "b130_token_drift",
    "b131_dag_path_count",
    "flagship_revenue_by_nation",
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
#: commit that registers it).  Round 9's three additions (b178/
#: b175_sampled/b179) all got green r9 driver rows, so they rotate out;
#: round 10's PRIORITY stands at 49 so its one addition lands inside
#: the 50-slot window.
PRIORITY_NEXT: list[str] = [
    # round-10: stream-stream FULL OUTER interval join (VERDICT r9
    # item 8b) — completes the inner/left/semi/full join matrix;
    # exact-oracled via the b64 construction symmetrized, purchase-side
    # closure rule probed (STRICT at the watermark) before the oracle
    # was written
    "b180_stream_stream_full_outer",
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
