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
#: (dict insertion order) per round.
#: ROUND 12 window (VERDICT r11 items 1–3, landed in the round's FIRST
#: commit so the staleness gate flips red → green atomically):
#: first the seven r06 deferrals the gate names (b11_pivot,
#: b14_topk_global, b19_map_funcs, b23_stream_static_join,
#: b31_lang_stats, b31_term_freq, b34_hash_sample), then the three
#: queries whose code is planned to change this round (modified
#: queries re-enter the window the round they change: b113's bucket
#: expression goes exact-bigint per ADVICE r11, b31_langid upgrades to
#: an exact oracle per VERDICT r11 item 4, b64 shares machinery with
#: the b182 right-outer addition per item 5; the three remaining
#: stateful stream-stream joins after the state-partition
#: right-sizing), then 36 of the 50-entry
#: r07 cohort (next-oldest driver rows).  FOURTEEN r07 entries defer
#: to r13 at age 5 — eleven tpch (ten at round open + tpch_q17, whose
#: slot went to the b182 addition; same-file sibling tpch_q6
#: in-window) and three corpus.py rows (b155/b158/b161, slots to the
#: re-entering stream-stream joins; siblings b145/b150/b157
#: in-window) — legal under MAX_DRIVER_ROW_AGE=5 (see
#: tests/test_registry_order.py for the capacity arithmetic).
PRIORITY: list[str] = [
    # -- the r06 cohort remainder: the staleness gate's named set
    #    (VERDICT r11 item 1 — this outranks everything) --
    "b11_pivot",
    "b14_topk_global",
    "b19_map_funcs",
    "b23_stream_static_join",
    "b31_lang_stats",
    "b31_term_freq",
    "b34_hash_sample",
    # -- queries whose code changes this round (re-enter on change) --
    "b113_pareto_coverage",
    "b31_langid",
    "b64_stream_stream_left_outer",
    # the state-partition right-sizing (STREAM_STATE_PARTITIONS,
    # joins.py) touches every stateful stream-stream join's execution,
    # so the remaining three re-enter too; their slots come from three
    # r07 corpus.py deferrals (b155/b158/b161 — same-file siblings
    # b145/b150/b157 stay in-window), legal at age 5.
    "b23_stream_stream_join",
    "b177_stream_semi_join",
    "b180_stream_stream_full_outer",
    # -- the r07 cohort, next-oldest confirmations (VERDICT r11 item 3) --
    "b152_triangle_count",
    "b165_markov_attribution",
    # b116_bounce_rate re-enters MID-ROUND: its oracle split sessions
    # on >= INTERVAL 30 MINUTE while Spark's session_window merges an
    # event landing exactly at prev + gap — the batch-side sibling of
    # the a33793e inclusive-gap find, wrong for eleven rounds and
    # invisible because no corpus gap ever landed on :00.000000 (probed
    # and ==-planted in tests/test_edge_guards.py).  Its slot comes
    # from b171_kaplan_meier (same-file analytics.py sibling, code
    # untouched, age 5 at r12 — the tpch_q17 deferral precedent), which
    # MUST join the r13 must-lead set (SCALE.md round-12 handoff).
    "b116_bounce_rate",
    "b145_zorder_layout",
    "b150_bm25_rank",
    "b157_inverted_index",
    "b149_semdedup",
    "b159_containment_dedup",
    "b166_spatial_cell_join",
    "b167_geo_knn",
    "b168_geofence_rollup",
    "b169_tile_pyramid",
    "b170_trajectory_segments",
    "b173_dbscan_complexes",
    "b143_cms_rollup",
    "b147_mad_outliers",
    "b153_freq_items_rollup",
    "b163_grouped_trend",
    "b164_ab_test",
    "b146_binaryfile_ingest",
    "b142_concat_chunk",
    "b140_kll_quantile_rollup",
    "b141_theta_retention_sketch",
    "b144_leakage_safe_split",
    "b151_dsir_weights",
    "b134_pq_encode",
    "b154_jl_projection",
    "b162_maxsim_late_interaction",
    "b172_knn_label_vote",
    "b139_substring_dedup",
    "b156_bpe_train",
    "b160_bpe_apply",
    "tpch_q6",
    # tpch_q17 gave its slot to this round's b182 addition (the
    # r10/r11 precedent: the addition is driver-checked the round it
    # registers); its same-file sibling tpch_q6 stays in-window and
    # tpch_q17 joins the eleven-entry r07 tpch deferral to r13.
    "wildweb_pipeline",
    "b138_stream_pipeline_e2e",
    "b148_stream_error_channel",
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
#: commit that registers it).  Round 10's single addition (b180) got a
#: green r10 driver row, so it rotates out.
PRIORITY_NEXT: list[str] = [
    # round-12: stream-stream RIGHT OUTER interval join (VERDICT r11
    # item 5) — the last hole in the declared streaming join matrix,
    # exact-oracled from birth (b64's construction mirrored; purchase
    # closure rule probed on ±1 ms boundary corpora before the oracle
    # was written), boundary plants in tests/test_streaming.py
    "b182_stream_stream_right_outer",
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
        exact_substring,
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
