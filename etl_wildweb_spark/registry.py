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
#: ROUND 11 window (VERDICT r10 items 1–2, landed in the SAME commit
#: as the CORRECTNESS_r10 artifact so the staleness gate flips red →
#: green atomically — ADVICE r10 item 2): first the eight r05 entries
#: the r10 window deliberately deferred (the gate names exactly this
#: set), then 40 of the 47-entry r06 cohort (next-oldest driver rows),
#: then b72 (its exact-gap session boundary rule changed this round —
#: modified queries re-enter the window) = 49, plus the b181 addition
#: in PRIORITY_NEXT = the 50-slot window.  SEVEN r06 entries defer to
#: r12, each with a same-file direct sibling in-window this round
#: (b14_topk_global ↔ b14_topk_per_group,
#: b34_hash_sample ↔ b34_stratified_sample/b34_weighted_mix,
#: b31_term_freq/b31_lang_stats ↔ six other b31 entries,
#: b11_pivot ↔ b11_grouping_sets/b11_time_rollup/b11_rollup/b11_cube,
#: b19_map_funcs ↔ b19_array_funcs — it gave its slot to b181,
#: b23_stream_static_join ↔ b21/b22/b23_stream_stream/b24 — its slot
#: went to b72); the staleness gate forces them into r12's window the
#: moment CORRECTNESS_r11 lands — that red-at-round-start is the
#: designed forcing function, not a regression.
PRIORITY: list[str] = [
    # -- the r05 cohort remainder: the staleness gate's named set
    #    (VERDICT r10 item 1 — this outranks everything) --
    "b05_join_left",
    "b06_join_anti",
    "b08_asof_payload",
    "b08_asof_tolerance",
    "b10_approx_distinct",
    "b11_cube",
    "b28_hash_dedup",
    "b29_simhash",
    # -- the r06 cohort, next-oldest confirmations (VERDICT r10 item 2) --
    "b06_scalar_subquery",
    "b07_join_range_banded",
    "b10_percentile",
    "b11_grouping_sets",
    "b11_time_rollup",
    "b13_window_frames",
    "b14_topk_per_group",
    "b15_setops",
    "b16_string_funcs",
    "b17_date_funcs",
    "b18_math_funcs",
    "b19_array_funcs",
    # b19_map_funcs gave its slot to this round's b181 addition (the
    # r10 precedent: the addition is driver-checked the round it
    # registers); its same-file sibling b19_array_funcs stays in-window
    # and the staleness gate forces b19_map_funcs into r12.
    "b20_json_funcs",
    "b21_sliding_window",
    "b22_session_window",
    # b23_stream_static_join defers to r12 (same-file siblings
    # b21_sliding/b22_session/b23_stream_stream/b24_custom in-window);
    # its slot goes to b72, whose exact-gap boundary rule CHANGED this
    # round (windows.py/stateful.py session fix) — modified queries
    # re-enter the window the round they change.
    "b23_stream_stream_join",
    "b72_stateful_sessionize",
    "b24_custom_stateful",
    "b25_pandas_udf",
    "b26_pandas_udaf",
    "b27_udtf",
    "b31_bpe_token_count",
    "b31_fingerprint",
    "b31_gopher_filters",
    "b31_langid",
    "b31_quality_score",
    "b31_text_stats",
    "b34_stratified_sample",
    "b34_weighted_mix",
    "b36_file_ingest",
    "b132_vocab_oov",
    "b133_epoch_shuffle",
    "b135_stream_sink",
    "b136_dynamic_partition_pruning",
    "b137_pq_adc_search",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "wildweb_envelope_e2e",
    "wildweb_pipeline_errors",
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
    # round-11: suffix-array-quality exact-substring dedup (VERDICT
    # r10 item 3) — closes b139's two documented gaps vs ExactSubstr
    # (character granularity; >=2 occurrences ANYWHERE incl. the same
    # document and self-overlaps), exact-oracled from birth via the
    # brute-force window SQL, boundary semantics pinned by the
    # planted-span fixture in tests/test_llmops.py
    "b181_exact_substring",
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
