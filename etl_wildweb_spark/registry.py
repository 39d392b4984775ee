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
#: (dict insertion order) per round.  Round 8's window, per VERDICT r7
#: items 1/2: the two round-7 additions first (the only queries never
#: driver-checked — b174 hash, b175 rows-only), then the four TPC-H
#: stragglers whose last green was r02 (the registry's oldest
#: confirmations), then the entire r03-confirmed cohort (41 of its 44
#: actives — the 5-rounds-stale tail: tpch_q1/q9, the ANN/rows-only
#: family b30_*, a18_submit_sink, b33_http_ingest, and the b37–b65
#: span).  Three of the r03 cohort (b21_tumbling_window, b11_unpivot,
#: b18_width_bucket) wait one more round — each has an r5/r6-green
#: sibling in the same operator family — so that PRIORITY stays at 47
#: and this round's PRIORITY_NEXT additions land INSIDE the 50-slot
#: window instead of inheriting r7's never-checked lag.
PRIORITY: list[str] = [
    # -- round-7 additions, never driver-checked (VERDICT r7 item 1) --
    "b174_polygon_geofence",
    "b175_ivfpq_search",
    # -- oldest confirmations in the registry: last hash-green r02 --
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    # -- the r03 cohort, 5 rounds of session churn since (r7 item 2) --
    "tpch_q1",
    "tpch_q9",
    "b30_cosine_topk",
    "b30_ann_lsh",
    "b30_ann_ivf",
    "b30_ann_lsh_observed",
    "b30_ann_ivf_observed",
    "a18_submit_sink",
    "b33_http_ingest",
    "b28_incremental_dedup",
    "b29_cc_bigstar",
    "b31_repetition_filters",
    "b31_pii_scan",
    "b37_contamination",
    "b38_merge_upsert",
    "b39_doc_chunk",
    "b40_centroid_assign",
    "b41_scd2_history",
    "b42_bigram_lm",
    "b43_tfidf_rank",
    "b45_quality_deciles",
    "b46_dataset_card",
    "b47_funnel",
    "b48_retention",
    "b49_quality_checks",
    "b50_grouped_median",
    "b51_resample_ffill",
    "b52_sequence_match",
    "b53_train_val_test",
    "b55_lateral_topk",
    "b56_embedding_quantize",
    "b57_table_fingerprint",
    "b58_stream_funnel",
    "b59_salted_join",
    "b60_hll_mergeable_rollup",
    "b62_cogroup_merge",
    "b63_quantile_bands",
    "b64_stream_stream_left_outer",
    "b65_map_hof",
    "b20_variant_funcs",
    "b11_grouping_id",
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
#: commit that registers it).  Round 8 keeps PRIORITY at 47 so these
#: land inside the 50-slot window and are driver-checked the same
#: round they are registered.
PRIORITY_NEXT: list[str] = [
    # round-8: observed-recall twin for the full IVF-PQ composition
    # (VERDICT r7 item 7) — measured recall@K vs exact L2, the
    # b30_ann_*_observed pattern; rows-only by design (recall is a
    # float property of an approximation, pinned by pytest bounds)
    "b175_ivfpq_observed",
    # round-8: tokenizer decode / round-trip — completes the
    # b156_bpe_train / b160_bpe_apply pair (VERDICT r7 item 8);
    # exact-oracled: decode(encode(text)) must equal the
    # pre-tokenized input byte-for-byte
    "b176_bpe_decode",
    # round-8: stream-stream LEFT SEMI interval join with
    # watermark-bounded state — the one streaming join shape not yet
    # registered (b23 covers inner, b64 left-outer; VERDICT r7
    # item 8).  Exact-oracled: semi emits each matched left row once
    # and nothing at watermark closure, so under availableNow it
    # equals the batch EXISTS semi join
    "b177_stream_semi_join",
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
