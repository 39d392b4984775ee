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
#: (dict insertion order) per round.  Round 5's window, per VERDICT r4
#: item 3: the four round-4 hash-red queries first (fixed this round —
#: integer micro-unit / BIGINT outputs on both sides, see VERDICT r4
#: "What's wrong"), then the 14 queries that have never been in a
#: driver window (round 4's PRIORITY_NEXT), then 32 of the oldest
#: round-1 greens for re-confirmation.  After this round every
#: registered query has been driver-checked at least once.
PRIORITY: list[str] = [
    # -- the 4 round-4 hash failures, re-typed to hash-stable outputs --
    "b71_partitioned_prune",
    "b73_salted_agg",
    "b74_rolling_features",
    "b90_temperature_mix",
    # -- the 14 never-driver-checked queries (local-differential green) --
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
    "b131_dag_path_count",
    # -- oldest round-1 greens, re-confirmed (CORRECTNESS_r01 order) --
    "b28_exact_dedup",
    "b28_hash_dedup",
    "b29_minhash_near_dedup",
    "b29_ngram_jaccard",
    "b29_simhash",
    "b29_embedding_near_dup",
    "b29_dup_clusters",
    "b29_dedup_canonical",
    "b29_edit_distance",
    "b32_multimodal_plumbing",
    "b32_frame_sample",
    "b35_sequence_pack",
    "b35_pack_utilization",
    "flagship_revenue_by_nation",
    "b01_scan_filter_project",
    "b03_join_inner",
    "b04_join_broadcast",
    "b05_join_left",
    "b05_join_full_outer",
    "b06_join_semi",
    "b06_join_anti",
    "b07_join_range",
    "b08_join_asof",
    "b08_asof_forward",
    "b08_asof_tolerance",
    "b08_asof_payload",
    "b09_agg_q1",
    "b10_distinct",
    "b10_approx_distinct",
    "b11_rollup",
    "b11_cube",
    "b12_window_rank",
]

#: Candidates for the NEXT round's window: additions made this round.
#: The round-4 registration freeze (VERDICT r3 item 2 / r4 item 4) is
#: lifted once the round-5 window lands, because after it every
#: registered query has driver evidence; keep additions to a handful.
PRIORITY_NEXT: list[str] = [
    # round-5 additions — three LLM-pipeline gaps, each local-green:
    # vocabulary OOV coverage, deterministic multi-epoch shuffle
    # ordering, product-quantization encode (the memory side of
    # IVF-PQ; rows-only with numpy-replay invariants)
    "b132_vocab_oov",
    "b133_epoch_shuffle",
    "b134_pq_encode",
    # native streaming sink (DataSourceStreamArrowWriter, batchId-keyed
    # idempotent manifests; rows-only — epoch/task counts are
    # partitioning facts, invariants in tests/test_sinks.py)
    "b135_stream_sink",
    # dynamic partition pruning — b71's static prune upgraded to the
    # runtime dim-driven form (plan-asserted; exact-oracled)
    "b136_dynamic_partition_pruning",
    # IVF-PQ search side: asymmetric distance computation over the PQ
    # code table (rows-only; ADC-identity + recall invariants)
    "b137_pq_adc_search",
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
