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
#: (dict insertion order) per round.  Round 7's window, per VERDICT r6
#: items 1/2/5/6 — a CONSOLIDATION window: the repaired b134 first
#: (round-6's one driver red, output now packed-BIGINT), then the
#: entire round-6 backlog b138–b173 (36 queries, never driver-checked;
#: includes the streaming composition b138/b148 and the geo family),
#: then the wildweb_pipeline parity anchor (last hash-confirmed r3),
#: then 12 of the 16 TPC-H rows whose last green was r02 (the final
#: four, q19–q22, rotate in next round with the r0/r3 rows-only
#: cohort: a18_submit_sink, b30_ann_*).
PRIORITY: list[str] = [
    # -- the round-6 driver red, repaired (codes packed into BIGINT) --
    "b134_pq_encode",
    # -- round-6 additions, never driver-checked (VERDICT r6 item 2) --
    "b138_stream_pipeline_e2e",
    "b139_substring_dedup",
    "b140_kll_quantile_rollup",
    "b141_theta_retention_sketch",
    "b142_concat_chunk",
    "b143_cms_rollup",
    "b144_leakage_safe_split",
    "b145_zorder_layout",
    "b146_binaryfile_ingest",
    "b147_mad_outliers",
    "b148_stream_error_channel",
    "b149_semdedup",
    "b150_bm25_rank",
    "b151_dsir_weights",
    "b152_triangle_count",
    "b153_freq_items_rollup",
    "b154_jl_projection",
    "b155_perplexity_filter",
    "b156_bpe_train",
    "b157_inverted_index",
    "b158_pmi_assoc",
    "b159_containment_dedup",
    "b160_bpe_apply",
    "b161_source_novelty",
    "b162_maxsim_late_interaction",
    "b163_grouped_trend",
    "b164_ab_test",
    "b165_markov_attribution",
    "b166_spatial_cell_join",
    "b167_geo_knn",
    "b168_geofence_rollup",
    "b169_tile_pyramid",
    "b170_trajectory_segments",
    "b171_kaplan_meier",
    "b172_knn_label_vote",
    "b173_dbscan_complexes",
    # -- reference-parity anchor, two rounds of synth-shape churn since
    #    its last hash check (VERDICT r6 item 6) --
    "wildweb_pipeline",
    # -- oldest re-confirmations: TPC-H last hash-green r02 (12 of 16) --
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
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
#: commit that registers it).  Round 7 is a consolidation round — the
#: 36 round-6 entries below moved into PRIORITY; new round-7 additions
#: (≤ ADDITIONS_PER_ROUND_CAP) append at the end.
PRIORITY_NEXT: list[str] = [
    # round-7: polygon-TABLE geofencing — the b166 cell-index plan with
    # an exact-integer triangle containment verify; broadcast fence
    # cells, points never shuffle (exact-oracled; plan-asserted in
    # tests/test_plans.py)
    "b174_polygon_geofence",
    # round-7: full IVF-PQ — b30's routing × b134's codes × cell-pruned
    # ADC, the billion-vector index shape (rows-only; the composition
    # is pinned by full numpy replay in tests/test_llmops.py)
    "b175_ivfpq_search",
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
