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
#: (dict insertion order) per round.  Round 6's window, per VERDICT r5
#: item 1: the six round-5 additions first (they have never been in a
#: driver window — local-green only), then the 44 queries whose latest
#: driver check is oldest: all 17 whose last green was CORRECTNESS_r01,
#: then 27 of the 44 whose last green was r02 (streaming, UDx, text,
#: sampling, wildweb, and the first TPC-H rows; the remaining r02 tpch
#: cohort rotates in next round).
PRIORITY: list[str] = [
    # -- round-5 additions, never driver-checked (VERDICT r5 gap #1) --
    "b132_vocab_oov",
    "b133_epoch_shuffle",
    "b134_pq_encode",
    "b135_stream_sink",
    "b136_dynamic_partition_pruning",
    "b137_pq_adc_search",
    # -- last driver-green in round 1 (all 17) --
    "b06_scalar_subquery",
    "b07_join_range_banded",
    "b10_percentile",
    "b11_grouping_sets",
    "b11_pivot",
    "b11_time_rollup",
    "b13_window_frames",
    "b14_topk_global",
    "b14_topk_per_group",
    "b15_setops",
    "b16_string_funcs",
    "b17_date_funcs",
    "b18_math_funcs",
    "b19_array_funcs",
    "b19_map_funcs",
    "b20_json_funcs",
    "b34_hash_sample",
    # -- last driver-green in round 2 (27 of 44; rest next round) --
    "b21_sliding_window",
    "b22_session_window",
    "b23_watermark_tumbling",
    "b23_stream_static_join",
    "b23_stream_stream_join",
    "b24_stream_dedup",
    "b24_custom_stateful",
    "b25_pandas_udf",
    "b26_pandas_udaf",
    "b27_udtf",
    "b31_text_stats",
    "b31_quality_score",
    "b31_langid",
    "b31_lang_stats",
    "b31_term_freq",
    "b31_fingerprint",
    "b31_bpe_token_count",
    "b31_gopher_filters",
    "b34_stratified_sample",
    "b34_weighted_mix",
    "b36_file_ingest",
    "wildweb_envelope_e2e",
    "wildweb_pipeline_errors",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
]

#: Candidates for the NEXT round's window: additions made this round
#: (VERDICT r5 item 7: everything new enters PRIORITY_NEXT in the same
#: commit that registers it).
PRIORITY_NEXT: list[str] = [
    # round-6: the reference's production dataflow composed as ONE
    # streaming query — b91's poll source → A5-A17 → b135's native
    # sink under one checkpoint (rows-only; stream≡batch + restart
    # idempotence invariants in tests/test_stream_pipeline.py)
    "b138_stream_pipeline_e2e",
    # round-6: substring-level exact dedup — K-gram-anchor
    # approximation of suffix-array dedup (exact-oracled; planted-span
    # boundary fixture in tests/test_llmops.py)
    "b139_substring_dedup",
    # round-6: mergeable KLL quantile sketches, day→week rollup over
    # sketch bytes — b60's quantile sibling (rows-only; rank-error
    # bound pinned in tests/test_new_ops_invariants.py)
    "b140_kll_quantile_rollup",
    # round-6: theta-sketch set algebra between consecutive weekly
    # user sketches — intersections/differences HLL can't express
    # (rows-only; 5% accuracy pin in tests/test_new_ops_invariants.py)
    "b141_theta_retention_sketch",
    # round-6: concat-and-chunk context layout — fixed windows over
    # the eod-joined global token stream, distributed two-phase
    # prefix-sum offsets (exact-oracled)
    "b142_concat_chunk",
    # round-6: near-dup-cluster-keyed train/val/test split — no
    # near-dup pair can straddle splits (exact-oracled; edge-by-edge
    # invariant in tests/test_llmops.py)
    "b144_leakage_safe_split",
    # round-6: mergeable count-min sketch rollup — md5 buckets make
    # the approximate grid exactly replayable in DuckDB
    # (exact-oracled; overestimate bound in tests/test_mining_invariants.py)
    "b143_cms_rollup",
    # round-6: Z-order layout index — normalized bit-interleave +
    # per-bucket min/max boxes (exact-oracled; two-dimension pruning
    # measured in tests/test_bucketing.py)
    "b145_zorder_layout",
    # round-6: multimodal ingest through the real binaryFile source
    # (rows-only — file paths are environment facts; byte-equivalence
    # to the in-memory decode in tests/test_llmops.py)
    "b146_binaryfile_ingest",
    # round-6: robust MAD outliers — median/MAD histogram walks +
    # integer decision predicate (exact-oracled)
    "b147_mad_outliers",
    # round-6: A19 error channel under the streaming shape — one
    # foreachBatch forks features + per-stage error rows per epoch
    # (rows-only; both-channels≡batch pin in tests/test_stream_pipeline.py)
    "b148_stream_error_channel",
    # round-6: SemDeDup — cluster-route + within-cluster prune with an
    # integer micro-cosine decision predicate (exact-oracled)
    "b149_semdedup",
    # round-6: BM25 ranking beside b43's TF-IDF — per-term integer
    # micro contributions, TakeOrdered top-20 (exact-oracled)
    "b150_bm25_rank",
    # round-6: DSIR importance weights — md5-hashed bigram buckets,
    # per-bucket integer micro log-ratios, integer doc sums
    # (exact-oracled)
    "b151_dsir_weights",
    # round-6: triangle counting by degree-ordered orientation over
    # the user co-occurrence graph — no window, hash joins only
    # (exact-oracled)
    "b152_triangle_count",
    # round-6: mergeable frequent-items day→week rollup with exact
    # [lower, upper] bounds — completes the sketch family
    # (exact-oracled; bracket invariant in tests/test_mining_invariants.py)
    "b153_freq_items_rollup",
    # round-6: JL Rademacher projection 64→16 over ppm-quantized
    # embeddings — zero-shuffle narrow projection, md5-derived signs
    # (exact-oracled; distance preservation in tests/test_llmops.py)
    "b154_jl_projection",
    # round-6: CCNet-style bigram-LM perplexity gate — per-type
    # integer micro-NLL, integer doc sums, cross-multiplied flag
    # (exact-oracled)
    "b155_perplexity_filter",
    # round-6: BPE merge-table training — vocab-sized iterative loop,
    # corpus touched once (rows-only; exact equality vs the sequential
    # reference algorithm in tests/test_llmops.py)
    "b156_bpe_train",
    # round-6: positional inverted index — (term, doc) postings with
    # sorted position lists, corpus-relative rare-term cut
    # (exact-oracled)
    "b157_inverted_index",
    # round-6: PMI collocation mining — integer micro-nat scores from
    # exact BIGINT count ratios, TakeOrdered top-50 (exact-oracled)
    "b158_pmi_assoc",
    # round-6: shingle-containment (subset) dedup — asymmetric prefix×
    # full-posting candidate join, integer cross-multiplied threshold
    # (exact-oracled)
    "b159_containment_dedup",
    # round-6: BPE encoding with b156's learned merges — data-compiled
    # regexp chain, one narrow pass (rows-only; encode ≡ reference in
    # tests/test_llmops.py)
    "b160_bpe_apply",
    # round-6: marginal-diversity attribution — first-occurrence gram
    # ownership per source, integer ppm novelty (exact-oracled)
    "b161_source_novelty",
    # round-6: ColBERT-style MaxSim late-interaction top-k — fixed-order
    # micro-rounded sum of per-sub-vector maxes (exact-oracled)
    "b162_maxsim_late_interaction",
    # round-6: per-group OLS trend slope — b104-style exact integer
    # moments, one final lossless double ratio (exact-oracled)
    "b163_grouped_trend",
    # round-6: A/B significance from exact integer moments — md5 arm
    # split, pooled-variance t², integer micro decision (exact-oracled)
    "b164_ab_test",
    # round-6: Markov removal-effect attribution — corpus-scale journey
    # transitions + bounded-state absorbing-chain solve (rows-only;
    # share/bounds/last-touch invariants in tests/test_mining_invariants.py)
    "b165_markov_attribution",
    # round-6: grid-cell spatial proximity join — the reference's geo
    # domain; 3x3 neighborhood equi-join, exact integer micro-degree
    # distance predicate (exact-oracled)
    "b166_spatial_cell_join",
    # round-6: in-radius k-NN via the same cell machinery — per-point
    # rank window over cell candidates only (exact-oracled)
    "b167_geo_knn",
    # round-6: geofence tagging + rollup — literal zones compile to a
    # pure projection, zero pre-rollup shuffles (exact-oracled)
    "b168_geofence_rollup",
    # round-6: multi-resolution tile pyramid — one pass, tile-sized
    # shuffle (exact-oracled)
    "b169_tile_pyramid",
    # round-6: trajectory segmentation — per-entity lag window, exact
    # integer displacement²/duration (exact-oracled)
    "b170_trajectory_segments",
    # round-6: Kaplan-Meier time-to-conversion — per-user reduction,
    # day-table survival math, integer micro-log steps (exact-oracled)
    "b171_kaplan_meier",
    # round-6: kNN label vote — b30's broadcast scoring + deterministic
    # majority, the weak-supervision primitive (exact-oracled)
    "b172_knn_label_vote",
    # round-6: DBSCAN fire-complex clustering — b166's ε-edges + core
    # filter + min-label CC + border attach, all replayed by DuckDB's
    # recursive CTE (exact-oracled)
    "b173_dbscan_complexes",
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
