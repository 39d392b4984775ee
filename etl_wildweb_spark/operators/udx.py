"""User-defined function surface (SURVEY.md §2 B25-B27).

UDFs are the engine's *slow path* by policy: everything expressible
with built-ins stays JVM-side (see every other operator module).  These
queries exist to prove the full UDx surface with Arrow-vectorized
implementations — and their oracle checks double as regression tests
that the Python results equal the pure-SQL semantics.

100 TB notes: pandas UDFs move Arrow batches across the Python
boundary — ~10-100× better than row-at-a-time, still strictly worse
than codegen.  Python UDTFs are per-row generators (the slowest shape
here); the declared query bounds its input accordingly.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udtf

from ..functions.exact import sql_dround
from ..io import table
from ..registry import query


_Q6 = Decimal("0.000001")
_Q2 = Decimal("0.01")


@pandas_udf(T.DoubleType())
def revenue_udf(price: pd.Series, discount: pd.Series) -> pd.Series:
    # same quantization as functions.exact.dround: the double→DECIMAL(18,6)
    # cast in both engines goes through the shortest decimal repr of the
    # binary value (Java BigDecimal.valueOf semantics) — Python's repr()
    # is that same shortest round-trip string, so Decimal(repr(x)) with
    # two HALF_UP quantize steps is bit-identical to the SQL twin
    x = price * (1.0 - discount)
    return pd.Series(
        [
            float(
                Decimal(repr(v)).quantize(_Q6, ROUND_HALF_UP).quantize(
                    _Q2, ROUND_HALF_UP
                )
            )
            for v in x
        ],
        dtype="float64",
        index=x.index,
    )


@query(
    "b25_pandas_udf",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_dround('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-01-01'
    """,
)
def b25_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25: Arrow-vectorized scalar pandas UDF computing the same
    revenue expression as b01 — the oracle hash proves UDF/SQL parity
    (SURVEY.md §2 B25: 'asserted equal')."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") >= "2001-01-01").select(
        "l_orderkey",
        "l_linenumber",
        revenue_udf(F.col("l_extendedprice"), F.col("l_discount")).alias("revenue"),
    )


@pandas_udf(T.DoubleType())
def weighted_avg_udf(price: pd.Series, qty: pd.Series) -> float:
    # grouped-agg pandas UDF.  fsum = exactly-rounded sum, and the
    # per-product 6-dp half-up quantization mirrors DECIMAL(18,6) in the
    # oracle, so the result is engine-independent.
    prod = np.floor(price.to_numpy() * qty.to_numpy() * 1e6 + 0.5) / 1e6
    q6 = np.floor(qty.to_numpy() * 1e6 + 0.5) / 1e6
    total_w = math.fsum(q6)
    if total_w == 0.0:
        return float("nan")
    return round(math.fsum(prod) / total_w, 4)


@query(
    "b26_pandas_udaf",
    oracle="""
    SELECT p_brand,
           round(CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 4)
               AS wavg_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def b26_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26: grouped-aggregate pandas UDF (quantity-weighted mean price
    per brand), hash-checked against the decimal-exact SQL twin."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            weighted_avg_udf(F.col("l_extendedprice"), F.col("l_quantity")).alias(
                "wavg_price"
            )
        )
    )


@udtf(returnType="pos int, token string")
class SplitTokens:
    """B27: Python UDTF — one output row per token with its position."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


@query(
    "b27_udtf",
    oracle="""
    SELECT doc_id, CAST(s.pos AS INTEGER) AS pos, s.token
    FROM (
        SELECT doc_id,
               unnest(list_transform(string_split(text, ' '),
                      (x, i) -> struct_pack(pos := i - 1, token := x))) AS s
        FROM documents WHERE doc_id < 50
    )
    """,
)
def b27_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27: table-valued function via LATERAL join — tokenization with
    positions, checked against DuckDB UNNEST WITH ORDINALITY.  Input is
    bounded (doc_id < 50): per-row Python generators are the slowest
    UDx shape and exist for API completeness, not the hot path."""
    table(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    spark.udtf.register("split_tokens", SplitTokens)
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM documents_v d, LATERAL split_tokens(d.text) t
        WHERE d.doc_id < 50
        """
    )


def _merge_user_activity(
    events_pdf: pd.DataFrame, orders_pdf: pd.DataFrame
) -> pd.DataFrame:
    """Cogroup merge: both sides of one user key as pandas frames.
    All sums are int64 (cents precomputed JVM-side) — pandas float
    summation order would otherwise leak nondeterminism."""
    if len(events_pdf):
        user = events_pdf["user_id"].iloc[0]
    else:
        user = orders_pdf["user_id"].iloc[0]
    return pd.DataFrame(
        {
            "user_id": [user],
            "n_events": [len(events_pdf)],
            "n_orders": [len(orders_pdf)],
            "spend_cents": [
                int(orders_pdf["cents"].sum()) if len(orders_pdf) else 0
            ],
        }
    )


@query(
    "b62_cogroup_merge",
    oracle="""
    WITH ev AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
    od AS (SELECT o_custkey AS user_id, count(*) AS n_orders,
                  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS spend_cents
           FROM orders GROUP BY 1)
    SELECT COALESCE(ev.user_id, od.user_id) AS user_id,
           CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(spend_cents, 0) AS BIGINT) AS spend_cents
    FROM ev FULL OUTER JOIN od ON ev.user_id = od.user_id
    """,
)
def b62_cogroup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FOURTH pandas surface (after UDF/UDAF/UDTF): cogrouped
    ``applyInPandas`` — both tables shuffled to the same key partitions,
    each key's two frames handed to one Python function.  This is the
    escape hatch for per-key custom MERGES (as-of alignment, custom
    reconciliation) that aren't a join + aggregate; here the merge IS
    SQL-expressible on purpose, so the full-outer-join oracle hash-
    checks the cogroup machinery itself (key routing, empty-side
    frames, both-side dtypes).

    Determinism: money is converted to integer CENTS JVM-side before
    the Python hop (F.round half-up matches the oracle's round;
    summing int64 in pandas is order-free, float would not be).

    Scale: one co-partitioning shuffle per side — identical exchange
    plan to a shuffle join; Arrow-batched per key group."""
    e = table(spark, sf_dir, "events").select("user_id", "ts")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    out_schema = (
        "user_id bigint, n_events bigint, n_orders bigint, spend_cents bigint"
    )
    return (
        e.groupBy("user_id")
        .cogroup(o.groupBy("user_id"))
        .applyInPandas(
            lambda ev, od: _merge_user_activity(ev, od), out_schema
        )
    )


def _arrow_group_stats(table_in):
    """applyInArrow worker: per-group count + integer-cents sum over a
    pyarrow.Table — no pandas materialization at all (zero-copy
    column math), the lowest-overhead Python hook Spark 4 offers."""
    import pyarrow as pa
    import pyarrow.compute as pc

    vals = table_in.column("value")
    cents = pc.floor(pc.multiply(pc.cast(vals, pa.float64()), 100.0))
    return pa.table(
        {
            "event_type": [table_in.column("event_type")[0].as_py()],
            "n": pa.array([table_in.num_rows], pa.int64()),
            "value_cents": pa.array(
                [int(pc.sum(pc.cast(cents, pa.int64())).as_py() or 0)],
                pa.int64(),
            ),
        }
    )


@query(
    "b95_apply_in_arrow",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM events WHERE isfinite(value) GROUP BY event_type
    """,
)
def b95_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B25 completeness, Spark 4's applyInArrow: grouped custom logic
    on RAW ARROW TABLES — one serialization layer less than
    applyInPandas (no pandas Block consolidation, no object boxing),
    which is the right hook when the Python side is itself columnar
    (pyarrow.compute here, numpy/polars in general).  Exact
    integer-cents arithmetic keeps the oracle bit-exact.

    Scale: same single group-key exchange as any groupBy-apply; each
    group must fit an Arrow batch (event_type cardinality is 5 —
    bounded).  The GroupBy twin of the mapInArrow decode path."""
    from ..functions.exact import finite

    e = (
        table(spark, sf_dir, "events")
        .filter(finite("value"))  # quarantine before the cents cast
        .select("event_type", "value")
    )
    return e.groupBy("event_type").applyInArrow(
        _arrow_group_stats,
        schema="event_type string, n bigint, value_cents bigint",
    )


@udtf
class TopTokens:
    """Polymorphic UDTF (Spark 4 ``analyze``): output schema is decided
    at ANALYSIS time from the literal k argument — top_tokens(text, 2)
    resolves to columns (token_1, token_2); a different k re-shapes the
    relation without code changes.  The dynamic-schema contract the
    reference's TypeBox capabilities endpoint (task.ts:52-65) promises,
    implemented engine-side."""

    @staticmethod
    def analyze(text, k):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import StringType, StructType

        if not k.isConstantExpression:
            raise Exception("k must be a literal")
        n = int(k.value)
        schema = StructType()
        for i in range(n):
            schema = schema.add(f"token_{i + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, k: int):
        toks = sorted(
            {t for t in (text or "").split() if t},
            key=lambda t: (-(text.split().count(t)), t),
        )
        row = [toks[i] if i < len(toks) else None for i in range(k)]
        yield tuple(row)


@query(
    "b96_udtf_analyze",
    oracle="""
    WITH toks AS (
      SELECT doc_id, t.token,
             count(*) AS cnt
      FROM documents, unnest(string_split(text, ' ')) AS t(token)
      WHERE doc_id < 50 AND t.token <> ''
      GROUP BY doc_id, t.token),
    ranked AS (
      SELECT doc_id, token,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, token) AS rk
      FROM toks)
    SELECT d.doc_id,
           max(CASE WHEN rk = 1 THEN token END) AS token_1,
           max(CASE WHEN rk = 2 THEN token END) AS token_2
    FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id < 50) d
    LEFT JOIN ranked ON ranked.doc_id = d.doc_id AND rk <= 2
    GROUP BY d.doc_id
    """,
)
def b96_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27 completeness: a UDTF whose schema comes from analyze() —
    ``top_tokens(text, 2)`` emits (token_1, token_2), the 2 most
    frequent tokens per document with deterministic (count desc,
    token) tie-break.  The oracle replays the ranking relationally.

    Scale: per-row generator UDTFs are the slowest Python shape (the
    module docstring's policy note) — the query bounds its input to a
    50-doc slice on purpose; corpus-scale top-k-per-doc is b31's
    in-row JVM fold."""
    spark.udtf.register("top_tokens", TopTokens)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("docs_b96")
    return spark.sql(
        "SELECT d.doc_id, t.token_1, t.token_2 "
        "FROM docs_b96 d, LATERAL top_tokens(d.text, 2) t"
    )
