"""Manual skew mitigation: salted joins.

AQE's runtime skew-join split (on in session defaults) is the first
line of defense; salting is the explicit fallback for the cases AQE
can't fix — a skewed SHUFFLE KEY feeding a non-join operator chain, an
engine without AQE, or a join where one key holds so much of the data
that even split partitions overwhelm a task.  The technique: scatter
the hot key across ``n_salts`` sub-keys on the big side, replicate the
small side once per salt, join on (key, salt).  Shuffle partitions for
a hot key shrink by ~n_salts at the cost of replicating the small side
n_salts× — the classic replicated-join tradeoff.

The salt must be deterministic (SCALE.md: nondeterministic exchanges
disqualify ReusedExchange and break retry idempotency), so it is a hash
of the whole row, never ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side's hot keys
    scattered across ``n_salts`` salts and the small side replicated per
    salt.  Result is row-identical to ``big.join(small, on, how)``
    (asserted in tests/test_skew.py); only the shuffle layout differs."""
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in big.columns])), F.lit(n_salts)
    ).cast("int")
    b = big.withColumn(SALT, salt)
    s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [*on, SALT], how).drop(SALT)


from pyspark.sql import SparkSession  # noqa: E402

from ..io import table  # noqa: E402
from ..registry import query  # noqa: E402


@query(
    "b59_salted_join",
    oracle="""
    SELECT e.event_type, count(*) AS n,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.event_type
    """,
)
def b59_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join as a registered, hash-checked query: events
    (user_id is the skewable key — real traffic is zipfian) joined to
    customer through the salt scatter, then aggregated.  Results are
    row-identical to the plain join (the oracle IS the plain join);
    only the shuffle layout differs — hot keys spread over 16 salts,
    small side replicated 16×."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id")
    )
    joined = salted_join(e, c, ["user_id"], n_salts=16)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


def salted_agg(
    df: DataFrame, keys: list[str], aggs: list, n_salts: int = 16
) -> DataFrame:
    """Two-phase SALTED AGGREGATION for skewed group keys: pre-aggregate
    on (keys, salt) — scattering a hot key's rows across ``n_salts``
    reducers — then merge the per-salt partials on the bare keys.  The
    second shuffle carries at most |keys|×n_salts rows, so the hot key's
    row volume never lands on one task.  ``aggs`` are (partial_expr,
    merge_fn, name) triples where merge_fn folds the partial column.

    This is what map-side combine already does for associative
    aggregates — made EXPLICIT so the pattern survives operators whose
    partial state Spark won't combine (collect_list-shaped, UDAFs) and
    engines without partial agg.  Deterministic salt (xxhash64 of the
    whole row), same argument as salted_join."""
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(n_salts)
    ).cast("int")
    partial = df.withColumn(SALT, salt).groupBy(*keys, SALT).agg(
        *[expr.alias(f"_p_{name}") for expr, _, name in aggs]
    )
    return partial.groupBy(*keys).agg(
        *[merge(F.col(f"_p_{name}")).alias(name) for _, merge, name in aggs]
    )


@query(
    "b73_salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS total,
           CAST(max(user_id) AS BIGINT) AS max_user
    FROM events GROUP BY event_type
    """,
)
def b73_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key aggregation via the explicit two-phase salt: events
    grouped by event_type (5 hot keys over ~1M rows at sf0.1 — exactly
    the shape where one reducer per key melts).  Oracle = the plain
    one-shot aggregate; equality proves the salt decomposition is
    invisible in the result, and tests/test_plans.py asserts the
    two-exchange shape with the first keyed on (event_type, salt)."""
    e = table(spark, sf_dir, "events")
    aggs = [
        (F.count(F.lit(1)), F.sum, "n"),
        (
            F.sum(F.col("value").cast("decimal(18,6)")),
            lambda c: F.sum(c).cast("decimal(38,6)"),
            "total",
        ),
        (F.max("user_id"), F.max, "max_user"),
    ]
    out = salted_agg(e.select("event_type", "value", "user_id"),
                     ["event_type"], aggs)
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        "total",
        F.col("max_user").cast("bigint").alias("max_user"),
    )
