"""Data-quality assertion operator — the dbt-test / Great-Expectations
style check suite an ETL engine runs before publishing a snapshot
(SURVEY.md §2 extension; the reference's analog is its null-data and
envelope-cardinality guards, task.ts:99-104, generalized to declarative
table-level expectations).

One query emits one row per check with its violation count, so the
gate is a single scan of a tiny result: publish iff max(n_violations
over blocking checks) = 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query


@query(
    "b49_quality_checks",
    oracle="""
    SELECT 'lineitem_fk_orders' AS check_name,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
             AS n_violations
    UNION ALL
    SELECT 'orders_fk_customer',
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'lineitem_qty_range',
           (SELECT count(*) FROM lineitem
            WHERE l_quantity IS NULL OR l_quantity <= 0 OR l_quantity > 60)
    UNION ALL
    SELECT 'events_user_not_null',
           (SELECT count(*) FROM events WHERE user_id IS NULL)
    UNION ALL
    SELECT 'documents_nonempty_text',
           (SELECT count(*) FROM documents
            WHERE text IS NULL OR length(text) = 0)
    UNION ALL
    SELECT 'orders_pk_unique',
           (SELECT count(*) FROM (
              SELECT o_orderkey FROM orders
              GROUP BY 1 HAVING count(*) > 1))
    """,
)
def b49_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectation suite over the corpus: referential
    integrity (anti-join counts), domain ranges, not-null, and
    primary-key uniqueness — each check one row, violations as exact
    counts.

    Scale: FK checks are LEFT ANTI hash joins that project BOTH sides
    to their key columns before the exchange (keys shuffle, never
    rows); range/null checks are pushdown-able scan predicates counted
    map-side; PK uniqueness is a partial-aggregating groupBy + HAVING.
    Every check is an independent subtree, so the scheduler overlaps
    them; the result is six rows regardless of corpus size."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    e = table(spark, sf_dir, "events")
    d = table(spark, sf_dir, "documents")

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )

    checks = [
        count_row(
            "lineitem_fk_orders",
            li.select("l_orderkey").join(
                o.select("o_orderkey"),
                li.l_orderkey == o.o_orderkey,
                "left_anti",
            ),
        ),
        count_row(
            "orders_fk_customer",
            o.select("o_custkey").join(
                c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti"
            ),
        ),
        count_row(
            "lineitem_qty_range",
            li.filter(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") <= 0)
                | (F.col("l_quantity") > 60)
            ),
        ),
        count_row("events_user_not_null", e.filter(F.col("user_id").isNull())),
        count_row(
            "documents_nonempty_text",
            d.filter(F.col("text").isNull() | (F.length("text") == 0)),
        ),
        count_row(
            "orders_pk_unique",
            o.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1),
        ),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.unionAll(chk)
    return out
