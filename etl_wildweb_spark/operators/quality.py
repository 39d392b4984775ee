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


#: Field delimiter for row serialization in fingerprints — unit
#: separator, can't appear in the corpus text, prevents ("a","bc") vs
#: ("ab","c") collisions that a bare concat would allow.
_FP_SEP = "\x1f"
#: NULL sentinel — record separator, also corpus-impossible.  Every
#: field is coalesced to it on BOTH engines so NULLs serialize
#: explicitly: concat_ws would silently SKIP a NULL field (rows
#: differing only in which column is NULL would hash identically)
#: while the oracle's || would NULL the whole row — both wrong, and
#: differently so.
_FP_NULL = "\x1e"


@query(
    "b57_table_fingerprint",
    oracle=f"""
    SELECT 'documents' AS tbl,
           count(*) AS n_rows,
           bit_xor(CAST(('0x' || substring(md5(
               COALESCE(CAST(doc_id AS VARCHAR), '{_FP_NULL}') ||
               '{_FP_SEP}' || COALESCE(lang, '{_FP_NULL}') ||
               '{_FP_SEP}' || COALESCE(source, '{_FP_NULL}') ||
               '{_FP_SEP}' ||
               COALESCE(CAST(n_chars AS VARCHAR), '{_FP_NULL}')),
               1, 15)) AS BIGINT)) AS xor_hash,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    """,
)
def b57_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive table fingerprint: (row count, XOR of per-row
    md5-derived 64-bit hashes, an exact column sum) — the anti-entropy
    primitive for validating replicas/migrations without moving data
    (compare three numbers instead of two tables).  XOR is commutative
    and overflow-free, so the fingerprint is independent of row order,
    partitioning, AND engine — md5 agrees everywhere (the sampling.py
    portability argument), where xxhash64 seeds would not.

    Scale: a single full-scan partial aggregate — map-side XOR/sum then
    a 1-row reduce; zero shuffles of row data.  Fingerprint any table
    by swapping the serialized column list."""
    d = table(spark, sf_dir, "documents")
    # 15 hex chars = 60 bits: fits BIGINT in both engines (16 would
    # overflow 2^63 and error under ANSI casts).
    return d.agg(
        F.lit("documents").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            f"bit_xor(CAST(conv(substring(md5(CAST(concat_ws('{_FP_SEP}', "
            f"coalesce(CAST(doc_id AS STRING), '{_FP_NULL}'), "
            f"coalesce(lang, '{_FP_NULL}'), "
            f"coalesce(source, '{_FP_NULL}'), "
            f"coalesce(CAST(n_chars AS STRING), '{_FP_NULL}')) "
            "AS BINARY)), 1, 15), 16, 10) AS BIGINT))"
        ).alias("xor_hash"),
        F.sum("n_chars").alias("sum_chars"),
    )
