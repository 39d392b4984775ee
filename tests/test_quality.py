"""Data-quality expectation suite: detection ability on planted
violations (the oracle differential only ever sees the clean corpus)."""

from __future__ import annotations


def test_quality_checks_detect_planted_violations(spark, tmp_path):
    """b49 on a synthetic corpus with one violation of each class —
    proves the checks DETECT, not just pass on clean data."""
    import datetime as dt

    from etl_wildweb_spark.operators.quality import b49_quality_checks

    def w(name, df):
        df.write.parquet(str(tmp_path / f"{name}.parquet"))

    w(
        "orders",
        spark.createDataFrame(
            [(1, 10), (2, 10), (2, 10), (3, 99)],  # dup PK 2; custkey 99 missing
            "o_orderkey long, o_custkey long",
        ),
    )
    w("customer", spark.createDataFrame([(10,)], "c_custkey long"))
    w(
        "lineitem",
        spark.createDataFrame(
            [(1, 5.0), (777, 5.0), (1, 0.0), (1, None)],  # orphan 777; qty 0 + null
            "l_orderkey long, l_quantity double",
        ),
    )
    w(
        "events",
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), None)],  # null user
            "event_id long, ts timestamp, user_id long",
        ),
    )
    w(
        "documents",
        spark.createDataFrame(
            [(1, ""), (2, None), (3, "ok")],  # two empty-text docs
            "doc_id long, text string",
        ),
    )
    got = {
        r.check_name: r.n_violations
        for r in b49_quality_checks(spark, str(tmp_path)).collect()
    }
    assert got == {
        "lineitem_fk_orders": 1,
        "orders_fk_customer": 1,
        "lineitem_qty_range": 2,
        "events_user_not_null": 1,
        "documents_nonempty_text": 2,
        "orders_pk_unique": 1,
    }
