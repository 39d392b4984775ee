"""Differential test: every hash-checked query vs its DuckDB oracle.

This mirrors the driver's t2 correctness gate (row-count + schema +
order-insensitive value multiset) at sf0.01 — see __spark_entry__.py.
"""

from __future__ import annotations

import pytest

from etl_wildweb_spark import registry

from .oracle_utils import compare

registry.load_all()

CHECKED = sorted(registry.ORACLES)
ROWS_ONLY = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", CHECKED)
def test_oracle_parity(spark, sf_dir, name):
    compare(spark, sf_dir, name, registry.QUERIES[name], registry.ORACLES[name])


#: DuckDB output types the driver's hash canonicalization cannot survive:
#: duckdb 1.x's pandas path (`.df()`) coerces DECIMAL(p,s) and
#: HUGEINT/UHUGEINT to float64, so a value-identical result hashes
#: differently from Spark's Decimal/bigint (`1.5` vs Decimal('1.500000'),
#: `142.0` vs 142).  This bit b35_pack_utilization in round 1 and
#: b71/b73/b74/b90 in round 4 — every time with values verified equal.
#: The local comparator (oracle_utils._norm) compares Python values where
#: Decimal('1.5') == Decimal('1.500000'), so test_oracle_parity alone
#: cannot catch the class; this DESCRIBE-level guard closes the blind spot.
_HASH_UNSTABLE_TYPES = ("DECIMAL", "HUGEINT")


@pytest.mark.parametrize("name", CHECKED)
def test_oracle_output_types_hash_stable(sf_dir, name):
    """No oracle may emit a DECIMAL or HUGEINT output column.  Binding
    only (DESCRIBE) — no execution; converts sums to integer
    micro-units or explicit BIGINT casts instead."""
    from .oracle_utils import duckdb_conn

    con = duckdb_conn(sf_dir)
    try:
        rows = con.execute(
            f"DESCRIBE ({registry.ORACLES[name]})"
        ).fetchall()
    finally:
        con.close()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(u in str(typ).upper() for u in _HASH_UNSTABLE_TYPES)
    ]
    assert not bad, (
        f"{name}: oracle emits hash-unstable type(s) {bad}; use integer "
        "micro-units (sum(CAST(round(x*1e6) AS BIGINT))) or CAST(... AS "
        "BIGINT) — DuckDB's pandas path coerces these to float64 and the "
        "driver's value hash diverges from Spark even when values match"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    from .oracle_utils import assert_driver_sortable

    df = registry.QUERIES[name](spark, sf_dir)
    assert_driver_sortable(name, df.schema)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
