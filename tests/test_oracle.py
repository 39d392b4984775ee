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


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
