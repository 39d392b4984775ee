"""Adversarial correctness tests for the banded range join core
(relational.banded_richer_counts): band-boundary exactness is the
subtle part — these datasets put values exactly AT band edges, below
and above the customer domain, and on ties, and compare against brute
force."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_wildweb_spark.operators.relational import banded_richer_counts

CASES = {
    "band_edges": (
        # customers spaced so several land exactly on band boundaries
        list(range(0, 6400, 100)),
        [-50, 0, 99, 100, 101, 3200, 6299, 6300, 7000],
    ),
    "negatives_and_ties": (
        [-300, -300, -100, 0, 0, 250, 250, 250],
        [-301, -300, -299, -100, 0, 1, 249, 250, 251, 999],
    ),
    "single_value_domain": ([42] * 5, [41, 42, 43]),
    "supplier_outside_domain": ([10, 20, 30], [-1000, 5, 35, 1000]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_banded_equals_bruteforce(spark, name):
    c_vals, s_vals = CASES[name]
    c = spark.createDataFrame([(v,) for v in c_vals], "c_cents long")
    s = spark.createDataFrame(
        [(i, v) for i, v in enumerate(s_vals)], "s_suppkey long, s_cents long"
    )
    got = {
        (r.s_suppkey, r.n_richer_customers)
        for r in banded_richer_counts(spark, s, c, nb=4).collect()
    }
    expected = {
        (i, sum(1 for cv in c_vals if v < cv))
        for i, v in enumerate(s_vals)
        if sum(1 for cv in c_vals if v < cv) > 0
    }
    assert got == expected
