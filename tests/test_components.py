"""connected_components unit tests on adversarial graph shapes —
the oracle suite only exercises the near-clique dup blobs, so chains,
cycles, and label-ordering traps get direct coverage here.  Both CC
engines (label propagation + large-star/small-star) run every case."""

from __future__ import annotations

import pytest

from etl_wildweb_spark.operators.dedup import (
    connected_components,
    connected_components_bigstar,
)


def _cc(spark, pairs, impl=connected_components):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = impl(df).collect()
    return {r.node: r.cluster_id for r in out}


def test_chain_propagates_past_diameter(spark):
    # 0-1-2-...-9: min label must walk the whole chain
    got = _cc(spark, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_two_components_and_cycle(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 1), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_min_label_enters_from_high_end(spark):
    # min node attached at the END of the chain: 5-4-3-...-0 reversed
    # edge direction; propagation must be direction-agnostic
    got = _cc(spark, [(i + 1, i) for i in range(5)])
    assert got == {i: 0 for i in range(6)}


def test_bridged_stars(spark):
    # two stars joined by one bridge edge collapse to one component
    pairs = [(0, i) for i in range(1, 5)] + [(100, 100 + i) for i in range(1, 5)]
    pairs.append((4, 104))
    got = _cc(spark, pairs)
    assert set(got.values()) == {0}


_CASES = {
    "chain": [(i, i + 1) for i in range(9)],
    "reversed_chain": [(i + 1, i) for i in range(5)],
    "cycle_plus_pair": [(1, 2), (2, 3), (3, 1), (10, 11)],
    "bridged_stars": [(0, i) for i in range(1, 5)]
    + [(100, 100 + i) for i in range(1, 5)]
    + [(4, 104)],
    "self_loop_and_dup_edges": [(5, 5), (1, 2), (2, 1), (1, 2), (3, 4)],
    "long_chain_log_rounds": [(i, i + 1) for i in range(40)],
}


@pytest.mark.parametrize("case", sorted(_CASES))
def test_bigstar_matches_label_propagation(spark, case):
    """The O(log n) large-star/small-star engine must agree with label
    propagation on every adversarial shape — including the 41-node
    chain, where propagation needs 40 rounds but contraction must
    finish in its max_iter=30 (i.e. actually converge in O(log n))."""
    pairs = _CASES[case]
    assert _cc(spark, pairs, connected_components_bigstar) == _cc(spark, pairs)
