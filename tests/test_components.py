"""connected_components unit tests on adversarial graph shapes —
the oracle suite only exercises the near-clique dup blobs, so chains,
cycles, and label-ordering traps get direct coverage here.  Both CC
engines (label propagation + large-star/small-star) run every case, on
BOTH execution paths: the round-14 sub-threshold driver union-find
(the default at these sizes) and the distributed loops (forced by
pinning the threshold to 0), plus explicit driver ≡ distributed
equivalence per engine."""

from __future__ import annotations

import pytest

from etl_wildweb_spark.operators import dedup
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


@pytest.mark.parametrize("case", sorted(_CASES))
@pytest.mark.parametrize(
    "impl", [connected_components, connected_components_bigstar],
    ids=["labelprop", "bigstar"],
)
def test_driver_path_matches_distributed(spark, monkeypatch, case, impl):
    """Round-14 twin pin: the sub-threshold driver union-find and the
    distributed loop must emit identical (node, cluster_id) rows for
    both engines on every adversarial shape.  Threshold 0 forces the
    distributed path (any non-empty edge list exceeds it)."""
    pairs = _CASES[case]
    driver = _cc(spark, pairs, impl)  # default threshold → driver path
    monkeypatch.setattr(dedup, "DRIVER_CC_MAX_EDGES", 0)
    dist = _cc(spark, pairs, impl)  # forced distributed loop
    assert driver == dist


def test_driver_path_schema_and_empty(spark):
    """The driver path must keep the engines' output schema (node,
    cluster_id with the edge id type) — including on an EMPTY edge
    list, where it returns zero rows rather than erroring."""
    empty = spark.createDataFrame([], "id_a long, id_b long")
    for impl in (connected_components, connected_components_bigstar):
        out = impl(empty)
        assert [f.name for f in out.schema.fields] == ["node", "cluster_id"]
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "bigint",
            "bigint",
        ]
        assert out.count() == 0
