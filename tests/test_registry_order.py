"""Registry ordering contract — the driver's correctness harness checks
the first 50 entries of __spark_entry__.queries() in dict order, so the
PRIORITY list (never-yet-verified families + repaired entries) must lead
and must be fully registered.  Also enforces the verification-rate
discipline from VERDICT r6 item 7: the never-driver-checked backlog is a
red test, not a judge finding."""

from __future__ import annotations

import json
from pathlib import Path

from etl_wildweb_spark import registry

REPO = Path(__file__).resolve().parent.parent


def test_priority_window_is_exactly_the_verification_targets():
    ordered = registry.ordered_queries()
    names = list(ordered)
    assert names[: len(registry.PRIORITY)] == registry.PRIORITY
    # the driver's window: 50 entries
    assert len(registry.PRIORITY) == 50
    # this round's additions follow immediately (picked up by a wider
    # window; rotation candidates for the next PRIORITY)
    n = len(registry.PRIORITY)
    assert names[n : n + len(registry.PRIORITY_NEXT)] == registry.PRIORITY_NEXT
    # no duplicates, nothing dropped
    assert len(set(names)) == len(names)
    assert set(names) == set(registry.QUERIES)


def test_priority_oracle_coverage():
    """Every PRIORITY/PRIORITY_NEXT entry that can be SQL-checked has an
    oracle; the rows-only ones are the declared streaming/heuristic/
    side-effecting set and nothing else."""
    registry.load_all()
    rows_only = {
        n
        for n in registry.PRIORITY + registry.PRIORITY_NEXT
        if n not in registry.ORACLES
    }
    assert rows_only == {
        # round-7 consolidation window (the repaired b134 + the 36
        # round-6 additions + wildweb_pipeline + 12 TPC-H rows): the
        # declared rows-only entries, each with its own pytest
        # invariants.
        # PQ encode: codebook-dependent float argmin (numpy-replay pin
        # in tests/test_llmops.py; output packed BIGINT per the driver
        # canonicalizer contract)
        "b134_pq_encode",
        # the composed source→A5-A17→sink streaming query (manifests
        # are commit-protocol facts; stream≡batch + restart invariants
        # in tests/test_stream_pipeline.py)
        "b138_stream_pipeline_e2e",
        # mergeable KLL quantile rollup (approximate by design;
        # rank-error bound in tests/test_new_ops_invariants.py)
        "b140_kll_quantile_rollup",
        # theta-sketch retention set algebra (approximate; accuracy pin
        # in tests/test_new_ops_invariants.py)
        "b141_theta_retention_sketch",
        # binaryFile ingest round-trip (paths/mtimes are environment
        # facts; byte-equivalence in tests/test_llmops.py)
        "b146_binaryfile_ingest",
        # two-channel streaming fan-out (epoch logs are execution
        # facts; channel pins in tests/test_stream_pipeline.py)
        "b148_stream_error_channel",
        # iterative tokenizer pair (argmax loop / learned-merge replay
        # — not SQL-expressible; bit-identical to the sequential
        # reference algorithm in tests/test_llmops.py)
        "b156_bpe_train",
        "b160_bpe_apply",
        # absorbing-chain attribution (iterative linear algebra on the
        # bounded transition matrix; invariants in
        # tests/test_mining_invariants.py)
        "b165_markov_attribution",
        # round-7 addition: full IVF-PQ composition (approximate by
        # construction; numpy-replay composition identity in
        # tests/test_llmops.py)
        "b175_ivfpq_search",
    }


def _driver_checked() -> set[str]:
    """Union of every query name that has ever appeared in a driver
    CORRECTNESS window (the in-repo CORRECTNESS_r*.json files)."""
    seen: set[str] = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        seen |= set(json.loads(p.read_text()))
    return seen


def test_never_checked_backlog_is_bounded():
    """VERDICT r6 item 7: a round must not register more queries than
    the 50-slot driver window can absorb.  Every query that has never
    been in a driver window must either be in the CURRENT window
    (PRIORITY — being burned down this round) or be one of this
    round's capped additions (PRIORITY_NEXT); the overflow beyond the
    window is bounded by 2× the per-round additions cap."""
    registry.load_all()
    never = set(registry.QUERIES) - _driver_checked()
    outside_window = never - set(registry.PRIORITY)
    cap = 2 * registry.ADDITIONS_PER_ROUND_CAP
    assert len(outside_window) <= cap, (
        f"{len(outside_window)} never-driver-checked queries outside the "
        f"PRIORITY window (cap {cap}): {sorted(outside_window)} — rotate "
        "them into PRIORITY or stop adding"
    )
    # new registrations must enter PRIORITY_NEXT in the same commit
    unscheduled = outside_window - set(registry.PRIORITY_NEXT)
    assert not unscheduled, (
        f"never-checked queries missing from PRIORITY_NEXT: "
        f"{sorted(unscheduled)}"
    )


def test_additions_per_round_cap():
    assert len(registry.PRIORITY_NEXT) <= registry.ADDITIONS_PER_ROUND_CAP, (
        "round additions exceed the window-absorption cap "
        f"({len(registry.PRIORITY_NEXT)} > {registry.ADDITIONS_PER_ROUND_CAP})"
    )
