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
    # the driver's window is the first 50 of ordered_queries() =
    # PRIORITY then PRIORITY_NEXT; pin the SUM to exactly 50 so this
    # round's additions are driver-checked the round they land
    # (round 7's PRIORITY==50 convention left its 2 additions
    # unchecked for a full round — VERDICT r7 item 1)
    assert len(registry.PRIORITY) + len(registry.PRIORITY_NEXT) == 50
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
        # round-9 window (the 3 r03-stale confirmations + 45 of the
        # r04 cohort + this round's 2 additions): the declared
        # rows-only entries, each with its own pytest invariants.
        # file-layout ops: outputs are file counts / footer metrics —
        # environment facts (pins in tests/test_compaction.py, tests/test_file_sources.py)
        "b100_compaction",
        "b99_zorder_layout",
        # real pixel decode over fixture bytes (byte-exact pins in
        # tests/test_multimodal.py)
        "b32_ppm_decode",
        # b66/b67/b72/b83 LEFT this set in round 9: their returned
        # snapshots are deterministic batch equivalents (latest-row
        # max_by, exact DECIMAL micro-unit sums, interval-fold
        # sessions), so each carries its batch construction as an
        # exact oracle now — foreachBatch staging is the MECHANISM,
        # not the result
        # custom streaming connector / commit-protocol sink
        # (pins in tests/test_sources.py, tests/test_sinks.py)
        "b91_stream_http_source",
        "b94_datasource_writer",
        # round-9 addition: corpus-sampled recall probe (integer
        # recall rows replayed in tests/test_llmops.py)
        "b175_ivfpq_observed_sampled",
        # round-9 addition: drop-late-metrics audit — output IS the
        # engine's per-batch observe()/state metrics, no SQL twin
        # (drop/evict counts replayed in tests/test_streaming.py)
        "b179_stream_late_audit",
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
