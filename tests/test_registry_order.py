"""Registry ordering contract — the driver's correctness harness checks
the first 50 entries of __spark_entry__.queries() in dict order, so the
PRIORITY list (never-yet-verified families + repaired entries) must lead
and must be fully registered."""

from __future__ import annotations

from etl_wildweb_spark import registry


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
        # round-5 window (4 hash fixes + the 14 never-driver-checked +
        # 32 oldest r1 greens): the declared approx/heuristic/
        # streaming-state entries, each with its own pytest invariants
        # (approx_count_distinct bounds, simhash equivalence twin,
        # timeout-eviction protocol, PPM resize byte replay)
        "b10_approx_distinct",
        "b126_state_timeout_eviction",
        "b29_simhash",
        "b32_ppm_resize",
        # round-5 addition: float-argmin over a data-derived codebook
        # (numpy-replay + determinism + argmin-bound pytest invariants)
        "b134_pq_encode",
        # native streaming sink: per-epoch manifests are commit-protocol
        # facts (idempotent-replay invariants in tests/test_sinks.py)
        "b135_stream_sink",
        # ADC search: float-argmin over the data-derived codebook (ADC
        # identity + recall invariants in tests/test_llmops.py)
        "b137_pq_adc_search",
    }
