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
        # round-6 window (the 6 round-5 additions + 44 oldest
        # re-confirmations): the declared streaming/heuristic/
        # side-effecting entries, each with its own pytest invariants.
        # round-5 additions (numpy-replay / commit-protocol / recall
        # invariants in tests/test_llmops.py + tests/test_sinks.py):
        "b134_pq_encode",
        "b135_stream_sink",
        "b137_pq_adc_search",
        # round-6 addition: the composed source→A5-A17→sink streaming
        # query (manifests are commit-protocol facts; stream≡batch +
        # restart invariants in tests/test_stream_pipeline.py)
        "b138_stream_pipeline_e2e",
        # round-6 addition: mergeable KLL quantile rollup (approximate
        # by design; rank-error bound in tests/test_new_ops_invariants)
        "b140_kll_quantile_rollup",
        # round-6 addition: theta-sketch retention set algebra
        # (approximate; accuracy pin in tests/test_new_ops_invariants)
        "b141_theta_retention_sketch",
        # round-6 addition: binaryFile ingest round-trip (paths/mtimes
        # are environment facts; byte-equivalence in tests/test_llmops)
        "b146_binaryfile_ingest",
        # round-6 addition: two-channel streaming fan-out (epoch logs
        # are execution facts; channel pins in tests/test_stream_pipeline)
        "b148_stream_error_channel",
        # streaming-state entries: micro-batch epoch boundaries are
        # execution facts DuckDB can't replay (tests/test_streaming.py
        # pins batch-equivalence instead)
        "b23_watermark_tumbling",
        "b24_stream_dedup",
        "b24_custom_stateful",
        # heuristic language-ID (equivalence twin in tests)
        "b31_langid",
        # side-effecting connector demos (filesystem manifests / raw
        # envelope ingest; invariants in tests/test_file_sources.py and
        # tests/test_wildweb.py)
        "b36_file_ingest",
        "wildweb_envelope_e2e",
        # round-6 extension: iterative tokenizer pair (argmax loop /
        # learned-merge replay — not SQL-expressible; bit-identical to
        # the sequential reference algorithm in tests/test_llmops.py)
        "b156_bpe_train",
        "b160_bpe_apply",
        # round-6 extension: absorbing-chain attribution (iterative
        # linear algebra on the bounded transition matrix; invariants
        # in tests/test_mining_invariants.py)
        "b165_markov_attribution",
    }
