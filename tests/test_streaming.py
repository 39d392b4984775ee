"""Streaming semantics tests (SURVEY.md §7.3.5): batch/stream
equivalence under availableNow, watermark emission, stateful dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_wildweb_spark import registry
from etl_wildweb_spark.io import table
from etl_wildweb_spark.streaming import windows as sw

registry.load_all()


def test_stream_tumbling_equals_batch(spark, sf_dir):
    # the same windowed agg through readStream (availableNow) must equal
    # the batch result — Spark's unification property, our test handle
    from etl_wildweb_spark.functions.exact import finite

    # mirror b21's non-finite quarantine in the streamed twin, so the
    # stream≡batch invariant holds on ANY corpus (e.g. the degen one
    # with planted NaN/±Inf readings), not just the clean shipped sf
    # corpora (ADVICE round 9)
    s = sw.events_stream(spark, sf_dir).filter(finite("value"))
    agg = (
        s.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    got = {
        (r.window_start, r.n_events)
        for r in sw.run_to_memory(agg, mode="complete").collect()
    }
    want = {
        (r.window_start, r.n_events)
        for r in registry.QUERIES["b21_tumbling_window"](spark, sf_dir)
        .select("window_start", "n_events")
        .collect()
    }
    assert got == want


def test_watermark_append_emits_closed_windows(spark, sf_dir):
    out = registry.QUERIES["b23_watermark_tumbling"](spark, sf_dir)
    emitted = {r.window_start for r in out.collect()}
    e = table(spark, sf_dir, "events")
    max_ts = e.agg(F.max("ts")).first()[0]
    batch = registry.QUERIES["b21_tumbling_window"](spark, sf_dir)
    all_windows = {r.window_start for r in batch.collect()}
    import datetime

    horizon = max_ts - datetime.timedelta(hours=1)
    closed = {
        w for w in all_windows if (w + datetime.timedelta(minutes=10)) <= horizon
    }
    assert emitted == closed, (
        f"emitted {len(emitted)} windows, expected {len(closed)} closed ones"
    )


def test_stream_dedup_equals_distinct(spark, sf_dir):
    out = registry.QUERIES["b24_stream_dedup"](spark, sf_dir)
    got = {(r.user_id, r.event_type) for r in out.collect()}
    want = {
        (r.user_id, r.event_type)
        for r in table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert got == want


def test_session_window_stream_equals_batch(spark, sf_dir):
    s = sw.events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (
        s.groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in sw.run_to_memory(agg, mode="complete").collect()
    }
    want = {
        (r.user_id, r.session_start, r.n_events)
        for r in registry.QUERIES["b22_session_window"](spark, sf_dir).collect()
    }
    assert got == want


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Probed round 11: session_window's merge rule is INCLUSIVE at
    exactly the gap — an event landing precisely at the previous
    session's end (prev_ts + 5 min, to the microsecond) EXTENDS the
    session; +1 µs starts a new one; −1 µs obviously merges.  The
    µs-resolution corpus never produces an exact-gap pair, so this
    plant is the only thing standing between the oracle's strict-split
    formulation (the pre-r11 bug) and ten more green rounds of it.
    Both the engine emission set and oracle agreement are pinned."""
    import datetime as dt
    import glob
    import os
    import shutil

    import duckdb

    from .oracle_utils import rows_multiset

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    gap = dt.timedelta(minutes=5)
    us = dt.timedelta(microseconds=1)
    rows = [
        # user 1: exact-gap chain of three — ONE session of 3
        (1, t0, 1), (2, t0 + gap, 1), (3, t0 + 2 * gap, 1),
        # user 2: gap − 1 µs — merges
        (4, t0, 2), (5, t0 + gap - us, 2),
        # user 3: gap + 1 µs — splits
        (6, t0, 3), (7, t0 + gap + us, 3),
    ]
    df = spark.createDataFrame(
        [(e, ts, u, "view", 1.0, "{}") for e, ts, u in rows],
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = str(tmp_path / "sessb")
    os.makedirs(d)
    st = os.path.join(d, "_s")
    df.coalesce(1).write.parquet(st)
    shutil.copy(
        glob.glob(os.path.join(st, "part-*.parquet"))[0],
        os.path.join(d, "events.parquet"),
    )
    shutil.rmtree(st)

    out = registry.QUERIES["b22_session_window"](spark, d)
    got = {
        (r.user_id, r.session_start, r.n_events) for r in out.collect()
    }
    assert got == {
        (1, t0, 3),                       # inclusive boundary ×2 merged
        (2, t0, 2),                       # sub-gap merged
        (3, t0, 1), (3, t0 + gap + us, 1),  # over-gap split
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    res = con.execute(registry.ORACLES["b22_session_window"])
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    s_rows = [tuple(r) for r in out.collect()]
    assert rows_multiset(list(out.columns), s_rows) == rows_multiset(
        d_cols, d_rows
    )

    # b72's custom interval fold must agree with session_window AND
    # its own oracle at the same boundaries (it split at exactly-gap
    # until round 11 — the fold merged on strict <)
    out72 = registry.QUERIES["b72_stateful_sessionize"](spark, d)
    got72 = {
        (r.user_id, r.session_start_us, r.n_events) for r in out72.collect()
    }
    us_of = lambda t: int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)  # noqa: E731
    assert got72 == {
        (u, us_of(ts), n) for (u, ts, n) in got
    }
    res = con.execute(registry.ORACLES["b72_stateful_sessionize"])
    assert rows_multiset(
        list(out72.columns), [tuple(r) for r in out72.collect()]
    ) == rows_multiset([c[0] for c in res.description], res.fetchall())


def test_custom_stateful_equals_batch_agg(spark, sf_dir):
    # final cross-batch state per user must equal the batch aggregate
    out = registry.QUERIES["b24_custom_stateful"](spark, sf_dir)
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6), r.max_value)
        for r in out.collect()
    }
    want = {
        r.user_id: (r.n_events, round(r.total_value, 6), r.max_value)
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want


def test_transform_with_state_matches_batch_and_legacy(spark, sf_dir):
    """Spark 4 transformWithStateInPandas must agree with both the
    batch aggregate and the legacy applyInPandasWithState operator.
    Gated: this container's google.protobuf cannot back the TWS state
    server (streaming/stateful.py::tws_available)."""
    from etl_wildweb_spark.streaming.stateful import (
        b24_custom_stateful,
        b24_transform_with_state,
        tws_available,
    )

    if not tws_available():
        pytest.skip(
            "b24_transform_with_state NOT EXECUTED: google.protobuf is "
            "absent in this container (re-probed round 4: `import google` "
            "→ ModuleNotFoundError), so the TWS state server cannot "
            "start; the legacy applyInPandasWithState path "
            "(b24_custom_stateful) is the executed-and-verified one"
        )

    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
        for r in b24_transform_with_state(spark, sf_dir).collect()
    }
    legacy = {
        r["user_id"]: (r["n_events"], r["total_value"], r["max_value"])
        for r in b24_custom_stateful(spark, sf_dir).collect()
    }
    assert got == legacy


def test_stream_funnel_equals_batch_funnel(spark, sf_dir):
    """The incremental funnel's final stage distribution equals the
    batch funnel's reach counts: |stage >= k| == batch n_users(k)."""
    from etl_wildweb_spark import registry

    out = registry.QUERIES["b58_stream_funnel"](spark, sf_dir).collect()
    batch = {r.stage: r.n_users for r in
             registry.QUERIES["b47_funnel"](spark, sf_dir).collect()}
    stages = [r.stage for r in out]
    for k in (1, 2, 3):
        assert sum(1 for s in stages if s >= k) == batch[k], k


def test_stream_funnel_out_of_order_replay(spark, sf_dir):
    """Out-of-order safety: replaying the 4 time slices SHUFFLED
    (latest first, then interleaved) yields the identical per-user
    (stage, reached_us) as the batch-equivalent in-order replay —
    the candidate-retention state machine is arrival-order
    invariant, not merely mtime-lucky."""
    from etl_wildweb_spark import registry

    fn = registry.QUERIES["b58_stream_funnel"]
    want = {
        r.user_id: (r.stage, r.reached_us)
        for r in fn(spark, sf_dir).collect()
    }
    got = {
        r.user_id: (r.stage, r.reached_us)
        for r in fn(spark, sf_dir, replay_order=[3, 1, 2, 0]).collect()
    }
    assert got == want


def test_stateful_sessionize_equals_session_window(spark, sf_dir):
    """FULL set equality (not a watermark subset): the custom interval-
    state sessionizer's final snapshot must equal the built-in
    session_window aggregation — per user, per session start, per
    event count."""
    from etl_wildweb_spark import registry

    got = {
        (r.user_id, r.session_start_us, r.n_events)
        for r in registry.QUERIES["b72_stateful_sessionize"](
            spark, sf_dir
        ).collect()
    }
    batch = registry.QUERIES["b22_session_window"](spark, sf_dir)
    want = {
        (r.user_id, r.start_us, r.n_events)
        for r in batch.select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            "n_events",
        ).collect()
    }
    assert got == want


def test_stream_stream_left_outer_null_padding(spark, sf_dir):
    """Matched pairs equal the batch interval join; null-padded rows
    are exactly the batch-unmatched views whose 6h horizon the final
    watermark (max ts − 1h) has closed."""
    from etl_wildweb_spark import registry
    from etl_wildweb_spark.io import table

    out = registry.QUERIES["b64_stream_stream_left_outer"](
        spark, sf_dir
    ).collect()
    got_pairs = {(r.view_id, r.purchase_id) for r in out if r.purchase_id is not None}
    got_nulls = {r.view_id for r in out if r.purchase_id is None}

    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    batch = v.join(
        p,
        (F.col("vu") == F.col("pu"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 6 HOURS")),
        "left",
    )
    want_pairs = {
        (r.view_id, r.purchase_id)
        for r in batch.filter(F.col("purchase_id").isNotNull()).collect()
    }
    assert got_pairs == want_pairs

    unmatched = {
        r.view_id: r.v_ts
        for r in batch.filter(F.col("purchase_id").isNull()).collect()
    }
    # EXACT null set (round 9, probed boundary semantics — see b64's
    # docstring): final watermark = ms-floored MIN of both streams'
    # max event times minus 1h; emitted iff v_ts + 6h STRICTLY below
    import datetime as dt

    max_v = v.agg(F.max("v_ts")).collect()[0][0]
    max_p = p.agg(F.max("p_ts")).collect()[0][0]
    floor_ms = lambda t: t.replace(microsecond=t.microsecond // 1000 * 1000)
    wm = min(floor_ms(max_v), floor_ms(max_p)) - dt.timedelta(hours=1)
    closed = {
        vid for vid, ts in unmatched.items()
        if ts + dt.timedelta(hours=6) < wm
    }
    assert got_nulls == closed


def test_stream_semi_join_once_per_view_equals_batch(spark, sf_dir):
    """b177: the streamed LEFT SEMI interval join emits each converting
    view EXACTLY once (no view×purchase fan-out, even for views with
    many qualifying purchases) and its row set equals the batch
    leftsemi join — no watermark-closure dependence, unlike b64's
    null padding."""
    from etl_wildweb_spark import registry
    from etl_wildweb_spark.io import table

    out = registry.QUERIES["b177_stream_semi_join"](spark, sf_dir).collect()
    got = [(r.view_id, r.user_id) for r in out]
    assert len(got) == len(set(got)), "semi join emitted a view twice"

    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("p_ts")
    )
    want = {
        (r.view_id, r.vu)
        for r in v.join(
            p,
            (F.col("vu") == F.col("pu"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 6 HOURS")),
            "leftsemi",
        ).collect()
    }
    assert set(got) == want
    # sanity: some views convert and some don't, or the shape under
    # test is vacuous on this corpus
    n_views = v.count()
    assert 0 < len(got) < n_views


def test_checkpoint_recovery_equals_batch(spark, sf_dir):
    """b83: two query lifetimes over one checkpoint (half the corpus,
    restart, the rest) must produce the exact one-shot batch
    aggregate — no loss, no double count."""
    from etl_wildweb_spark.io import table
    from etl_wildweb_spark.streaming.stateful import b83_checkpoint_recovery

    from etl_wildweb_spark.functions.exact import finite

    got = {
        r.event_type: (r.n, r.total_micro)
        for r in b83_checkpoint_recovery(spark, sf_dir).collect()
    }
    want = {
        r.event_type: (r.n, r.total_micro)
        for r in table(spark, sf_dir, "events")
        .filter(finite("value"))  # mirrors b83's input quarantine
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000)
            .cast("bigint")
            .alias("total_micro"),
        )
        .collect()
    }
    assert got == want


def test_incremental_agg_batch_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Crash-replay twin: foreachBatch may re-deliver the LAST batch id
    after a failure; the versioned v{B}→v{B+1} merge must make the
    second delivery a no-op."""
    import os

    from etl_wildweb_spark.io import table
    from etl_wildweb_spark.operators.merge import read_scd1_snapshot

    e = table(spark, sf_dir, "events").select("event_type", "value")
    snap = str(tmp_path / "snap")
    os.makedirs(snap)

    # hand-drive the same upsert closure stream_incremental_agg installs
    from etl_wildweb_spark.operators.merge import incremental_upsert

    upsert = incremental_upsert(spark, ["event_type"], "value", snap)

    first = e.limit(4000)
    upsert(first, 0)
    once = sorted(map(tuple, read_scd1_snapshot(spark, snap).collect()))
    upsert(first, 0)  # replay the SAME batch id
    twice = sorted(map(tuple, read_scd1_snapshot(spark, snap).collect()))
    assert once == twice


def test_stream_topk_count_half_equals_batch(spark, sf_dir):
    """b111's streamable half (hourly counts) under availableNow must
    equal the batch counts feeding the rank — so ranking the streamed
    sink reproduces the registered query exactly."""
    s = sw.events_stream(spark, sf_dir)
    agg = (
        s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    sunk = sw.run_to_memory(agg, mode="complete")

    from pyspark.sql import Window as W

    rk = F.row_number().over(
        W.partitionBy("window_start").orderBy(F.col("n").desc(), "event_type")
    )
    got = {
        tuple(r)
        for r in sunk.withColumn("rk", rk).filter(F.col("rk") <= 3).collect()
    }
    want = {
        tuple(r)
        for r in registry.QUERIES["b111_stream_topk"](spark, sf_dir).collect()
    }
    assert got == want


def test_state_timeout_eviction_equals_run_decomposition(spark, sf_dir):
    """b126: the emitted multiset must equal the run decomposition of
    the evict_member membership rule — every maximal run of consecutive
    batches with data yields exactly one (n, first_us, last_us) row
    (mid-stream runs via ProcessingTimeTimeout, the trailing run via
    AvailableNow's cleanup batch).  Each batch carries a member user's
    FULL event set, so a run of length L emits L×n_events(u) with the
    user's global min/max microseconds."""
    from etl_wildweb_spark.streaming import stateful as st

    got = sorted(
        (r.user_id, r.n_events, r.first_us, r.last_us)
        for r in registry.QUERIES["b126_state_timeout_eviction"](
            spark, sf_dir
        ).collect()
    )

    per_user = {
        r.user_id: (r.n, r.lo, r.hi)
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        )
        .collect()
    }
    want = []
    for u, (n, lo, hi) in per_user.items():
        present = [
            i for i in range(st.N_EVICT_BATCHES) if st.evict_member(u, i)
        ]
        runs, cur = [], [present[0]]
        for i in present[1:]:
            if i == cur[-1] + 1:
                cur.append(i)
            else:
                runs.append(cur)
                cur = [i]
        runs.append(cur)
        for run in runs:
            want.append((u, len(run) * n, lo, hi))
    assert got == sorted(want)


def test_stream_late_audit_replays_engine_metrics(spark, sf_dir):
    """b179: the audit's drop/evict counters replayed exactly from the
    batch table.  Slice arithmetic mirrors _time_sliced_stream
    (timedelta division); the one-partition-per-slice assumption (one
    staged file per slice, far below maxPartitionBytes) makes the
    state operator's input grain = distinct 10-minute windows per
    slice, which is what numRowsDroppedByWatermark counts."""
    import datetime

    from etl_wildweb_spark import registry

    out = registry.QUERIES["b179_stream_late_audit"](spark, sf_dir)
    rows = {r["batch_id"]: r for r in out.collect()}
    assert sorted(rows) == [0, 1, 2, 3]

    e = table(spark, sf_dir, "events").select("ts")
    lo, hi = e.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 4
    bounds = [
        (lo + span * i, hi if i == 3 else lo + span * (i + 1)) for i in range(4)
    ]

    def slice_stats(i):
        a, b = bounds[i]
        cond = (F.col("ts") >= F.lit(a)) & (
            (F.col("ts") <= F.lit(b)) if i == 3 else (F.col("ts") < F.lit(b))
        )
        r = e.filter(cond).agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.window("ts", "10 minutes")).alias("nw"),
        ).collect()[0]
        return r["n"], r["nw"]

    replay_order = [3, 0, 1, 2]
    stats = {i: slice_stats(i) for i in replay_order}

    # input rows per batch = slice sizes in replay order
    for batch_id, sl in enumerate(replay_order):
        assert rows[batch_id]["input_rows"] == stats[sl][0], (batch_id, sl)

    # watermark: batch 0 runs at epoch; every later batch at
    # ms-floored global max - 1h (monotonic, newest slice played first)
    wm = hi.replace(microsecond=hi.microsecond // 1000 * 1000) - datetime.timedelta(
        hours=1
    )
    assert rows[0]["watermark"] == datetime.datetime(1970, 1, 1)
    for b in (1, 2, 3):
        assert rows[b]["watermark"] == wm, rows[b]

    # late filtering uses the PREVIOUS batch's watermark: batch 1
    # (first late slice) is admitted, batches 2/3 drop every partial
    # (all their windows end >1h before the global max)
    assert rows[0]["late_windows_dropped"] == 0
    assert rows[1]["late_windows_dropped"] == 0
    assert rows[2]["late_windows_dropped"] == stats[1][1]
    assert rows[3]["late_windows_dropped"] == stats[2][1]

    # batch 1's eviction emits everything admitted so far except the
    # windows still open under the watermark (end > wm)
    still_open = (
        e.filter(F.col("ts") >= F.lit(bounds[3][0]))
        .select(F.window("ts", "10 minutes").alias("w"))
        .filter(F.col("w.end") > F.lit(wm))
        .distinct()
        .count()
    )
    admitted = stats[3][1] + stats[0][1]  # slices 3 then 0, disjoint windows
    assert rows[1]["windows_emitted"] == admitted - still_open
    assert rows[1]["state_windows"] == still_open
    assert rows[2]["windows_emitted"] == 0 and rows[3]["windows_emitted"] == 0

    # observed metrics rode the same pass: per-batch min/max event
    # times (second-truncated in progress JSON) bracket the slice
    for batch_id, sl in enumerate(replay_order):
        a, b = bounds[sl]
        lo_s = rows[batch_id]["first_event_ts"]
        hi_s = rows[batch_id]["last_event_ts"]
        assert a - datetime.timedelta(seconds=1) <= lo_s <= hi_s <= b


def test_b64_closure_boundary_semantics(spark, tmp_path):
    """The probed watermark-closure rules, planted permanently: (a)
    null emission is STRICT (horizon == watermark stays open), (b) the
    watermark is ms-FLOORED, (c) it is the MIN across both streams'
    watermarks.  These are the three facts that let b64 carry an exact
    oracle; if a Spark upgrade moves any of them this test goes red
    before the oracle sweep does."""
    import datetime as dt
    import glob
    import os
    import shutil

    from etl_wildweb_spark import registry

    M = dt.datetime(2024, 3, 1, 12, 0, 0, 123456)  # sub-ms max-setter
    wm = dt.datetime(2024, 3, 1, 11, 0, 0, 123000)  # ms_floor(M) - 1h
    h6 = dt.timedelta(hours=6)
    ms = dt.timedelta(milliseconds=1)
    rows = [
        (9000, M, 999, "purchase", 1.0, "{}"),
        (9001, M, 998, "view", 1.0, "{}"),  # views wm must also reach M
        (1, wm - h6 - ms, 1001, "view", 0.5, "{}"),      # closed -> null
        (2, wm - h6, 1002, "view", 0.5, "{}"),           # AT boundary -> open
        (3, wm - h6 + ms, 1003, "view", 0.5, "{}"),      # open
        (4, wm - h6 - dt.timedelta(seconds=10), 1004, "view", 0.5, "{}"),
        (5, wm - h6 + dt.timedelta(microseconds=500), 1005, "view", 0.5, "{}"),
        (500, dt.datetime(2024, 3, 1, 1, 0), 777, "view", 0.1, "{}"),
        (501, dt.datetime(2024, 3, 1, 2, 0), 777, "purchase", 2.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = str(tmp_path / "b64corpus")
    os.makedirs(d)
    stage = os.path.join(d, "_stage")
    df.coalesce(1).write.parquet(stage)
    shutil.copy(
        glob.glob(os.path.join(stage, "part-*.parquet"))[0],
        os.path.join(d, "events.parquet"),
    )
    shutil.rmtree(stage)

    out = registry.QUERIES["b64_stream_stream_left_outer"](spark, d).collect()
    pairs = {(r.user_id, r.view_id, r.purchase_id) for r in out}
    assert pairs == {
        (777, 500, 501),   # matched pair, arrival-driven
        (1001, 1, None),   # 1 ms inside closure
        (1004, 4, None),   # well inside closure
        # 1002 (exactly at), 1003 (+1 ms), 1005 (+0.5 ms): open;
        # 998's own view at M: horizon in the future, open
    }, pairs

    # without the view max-setter the MIN policy would freeze the
    # watermark at the views' own max; re-plant without 9001 and no
    # null may emit
    rows2 = [r for r in rows if r[0] != 9001]
    df2 = spark.createDataFrame(
        rows2,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d2 = str(tmp_path / "b64corpus2")
    os.makedirs(d2)
    stage2 = os.path.join(d2, "_stage")
    df2.coalesce(1).write.parquet(stage2)
    shutil.copy(
        glob.glob(os.path.join(stage2, "part-*.parquet"))[0],
        os.path.join(d2, "events.parquet"),
    )
    shutil.rmtree(stage2)
    out2 = registry.QUERIES["b64_stream_stream_left_outer"](spark, d2).collect()
    assert {r.view_id for r in out2 if r.purchase_id is None} == set()


def test_b23_watermark_closure_is_inclusive(spark, tmp_path):
    """The probed b23 boundary, planted permanently: a window ending
    exactly AT the final watermark IS emitted (inclusive — unlike
    b64's strict join closure).  Max-setter at 13:00:00 puts the
    watermark exactly on the 12:00 window edge."""
    import datetime as dt
    import glob
    import os
    import shutil

    from etl_wildweb_spark import registry

    rows = [
        (1, dt.datetime(2024, 3, 1, 13, 0, 0), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 3, 1, 11, 55), 2, "view", 1.0, "{}"),  # end == wm
        (3, dt.datetime(2024, 3, 1, 11, 45), 3, "view", 1.0, "{}"),  # end < wm
        (4, dt.datetime(2024, 3, 1, 12, 5), 4, "view", 1.0, "{}"),   # end > wm
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = str(tmp_path / "b23corpus")
    os.makedirs(d)
    st = os.path.join(d, "_s")
    df.coalesce(1).write.parquet(st)
    shutil.copy(
        glob.glob(os.path.join(st, "part-*.parquet"))[0],
        os.path.join(d, "events.parquet"),
    )
    shutil.rmtree(st)
    out = registry.QUERIES["b23_watermark_tumbling"](spark, d).collect()
    assert {(r.window_start, r.n_events) for r in out} == {
        (dt.datetime(2024, 3, 1, 11, 40), 1),
        (dt.datetime(2024, 3, 1, 11, 50), 1),  # the == boundary window
    }

def _sliced_interval_join(spark, sf_dir, how: str, no_data_batches: bool):
    """The b23-inner/b177-semi join shape over a 4-slice TIME-ORDERED
    multi-batch replay (one file ⇒ one micro-batch per slice), so
    watermark-driven state EVICTION actually happens between batches —
    unlike the single availableNow replay the r9 fast-path measurement
    used.  Built from the SHARED production construction
    (joins._watermarked_views_purchases with the sliced stream as
    source) so the delay/interval/aliases cannot drift from the
    shipped queries.  Returns the emitted set."""
    import shutil

    from etl_wildweb_spark.streaming.joins import _watermarked_views_purchases
    from etl_wildweb_spark.streaming.stateful import _time_sliced_stream

    stream, chunk_dir = _time_sliced_stream(spark, sf_dir, n_slices=4)
    try:
        views, purchases, cond = _watermarked_views_purchases(
            spark, sf_dir, source=stream
        )
        if how == "inner":
            joined = views.join(purchases, cond).select(
                "view_id", "purchase_id"
            )
        else:
            joined = views.join(purchases, cond, "leftSemi").select("view_id")
        out = sw.run_to_memory(
            joined, mode="append", no_data_batches=no_data_batches
        )
        return {tuple(r) for r in out.collect()}
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


@pytest.mark.parametrize("how", ["inner", "semi"])
def test_eviction_skip_flag_invariant_under_multibatch_replay(
    spark, sf_dir, how
):
    """VERDICT r9 item 7: the no_data_batches=False fast path (skip the
    trailing eviction-only micro-batch) was measured under a single
    availableNow replay; pin that under a MULTI-batch replay — where
    mid-stream watermark eviction is live — the flag on/off emits
    identical output for the emit-on-arrival shapes (inner/semi), and
    that the emitted set equals the batch interval join (time-ordered
    slices are never late, so eviction must not lose matches)."""
    with_final = _sliced_interval_join(spark, sf_dir, how, True)
    without_final = _sliced_interval_join(spark, sf_dir, how, False)
    assert with_final == without_final

    # batch twin from the SAME shared construction (withWatermark is a
    # no-op on batch), so all three sides share one definition
    from etl_wildweb_spark.streaming.joins import _watermarked_views_purchases

    v, p, cond = _watermarked_views_purchases(
        spark, sf_dir, source=table(spark, sf_dir, "events")
    )
    if how == "inner":
        want = {
            tuple(r) for r in v.join(p, cond).select("view_id", "purchase_id").collect()
        }
    else:
        want = {tuple(r) for r in v.join(p, cond, "leftSemi").select("view_id").collect()}
    assert with_final == want


def test_no_data_batches_conf_is_snapshotted_at_start(spark, tmp_path):
    """The fact that makes run_to_memory's no_data_batches=False toggle
    SAFE to scope by restoring right after .start() (ADVICE r9 + the
    round-10 review): the conf is captured into the query's cloned
    session inside start(), so flipping it afterwards does not affect
    the running query — in either direction.  Probed round 10; pinned
    here so a Spark upgrade that starts reading the conf live goes red
    before any concurrent-query corruption could.

    Probe shape: an append-mode windowed agg whose closed windows are
    emitted ONLY by the finalization batch — its output count tells us
    which flag value the query actually honored."""
    import datetime as dt
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    rows = [
        (i, dt.datetime(2024, 3, 1, 8, 0, 0) + dt.timedelta(minutes=i),
         1, "view", 1.0, "{}")
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = str(tmp_path / "snapcorpus")
    os.makedirs(d)
    st = os.path.join(d, "_s")
    df.coalesce(1).write.parquet(st)
    shutil.copy(
        glob.glob(os.path.join(st, "part-*.parquet"))[0],
        os.path.join(d, "events.parquet"),
    )
    shutil.rmtree(st)

    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"

    def run(flag_at_start: str, flip_to: str) -> int:
        spark.conf.set(conf_key, flag_at_start)
        s = sw.events_stream(spark, d).withWatermark("ts", "1 hour")
        agg = (
            s.groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        name = f"mem_{uuid.uuid4().hex[:10]}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_"))
            .trigger(availableNow=True)
            .start()
        )
        spark.conf.set(conf_key, flip_to)  # flip IMMEDIATELY after start()
        try:
            assert q.awaitTermination(240)
        finally:
            spark.conf.set(conf_key, "true")
        return spark.table(name).count()

    # started disabled, flipped on: the query keeps its start-time
    # snapshot -> no finalization batch -> zero closed windows emitted
    assert run("false", "true") == 0
    # started enabled, flipped off: finalization batch still runs ->
    # the closed windows DO emit
    assert run("true", "false") > 0

def test_b180_full_outer_closure_boundary_semantics(spark, tmp_path):
    """The round-10 probed rules for the FULL outer join, planted
    permanently: (a) view-side null emission is STRICT at the horizon
    (v_ts + 6h == wm stays open — b64's rule holds under full outer),
    (b) purchase-side null emission is STRICT at the watermark itself
    (p_ts == wm stays open, wm − 1 ms closes), (c) the watermark is
    ms-FLOORED min across both streams.  These three facts are what
    let b180 carry an exact oracle; a Spark upgrade moving any of them
    goes red here before the oracle sweep."""
    import datetime as dt
    import glob
    import os
    import shutil

    from etl_wildweb_spark import registry

    M = dt.datetime(2024, 3, 1, 12, 0, 0, 123456)  # sub-ms max-setter
    wm = dt.datetime(2024, 3, 1, 11, 0, 0, 123000)  # ms_floor(M) - 1h
    h6 = dt.timedelta(hours=6)
    ms = dt.timedelta(milliseconds=1)
    rows = [
        (9000, M, 999, "purchase", 1.0, "{}"),
        (9001, M, 998, "view", 1.0, "{}"),
        # purchase-side boundary (users with no views)
        (2001, wm - ms, 21, "purchase", 0.5, "{}"),   # closed -> null view
        (2002, wm, 22, "purchase", 0.5, "{}"),        # AT wm -> open
        (2003, wm + ms, 23, "purchase", 0.5, "{}"),   # open
        (2004, wm + dt.timedelta(microseconds=500), 24, "purchase", 0.5, "{}"),
        (2005, wm - dt.timedelta(seconds=10), 25, "purchase", 0.5, "{}"),
        # view-side boundary (users with no purchases)
        (1001, wm - h6 - ms, 11, "view", 0.5, "{}"),  # closed -> null
        (1002, wm - h6, 12, "view", 0.5, "{}"),       # AT horizon -> open
        (1003, wm - h6 + ms, 13, "view", 0.5, "{}"),  # open
        # matched pair away from boundaries
        (500, dt.datetime(2024, 3, 1, 1, 0), 777, "view", 0.1, "{}"),
        (501, dt.datetime(2024, 3, 1, 2, 0), 777, "purchase", 2.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = str(tmp_path / "b180corpus")
    os.makedirs(d)
    stage = os.path.join(d, "_stage")
    df.coalesce(1).write.parquet(stage)
    shutil.copy(
        glob.glob(os.path.join(stage, "part-*.parquet"))[0],
        os.path.join(d, "events.parquet"),
    )
    shutil.rmtree(stage)

    out = registry.QUERIES["b180_stream_stream_full_outer"](spark, d).collect()
    got = {(r.user_id, r.view_id, r.purchase_id) for r in out}
    assert got == {
        (777, 500, 501),    # matched pair, arrival-driven
        (11, 1001, None),   # view 1 ms inside the strict horizon
        (21, None, 2001),   # purchase 1 ms below the watermark
        (25, None, 2005),   # purchase well below
        # open: 1002 (== horizon), 1003; 2002 (== wm), 2003, 2004;
        # both max-setters (their own closure points are in the future)
    }, got

    # and the oracle agrees on this corpus (same construction DuckDB-side)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = {
        (r[0], r[1], r[2])
        for r in con.execute(
            registry.ORACLES["b180_stream_stream_full_outer"]
        ).fetchall()
    }
    assert got == want

def test_b180_empty_side_freezes_both_closures(spark, tmp_path):
    """b64's empty-side guard, load-bearing twice in b180: with only
    ONE stream populated, Spark's MIN-policy watermark freezes at
    epoch, so NEITHER side's unmatched rows may null-pad — and the
    oracle's CASE guard must agree (DuckDB's least() would otherwise
    ignore the NULL max and close against the populated side alone)."""
    import datetime as dt
    import glob
    import os
    import shutil

    import duckdb

    from etl_wildweb_spark import registry

    def plant(rows, sub):
        df = spark.createDataFrame(
            rows,
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING",
        )
        d = str(tmp_path / sub)
        os.makedirs(d)
        st = os.path.join(d, "_s")
        df.coalesce(1).write.parquet(st)
        shutil.copy(
            glob.glob(os.path.join(st, "part-*.parquet"))[0],
            os.path.join(d, "events.parquet"),
        )
        shutil.rmtree(st)
        return d

    t0 = dt.datetime(2024, 3, 1, 0, 0)
    week = dt.timedelta(days=7)
    for etype, sub in (("view", "viewsonly"), ("purchase", "purchonly")):
        # a week-wide spread: every horizon would be closed IF the
        # frozen watermark were wrongly computed from this side alone
        rows = [
            (i, t0 + week * i, 100 + i, etype, 1.0, "{}") for i in range(4)
        ]
        d = plant(rows, sub)
        out = registry.QUERIES["b180_stream_stream_full_outer"](
            spark, d
        ).collect()
        assert out == [], (etype, out)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS "
            f"SELECT * FROM read_parquet('{d}/events.parquet')"
        )
        want = con.execute(
            registry.ORACLES["b180_stream_stream_full_outer"]
        ).fetchall()
        assert want == [], (etype, want)

def test_b182_right_outer_closure_boundary_semantics(spark, tmp_path):
    """The round-12 probed rules for the RIGHT outer join, planted
    permanently (probe ran BEFORE the oracle was written — the b180
    method): (a) purchase-side null-view emission is STRICT at the
    watermark (p_ts == wm stays open, wm − 1 ms closes) — b180's
    purchase branch, confirmed unchanged under the rightOuter plan;
    (b) unmatched views emit NOTHING; (c) the watermark is the
    ms-FLOORED min across both streams, frozen at epoch when the view
    side is empty even though no view column is ever emitted."""
    import datetime as dt
    import glob
    import os
    import shutil

    import duckdb

    from etl_wildweb_spark import registry

    M = dt.datetime(2024, 3, 1, 12, 0, 0, 123456)  # sub-ms max-setter
    wm = dt.datetime(2024, 3, 1, 11, 0, 0, 123000)  # ms_floor(M) - 1h
    h6 = dt.timedelta(hours=6)
    ms = dt.timedelta(milliseconds=1)
    rows = [
        (9000, M, 999, "purchase", 1.0, "{}"),
        (9001, M, 998, "view", 1.0, "{}"),
        # purchase-side boundary (users with no views)
        (2001, wm - ms, 21, "purchase", 0.5, "{}"),   # closed -> null view
        (2002, wm, 22, "purchase", 0.5, "{}"),        # AT wm -> open
        (2003, wm + ms, 23, "purchase", 0.5, "{}"),   # open
        (2004, wm + dt.timedelta(microseconds=500), 24, "purchase", 0.5, "{}"),
        (2005, wm - dt.timedelta(seconds=10), 25, "purchase", 0.5, "{}"),
        # views with no purchases — must emit NOTHING under right outer
        (1001, wm - h6 - ms, 11, "view", 0.5, "{}"),
        (1002, wm - h6, 12, "view", 0.5, "{}"),
        # matched pair away from boundaries
        (500, dt.datetime(2024, 3, 1, 1, 0), 777, "view", 0.1, "{}"),
        (501, dt.datetime(2024, 3, 1, 2, 0), 777, "purchase", 2.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = str(tmp_path / "b182corpus")
    os.makedirs(d)
    stage = os.path.join(d, "_stage")
    df.coalesce(1).write.parquet(stage)
    shutil.copy(
        glob.glob(os.path.join(stage, "part-*.parquet"))[0],
        os.path.join(d, "events.parquet"),
    )
    shutil.rmtree(stage)

    out = registry.QUERIES["b182_stream_stream_right_outer"](spark, d).collect()
    got = {(r.user_id, r.view_id, r.purchase_id) for r in out}
    assert got == {
        (777, 500, 501),    # matched pair, arrival-driven
        (21, None, 2001),   # purchase 1 ms below the watermark
        (25, None, 2005),   # purchase well below
        # open: 2002 (== wm), 2003, 2004, max-setter 9000;
        # views 1001/1002 emit nothing under right outer
    }, got

    # and the oracle agrees on this corpus (same construction DuckDB-side)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = {
        (r[0], r[1], r[2])
        for r in con.execute(
            registry.ORACLES["b182_stream_stream_right_outer"]
        ).fetchall()
    }
    assert got == want

    # empty-view-side guard: a purchases-only corpus emits NOTHING on
    # either engine (the frozen epoch watermark holds the minimum down)
    rows2 = [
        (i, dt.datetime(2024, 3, 1) + dt.timedelta(days=7 * i),
         100 + i, "purchase", 1.0, "{}")
        for i in range(4)
    ]
    df2 = spark.createDataFrame(
        rows2,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d2 = str(tmp_path / "b182purchonly")
    os.makedirs(d2)
    st2 = os.path.join(d2, "_s")
    df2.coalesce(1).write.parquet(st2)
    shutil.copy(
        glob.glob(os.path.join(st2, "part-*.parquet"))[0],
        os.path.join(d2, "events.parquet"),
    )
    shutil.rmtree(st2)
    assert (
        registry.QUERIES["b182_stream_stream_right_outer"](spark, d2).collect()
        == []
    )
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d2}/events.parquet')"
    )
    assert (
        con2.execute(registry.ORACLES["b182_stream_stream_right_outer"]).fetchall()
        == []
    )


@pytest.mark.parametrize("seed", [7, 23])
def test_stream_join_family_randomized_differential(spark, tmp_path, seed):
    """Seeded randomized differential over the WHOLE stream-stream join
    family (inner/left-outer/semi/full-outer): corpora are drawn to
    maximize closure-boundary coincidences — timestamps on a 1-minute
    grid with {0, ±1ms, ±1µs} jitter, users holding any mix of views
    and purchases, plus a sub-ms max-setter pair — then every query's
    emission set is compared to its DuckDB oracle on that corpus.
    Catches rule interactions the fixed boundary plants cannot (e.g. a
    user whose matched view ALSO sits at the null-closure horizon)."""
    import datetime as dt
    import glob
    import os
    import random
    import shutil

    import duckdb

    from etl_wildweb_spark import registry

    rng = random.Random(seed)
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    jit = [dt.timedelta(0), dt.timedelta(milliseconds=1),
           dt.timedelta(milliseconds=-1), dt.timedelta(microseconds=1),
           dt.timedelta(microseconds=-1)]
    rows = []
    eid = 0
    for _ in range(70):
        eid += 1
        ts = (t0 + dt.timedelta(minutes=rng.randrange(0, 720))
              + rng.choice(jit))
        rows.append((eid, ts, rng.randrange(1, 12),
                     rng.choice(["view", "purchase"]), 1.0, "{}"))
    # sub-ms max-setters on both sides, late enough to close most rows
    M = t0 + dt.timedelta(hours=13, microseconds=123456)
    rows += [(9000, M, 99, "purchase", 1.0, "{}"),
             (9001, M, 98, "view", 1.0, "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = str(tmp_path / f"randjoin{seed}")
    os.makedirs(d)
    st = os.path.join(d, "_s")
    df.coalesce(1).write.parquet(st)
    shutil.copy(
        glob.glob(os.path.join(st, "part-*.parquet"))[0],
        os.path.join(d, "events.parquet"),
    )
    shutil.rmtree(st)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    from collections import Counter

    for name in (
        "b23_stream_stream_join",
        "b64_stream_stream_left_outer",
        "b177_stream_semi_join",
        "b180_stream_stream_full_outer",
        "b182_stream_stream_right_outer",
    ):
        got = Counter(
            tuple(r) for r in registry.QUERIES[name](spark, d).collect()
        )
        want = Counter(tuple(r) for r in
                       con.execute(registry.ORACLES[name]).fetchall())
        assert got == want, (
            name, seed,
            sorted(map(repr, (got - want).elements()))[:5],
            sorted(map(repr, (want - got).elements()))[:5],
        )

def test_stateful_family_randomized_differential(spark, tmp_path):
    """Seeded randomized differential over the round-9 oracle upgrades
    the r10 driver window re-confirms (b23 watermark agg, b24 dedup,
    b58 funnel, b72 sessionize): one jittered boundary-coincidence
    corpus (adds 'click' so the funnel can reach stage 3), every query
    strict-compared to its DuckDB oracle with the driver-twin multiset
    normalization (events-only connection — duckdb_conn wants all ten
    tables present).  The fixed boundary plants pin the closure RULES;
    this pins their composition on an adversarial corpus."""
    import datetime as dt
    import glob
    import os
    import random
    import shutil

    import duckdb

    from etl_wildweb_spark import registry

    from .oracle_utils import rows_multiset

    rng = random.Random(11)
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    jit = [dt.timedelta(0), dt.timedelta(milliseconds=1),
           dt.timedelta(milliseconds=-1), dt.timedelta(microseconds=1),
           dt.timedelta(microseconds=-1)]
    rows = []
    for eid in range(1, 81):
        ts = (t0 + dt.timedelta(minutes=rng.randrange(0, 720))
              + rng.choice(jit))
        rows.append((eid, ts, rng.randrange(1, 12),
                     rng.choice(["view", "click", "purchase"]),
                     rng.choice([0.5, 1.0, 2.25]), "{}"))
    M = t0 + dt.timedelta(hours=13, microseconds=123456)
    rows.append((9001, M, 98, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    )
    d = str(tmp_path / "randstate")
    os.makedirs(d)
    st = os.path.join(d, "_s")
    df.coalesce(1).write.parquet(st)
    shutil.copy(
        glob.glob(os.path.join(st, "part-*.parquet"))[0],
        os.path.join(d, "events.parquet"),
    )
    shutil.rmtree(st)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    for name in (
        "b23_watermark_tumbling",
        "b24_stream_dedup",
        "b58_stream_funnel",
        "b72_stateful_sessionize",
    ):
        sdf = registry.QUERIES[name](spark, d)
        res = con.execute(registry.ORACLES[name])
        ocols = [c[0] for c in res.description]
        orows = res.fetchall()
        assert sorted(sdf.columns) == sorted(ocols), name
        assert rows_multiset(sdf.columns, sdf.collect()) == rows_multiset(
            ocols, orows
        ), name


def test_stream_join_state_partition_invariance(spark, sf_dir):
    """The round-12 state-shuffle right-sizing
    (joins.STREAM_STATE_PARTITIONS, set→start→restore through
    run_to_memory) must be purely a cost knob: the registered b180
    (default width) and the same plan forced to 32 state partitions
    emit the identical multiset, and the session's shuffle-partition
    conf is restored after each run."""
    from collections import Counter

    from etl_wildweb_spark import registry
    from etl_wildweb_spark.streaming.joins import (
        _watermarked_views_purchases,
    )
    from etl_wildweb_spark.streaming.windows import run_to_memory

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    got_default = Counter(
        tuple(r)
        for r in registry.QUERIES["b180_stream_stream_full_outer"](
            spark, sf_dir
        ).collect()
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev

    views, purchases, cond = _watermarked_views_purchases(spark, sf_dir)
    joined = views.join(purchases, cond, "fullOuter").select(
        F.coalesce("v_user", "p_user").alias("user_id"),
        "view_id",
        "purchase_id",
    )
    got_wide = Counter(
        tuple(r)
        for r in run_to_memory(
            joined, mode="append", state_partitions=32
        ).collect()
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert got_default == got_wide
