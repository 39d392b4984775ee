"""Structural invariants for the mining/analytics session operators —
mathematical properties that must hold on ANY corpus, complementing the
DuckDB differential (which pins values on THIS corpus).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_wildweb_spark import registry
from etl_wildweb_spark.io import table

registry.load_all()


def test_entropy_bounds(spark, sf_dir):
    """Simpson concentration bounds: uniform over n_langs is the floor
    (Σc² ≥ N²/n_langs), a single language is the ceiling (Σc² ≤ N²);
    the ppm column is the exact floor of the ratio."""
    rows = registry.QUERIES["b101_group_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_langs * r.sum_c_sq >= r.n_docs * r.n_docs
        assert r.sum_c_sq <= r.n_docs * r.n_docs
        assert r.concentration_ppm == (
            1_000_000 * r.sum_c_sq // (r.n_docs * r.n_docs)
        )
        # Rényi-2 entropy (display-only downstream) stays in
        # [0, ln n_langs] up to the ppm floor's resolution
        h2 = -math.log(max(r.concentration_ppm, 1) / 1e6)
        assert -1e-6 <= h2 <= math.log(max(r.n_langs, 1)) + 1e-3


def test_markov_rows_normalize(spark, sf_dir):
    """Each source row's ppm probabilities floor-sum to ≤ 1e6 and are
    within |dst| of it (floor division loses < 1 ppm per cell)."""
    rows = registry.QUERIES["b102_markov_transitions"](spark, sf_dir).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.src, []).append(r.p_ppm)
    assert by_src
    for src, ppms in by_src.items():
        assert 1_000_000 - len(ppms) <= sum(ppms) <= 1_000_000, src


def test_basket_pairs_canonical_and_supported(spark, sf_dir):
    rows = registry.QUERIES["b103_basket_pairs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_orders >= 2


def test_sliding_distinct_dominates_daily(spark, sf_dir):
    """The trailing-7-day distinct for a window day is ≥ the single-day
    distinct of every day inside that window."""
    win = {
        r.win_day: r.n_users_7d
        for r in registry.QUERIES["b107_sliding_distinct"](spark, sf_dir).collect()
    }
    daily = {
        r.d: r.n
        for r in table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert win and daily
    for d, n in daily.items():
        assert win[d] >= n  # window ending on d contains day d


def test_clamped_balance_nonnegative(spark, sf_dir):
    rows = registry.QUERIES["b119_clamped_balance"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.final_bal_micro >= 0
        assert 0 <= r.n_clamps <= r.n_tx


def test_pareto_prefix_is_minimal_cover(spark, sf_dir):
    """The b113 prefix covers ≥ 80% of revenue, and dropping its last
    (lowest-revenue) member drops coverage below 80%."""
    rows = registry.QUERIES["b113_pareto_coverage"](spark, sf_dir).collect()
    assert rows
    li = table(spark, sf_dir, "lineitem")
    total = (
        li.select(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("t")
        ).collect()[0].t
    )
    covered = sum(r.cents for r in rows)
    last = min(rows, key=lambda r: (r.cents, -r.l_partkey))
    assert 5 * covered >= 4 * total
    assert 5 * (covered - last.cents) < 4 * total


def test_b113_empty_corpus_keeps_schema(spark, sf_dir, tmp_path):
    """Round 11 moved b113's bucket bounds into the plan as a
    broadcast agg(min,max) scalar subquery — on an EMPTY lineitem the
    bounds row is (null, null) and the old Python-side `if hi is None`
    guard is gone, so pin the replacement: null bounds flow through
    greatest()/div without error and the result is empty with the
    contracted schema."""
    li = table(spark, sf_dir, "lineitem")
    empty = str(tmp_path / "empty_sf")
    li.limit(0).write.parquet(f"{empty}/lineitem.parquet")
    out = registry.QUERIES["b113_pareto_coverage"](spark, empty)
    assert [f.name for f in out.schema.fields] == ["l_partkey", "cents", "rk"]
    assert out.count() == 0


def test_slice_overlap_symmetric_bounds(spark, sf_dir):
    rows = registry.QUERIES["b128_slice_overlap"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lang_a < r.lang_b
        assert 0 <= r.n_inter <= r.n_union
        assert 0 <= r.jaccard_ppm <= 1_000_000


def test_cms_estimates_bounded_overestimates(spark, sf_dir):
    """b143: CMS point estimates are NEVER below the true count (min
    over rows of non-negative-summed counters) and never exceed
    true + N/width per the classic bound (here with the generous
    constant 2 to absorb the tiny grid)."""
    from etl_wildweb_spark import registry
    from etl_wildweb_spark.io import table
    from etl_wildweb_spark.operators.mining import CMS_WIDTH
    import pyspark.sql.functions as F

    registry.load_all()
    est = {
        r["token"]: r["est_count"]
        for r in registry.QUERIES["b143_cms_rollup"](spark, sf_dir).collect()
    }
    toks = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    exact = {
        r["token"]: r["n"]
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_stream = sum(exact.values())
    assert set(est) == set(exact)
    for t, e in est.items():
        assert e >= exact[t], (t, e, exact[t])
        assert e <= exact[t] + 2 * n_stream / CMS_WIDTH, (t, e, exact[t])


def test_freq_rollup_brackets_exact_weekly_counts(spark, sf_dir):
    """The mergeable frequent-items sketch's [lower, upper] must
    bracket the EXACT weekly count for every emitted (week, user):
    lower ≤ true ≤ upper, with lower ≥ retained-day mass > 0."""
    rows = registry.QUERIES["b153_freq_items_rollup"](spark, sf_dir).collect()
    assert rows
    exact = {
        (r.week, r.user_id): r.c
        for r in table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("week", "ts").alias("week"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in rows:
        true = exact[(r.week, r.user_id)]
        assert r.lower_cnt <= true <= r.upper_cnt, (
            r.week, r.user_id, r.lower_cnt, true, r.upper_cnt)
        assert 0 < r.lower_cnt and r.n_days_retained >= 1


def test_markov_attribution_shares_and_bounds(spark, sf_dir):
    """Removal-effect attribution invariants: every effect lies in
    [0, 1e6] ppm, shares are a normalization (sum to 1e6 within
    per-channel rounding slack), converting-path counts equal the
    exact last-touch recount, and the op is deterministic."""
    q = registry.QUERIES["b165_markov_attribution"]
    rows = sorted(tuple(r) for r in q(spark, sf_dir).collect())
    assert rows == sorted(tuple(r) for r in q(spark, sf_dir).collect())
    assert rows
    share_sum = sum(r[3] for r in rows)
    assert abs(share_sum - 1_000_000) <= len(rows), rows
    for _, n_paths, effect, share in rows:
        assert 0 <= effect <= 1_000_000
        assert 0 <= share <= 1_000_000
        assert n_paths >= 0
    # exact last-touch recount: the channel immediately before each
    # user's first purchase
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    conv = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "conv_ts"
        )
    )
    pre = (
        ev.join(conv, "user_id")
        .filter(F.col("conv_ts").isNotNull() & (F.col("ts") < F.col("conv_ts")))
        .filter(F.col("event_type") != "purchase")
    )
    lastw = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    last = (
        pre.withColumn("rn", F.row_number().over(lastw))
        .filter(F.col("rn") == 1)
        .groupBy("event_type")
        .count()
    )
    want = {r.event_type: r["count"] for r in last.collect()}
    got = {r[0]: r[1] for r in rows}
    for ch, n_paths in got.items():
        assert n_paths == want.get(ch, 0), (ch, n_paths, want)


def test_b113_bucket_assignment_is_order_monotone():
    """Pure arithmetic pin of b113's two-phase correctness argument:
    the bucket id ((hi - cents) / width, float-divided then int-cast,
    exactly as the plan computes it) must be (a) non-strictly monotone
    DECREASING in cents — IEEE division by a positive constant
    preserves order — (b) equal for equal cents, and (c) within
    [0, 63], for arbitrary bigint-ish revenue distributions including
    adversarial near-boundary values.  If any of these broke, bucket
    ranges would stop being ordered and base+local reconstruction
    would silently misrank."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=9_007_199_254_740_992),
            min_size=1,
            max_size=200,
        )
    )
    def check(cents):
        lo, hi = min(cents), max(cents)
        n_buckets = 64
        width = max(1, (hi - lo + n_buckets) // n_buckets)
        bucket = {c: int((hi - c) / width) for c in cents}
        for b in bucket.values():
            assert 0 <= b < n_buckets
        ordered = sorted(cents, reverse=True)
        for a, b in zip(ordered, ordered[1:]):
            assert bucket[a] <= bucket[b], (a, b, bucket[a], bucket[b])

    check()
