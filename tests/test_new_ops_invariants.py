"""Structural invariants for this round's operators — properties the
oracle differential can't express (reassembly, monotonicity,
partition-ness, grid contiguity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_wildweb_spark import registry
from etl_wildweb_spark.io import table
from etl_wildweb_spark.operators.corpus import CHUNK_SIZE, CHUNK_STRIDE

registry.load_all()


def test_chunks_reassemble_to_documents(spark, sf_dir):
    """Dropping each chunk's overlap tail (keep first CHUNK_STRIDE
    chars, all of the last chunk) and concatenating in chunk_id order
    reconstructs every document exactly."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    chunks = registry.QUERIES["b39_doc_chunk"](spark, sf_dir)
    w_max = chunks.groupBy("doc_id").agg(F.max("chunk_id").alias("last_id"))
    rebuilt = (
        chunks.join(w_max, "doc_id")
        .withColumn(
            "piece",
            F.when(
                F.col("chunk_id") < F.col("last_id"),
                F.col("chunk").substr(1, CHUNK_STRIDE),
            ).otherwise(F.col("chunk")),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_id", "piece")))
                .getField("piece")
            ).alias("rebuilt")
        )
    )
    diff = (
        d.join(rebuilt, "doc_id")
        .filter(F.col("text") != F.col("rebuilt"))
        .count()
    )
    assert diff == 0
    assert CHUNK_STRIDE <= CHUNK_SIZE  # overlap ≥ 0 by config


def test_funnel_stage_counts_monotone(spark, sf_dir):
    rows = {r.stage: r.n_users for r in
            registry.QUERIES["b47_funnel"](spark, sf_dir).collect()}
    assert rows[1] >= rows[2] >= rows[3] >= 0


def test_split_is_partition(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    out = registry.QUERIES["b53_train_val_test"](spark, sf_dir)
    total = out.agg(F.sum("n_docs")).collect()[0][0]
    assert total == d.count()  # exhaustive; disjoint by construction
    splits = {r.split for r in out.collect()}
    assert splits == {"train", "val", "test"}


def test_resample_grid_contiguous_and_count_preserving(spark, sf_dir):
    out = registry.QUERIES["b51_resample_ffill"](spark, sf_dir)
    e = table(spark, sf_dir, "events")
    # per-user grid row count == span days; event counts preserved
    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"),
        F.sum("n_events").alias("n_events"),
    )
    assert per_user.filter(F.col("n_rows") != F.col("span")).count() == 0
    want = {r.user_id: r.n for r in
            e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r.user_id: r.n_events for r in per_user.collect()}
    assert got == want


def test_grouped_median_matches_bruteforce(spark, sf_dir):
    """Brute-force check: per lang, the reported median equals the
    sorted value at index ceil(n/2)-1."""
    d = table(spark, sf_dir, "documents")
    got = {r.lang: (r.median_chars, r.n_docs) for r in
           registry.QUERIES["b50_grouped_median"](spark, sf_dir).collect()}
    rows = d.select("lang", "n_chars").collect()
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.n_chars)
    for lang, vals in by_lang.items():
        vals.sort()
        want = vals[(len(vals) + 1) // 2 - 1]
        assert got[lang] == (want, len(vals)), lang


def test_fake_resize_exact_and_bounded(spark, sf_dir):
    """The resize stub's Spark-side output matches a pure-Python replay
    byte-for-byte and respects the bounded-output contract."""
    from etl_wildweb_spark.operators.multimodal import (
        RESIZE_TARGET,
        b32_fake_resize,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    want = {}
    for r in d:
        b = r.text.encode("utf-8")
        step = max(1, len(b) // RESIZE_TARGET)
        rz = b[::step][:RESIZE_TARGET] if len(b) else b"\x00"
        want[r.doc_id] = (len(rz), sum(rz), rz[0], rz[-1])
    out = b32_fake_resize(spark, sf_dir).collect()
    got = {r.doc_id: (r.out_len, r.out_sum, r.out_first, r.out_last) for r in out}
    assert got == want
    assert all(v[0] <= RESIZE_TARGET for v in got.values())


def test_hll_rollup_within_tolerance_of_exact(spark, sf_dir):
    """Week-level estimates unioned FROM DAY SKETCHES stay within 5%
    of the exact weekly distinct counts — the mergeability guarantee."""
    got = {
        (r.event_type, r.week): r.approx_users
        for r in registry.QUERIES["b60_hll_mergeable_rollup"](
            spark, sf_dir
        ).collect()
    }
    e = table(spark, sf_dir, "events")
    exact = {
        (r.event_type, r.week): r.n
        for r in e.withColumn("week", F.date_trunc("week", F.col("ts")))
        .groupBy("event_type", "week")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])


def test_kll_rollup_rank_error_within_bound(spark, sf_dir):
    """b140: week-level quantile bands merged FROM DAY SKETCH BYTES
    honor KLL's rank-error guarantee — for each (event_type, week) and
    each band q∈{.5,.95,.99}, the EXACT rank of the reported value in
    the true weekly distribution is within ±4% of q (default k=200
    bounds rank error at ~1.65%; 4% leaves merge headroom).  KLL bounds
    RANK error, not value error, so this — not |value−exact_value| —
    is the correct ±ε pin."""
    got = {
        (r.event_type, r.week): (r.n, r.p50, r.p95, r.p99)
        for r in registry.QUERIES["b140_kll_quantile_rollup"](
            spark, sf_dir
        ).collect()
    }
    e = table(spark, sf_dir, "events")
    vals: dict = {}
    for r in (
        e.withColumn("week", F.date_trunc("week", F.col("ts")))
        .select("event_type", "week", "value")
        .collect()
    ):
        vals.setdefault((r.event_type, r.week), []).append(r.value)
    assert set(got) == set(vals)
    for k, (n, *bands) in got.items():
        xs = sorted(vals[k])
        assert n == len(xs), k
        for q, v in zip((0.5, 0.95, 0.99), bands):
            # exact rank of the reported value: fraction of weekly
            # values <= v (midpoint of the <=v run, the rank KLL targets)
            lo = sum(1 for x in xs if x < v)
            hi = sum(1 for x in xs if x <= v)
            rank = (lo + hi) / 2 / len(xs)
            assert abs(rank - q) <= 0.04, (k, q, v, rank)


def test_theta_retention_within_tolerance_of_exact(spark, sf_dir):
    """b141: every set-algebra estimate (wau / retained / churned /
    new_users over consecutive weeks) stays within 5% (or ±2) of the
    exact distinct-set arithmetic — intersections and differences
    included, the operations HLL can't express at all."""
    import datetime

    rows = registry.QUERIES["b141_theta_retention_sketch"](
        spark, sf_dir
    ).collect()
    assert rows
    e = table(spark, sf_dir, "events")
    wk: dict = {}
    for r in (
        e.withColumn("week", F.date_trunc("week", F.col("ts")))
        .select("event_type", "week", "user_id")
        .collect()
    ):
        wk.setdefault((r.event_type, r.week), set()).add(r.user_id)
    for r in rows:
        a = wk[(r.event_type, r.week)]
        b = wk[(r.event_type, r.week + datetime.timedelta(days=7))]
        for est, exact in (
            (r.wau, len(a)),
            (r.retained, len(a & b)),
            (r.churned, len(a - b)),
            (r.new_users, len(b - a)),
        ):
            assert abs(est - exact) <= max(2, 0.05 * exact), (r, exact)


def test_clamped_balance_identity_vs_sequential_fold(spark, sf_dir):
    """b119's prefix-min window identity must equal the literal
    recurrence bal_i = max(0, bal_{i-1} + delta_i) replayed in Python
    per user — the proof the de-sequentialization is exact."""
    from etl_wildweb_spark import registry
    from etl_wildweb_spark.io import table
    import pyspark.sql.functions as F

    registry.load_all()
    got = {
        r.user_id: (r.n_tx, r.n_clamps, r.final_bal_micro)
        for r in registry.QUERIES["b119_clamped_balance"](spark, sf_dir).collect()
    }

    e = table(spark, sf_dir, "events")
    rows = (
        e.filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 1_000_000).cast("bigint").alias("v"),
            (F.col("event_type") == "purchase").alias("credit"),
        )
        .collect()
    )
    per_user: dict = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    want = {}
    for uid, rs in per_user.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        bal, clamps = 0, 0
        for r in rs:
            delta = r.v if r.credit else -r.v
            if bal + delta < 0:
                clamps += 1
                bal = 0
            else:
                bal = bal + delta
        want[uid] = (len(rs), clamps, bal)
    assert got == want


def test_hierarchy_closure_sparse_id_domain(spark, tmp_path):
    """b129 on a SPARSE id domain — every observed user's parent chain
    passes through ids with no events (ADVICE r3: the old inner-join
    doubling silently dropped such users).  Expected depths come from a
    Python replay of parent(u) = (u-1) div 3."""
    from etl_wildweb_spark.registry import QUERIES, load_all

    load_all()
    # 40 → 13 → 4 → 1 → 0 (depth 4); 364 → 121 → 40 → ... (depth 6);
    # 1093 → 364 → ... (depth 7).  None of the intermediates observed.
    observed = [40, 364, 1093, 2]
    spark.createDataFrame(
        [(u,) for u in observed], "user_id long"
    ).write.parquet(str(tmp_path / "events.parquet"))

    def depth(u: int) -> int:
        d = 0
        while u > 0:
            u = (u - 1) // 3
            d += 1
        return d

    got = {
        r.user_id: r.depth
        for r in QUERIES["b129_hierarchy_closure"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {u: depth(u) for u in observed}


def test_hierarchy_closure_ladder_boundary_lattice(spark, tmp_path):
    """r13: b129's depth now evaluates as an integer CASE threshold
    ladder (max id at depth d is (3^(d+1)-3)/2).  Plant every rung's
    == boundary and its +-1 neighbors through depth 12, plus 0 and a
    negative id, against the pure-Python parent-chain walk -- an
    off-by-one in the ladder construction fails here first."""
    from etl_wildweb_spark.registry import QUERIES, load_all

    load_all()
    ids = {0, -7}
    for d in range(1, 13):
        m = (3 ** (d + 1) - 3) // 2
        ids.update((m - 1, m, m + 1))
    ids = sorted(ids)
    spark.createDataFrame(
        [(u,) for u in ids], "user_id long"
    ).write.parquet(str(tmp_path / "events.parquet"))

    def depth(u: int) -> int:
        d = 0
        while u > 0:
            u = (u - 1) // 3
            d += 1
        return d

    got = {
        r.user_id: r.depth
        for r in QUERIES["b129_hierarchy_closure"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {u: depth(u) for u in ids}


def test_dag_path_count_memo_matches_reference(spark, tmp_path):
    """r13: b131's path counts now come from a per-row memoized walk
    (the edges are formulas, not data).  Pin dense, sparse and
    boundary ids -- including 0 (one empty path), 1 and 2 (parents
    collapse to the deduped {0}), and a negative id (emits NO row,
    matching the recursive oracle whose walk never reaches 0) --
    against an independent Python recursion."""
    from functools import lru_cache

    from etl_wildweb_spark.registry import QUERIES, load_all

    load_all()
    ids = [0, 1, 2, 3, 7, 8, 40, 364, 1093, 4095, 4096, 65536, -5]
    spark.createDataFrame(
        [(u,) for u in ids], "user_id long"
    ).write.parquet(str(tmp_path / "events.parquet"))

    @lru_cache(maxsize=None)
    def pc(u: int) -> int:
        if u == 0:
            return 1
        return sum(pc(p) for p in {u // 2, (u - 1) // 3})

    got = {
        r.user_id: r.n_paths
        for r in QUERIES["b131_dag_path_count"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {u: pc(u) for u in ids if u >= 0}
