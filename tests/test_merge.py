"""Invariant tests for the MERGE/upsert operator (operators/merge.py)
and the round-3 LLM-pipeline additions whose semantics go beyond the
DuckDB differential check (which tests/test_oracle.py already runs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_wildweb_spark import registry
from etl_wildweb_spark.io import table
from etl_wildweb_spark.operators.merge import (
    _INS_MOD,
    _INS_OFFSET,
    _UPD_MOD,
    b38_merge_upsert,
    merge_upsert,
)

registry.load_all()


def test_merge_cardinality_and_values(spark, sf_dir):
    o = table(spark, sf_dir, "orders")
    n_snap = o.count()
    n_ins = o.filter(F.col("o_orderkey") % _INS_MOD == 0).count()
    merged = b38_merge_upsert(spark, sf_dir)

    # |merged| = |snapshot| + |inserts|; keys stay unique
    assert merged.count() == n_snap + n_ins
    assert merged.select("o_orderkey").distinct().count() == n_snap + n_ins

    # every updated key carries the changed values (changes-win)
    upd = merged.filter(
        (F.col("o_orderkey") % _UPD_MOD == 0)
        & (F.col("o_orderkey") < _INS_OFFSET)
    )
    assert upd.filter(F.col("o_orderstatus") != "X").count() == 0

    # inserts landed above the key space with the insert marker
    ins = merged.filter(F.col("o_orderkey") >= _INS_OFFSET)
    assert ins.count() == n_ins
    assert ins.filter(F.col("o_orderpriority") != "NEW").count() == 0

    # untouched rows are bit-identical to the snapshot
    untouched = merged.filter(
        (F.col("o_orderkey") % _UPD_MOD != 0)
        & (F.col("o_orderkey") < _INS_OFFSET)
    )
    orig = o.filter(F.col("o_orderkey") % _UPD_MOD != 0)
    assert untouched.exceptAll(orig).count() == 0


def test_merge_generic_changes_win(spark):
    snap = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    chg = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    got = {r["k"]: r["v"] for r in merge_upsert(snap, chg, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "C"}


def test_incremental_dedup_admits_only_novel(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    admitted = registry.QUERIES["b28_incremental_dedup"](spark, sf_dir)
    # admitted ⊆ new batch
    assert admitted.filter(F.col("source") != "src0").count() == 0
    # no admitted digest exists in the prior corpus
    corpus = d.filter(F.col("source") != "src0").select(
        F.md5("text").alias("digest")
    )
    assert admitted.join(corpus, "digest", "left_semi").count() == 0


def test_contamination_flags_benchmark_sharers(spark, sf_dir):
    out = registry.QUERIES["b37_contamination"](spark, sf_dir)
    rows = out.collect()
    # benchmark docs are excluded from the report
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    # contaminated ⇔ n_overlap > 0, and overlap never exceeds gram count
    for r in rows:
        assert r["contaminated"] == (r["n_overlap"] > 0)
        assert 0 <= r["n_overlap"] <= r["n_grams"]


def test_repetition_bounds_and_planted_repeat(spark, sf_dir):
    out = registry.QUERIES["b31_repetition_filters"](spark, sf_dir)
    for r in out.collect():
        for c in ("dup_word_frac", "top_2gram_char_frac", "dup_5gram_frac"):
            assert 0.0 <= r[c] <= 1.0, (r["doc_id"], c, r[c])

    # a degenerate doc made of one repeated bigram maxes the signals
    one = spark.createDataFrame(
        [(0, "ab cd " * 50 + "ab cd")], "doc_id long, text string"
    )
    one.createOrReplaceTempView("documents_probe")
    from etl_wildweb_spark.operators.text import _top_run, _word_grams

    toks = F.split("text", " ")
    n = F.size(toks)
    probe = one.select(
        _top_run(F.array_sort(_word_grams(toks, n, 2)))["best"].alias("best"),
        n.alias("n"),
    ).collect()[0]
    # "ab cd" occurs 51 times as a 2-gram
    assert probe["best"] == 51


def test_pii_scan_counts_and_redaction(spark, sf_dir):
    out = registry.QUERIES["b31_pii_scan"](spark, sf_dir)
    rows = out.collect()
    by_id = {r["doc_id"]: r for r in rows}
    for doc_id, r in by_id.items():
        assert r["n_email"] == (1 if doc_id % 7 == 0 else 0)
        assert r["n_ip"] == (1 if doc_id % 5 == 0 else 0)
        assert r["n_phone"] == (1 if doc_id % 3 == 0 else 0)


def test_centroid_assign_partitions_corpus(spark, sf_dir):
    out = registry.QUERIES["b40_centroid_assign"](spark, sf_dir).collect()
    total = sum(r["n_members"] for r in out)
    n_vecs = table(spark, sf_dir, "embeddings").count()
    assert total == n_vecs  # every vector assigned exactly once
    # each seed belongs to its own cluster (cos(v, v) = 1 is maximal)
    seeds = {r["cluster_id"] for r in out}
    assert seeds <= set(range(8)) and len(out) == len(seeds)


def test_stream_scd1_snapshot_matches_batch(spark, sf_dir, tmp_path):
    """Multi-micro-batch streaming upsert converges to the same
    latest-row-per-user snapshot as the one-shot batch aggregation —
    regardless of which file lands in which micro-batch."""
    from etl_wildweb_spark.io import table
    from etl_wildweb_spark.operators.merge import (
        read_scd1_snapshot,
        stream_scd1_snapshot,
    )

    e = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    e.repartition(4).write.parquet(src)  # 4 files → 4 micro-batches

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_scd1_snapshot(
        stream, "user_id", ["ts", "event_id"], str(tmp_path / "snap")
    )
    q.awaitTermination(180)

    got = {
        r.user_id: (r.ts, r.event_id, r.event_type)
        for r in read_scd1_snapshot(spark, str(tmp_path / "snap")).collect()
    }
    want = {
        r.user_id: (r.ts, r.event_id, r.event_type)
        for r in e.groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("ts", "event_id", "event_type"),
                F.struct("ts", "event_id"),
            ).alias("r")
        )
        .select("user_id", "r.ts", "r.event_id", "r.event_type")
        .collect()
    }
    assert got == want


def test_stream_incremental_agg_equals_batch(spark, sf_dir, tmp_path):
    """Merging per-micro-batch partial aggregates yields the same
    (count, DECIMAL sum) per key as the one-shot batch aggregate —
    bit-identical, regardless of how rows split across batches."""
    from etl_wildweb_spark.operators.merge import (
        read_scd1_snapshot,
        stream_incremental_agg,
    )

    e = table(spark, sf_dir, "events").select("event_type", "value")
    src = str(tmp_path / "src")
    e.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_incremental_agg(
        stream, ["event_type"], "value", str(tmp_path / "snap")
    )
    q.awaitTermination(180)
    got = {
        r.event_type: (r.n, r.total)
        for r in read_scd1_snapshot(spark, str(tmp_path / "snap")).collect()
    }
    want = {
        r.event_type: (r.n, r.total)
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
        )
        .collect()
    }
    assert got == want


def test_merge_full_classes(spark, sf_dir):
    """b75: deletes removed, updates applied, inserts present; exact
    per-class cardinality arithmetic."""
    from etl_wildweb_spark.operators.merge import (
        _DEL_MOD,
        _INS_MOD,
        _INS_OFFSET,
        _UPD_MOD,
        b75_merge_full,
    )

    o = table(spark, sf_dir, "orders")
    merged = b75_merge_full(spark, sf_dir)
    n = o.count()
    n_del = o.filter(F.col("o_orderkey") % _DEL_MOD == 0).count()
    n_ins = o.filter(F.col("o_orderkey") % _INS_MOD == 0).count()
    assert merged.count() == n - n_del + n_ins
    # no deleted key survives
    assert (
        merged.filter(
            (F.col("o_orderkey") % _DEL_MOD == 0)
            & (F.col("o_orderkey") < _INS_OFFSET)
        ).count()
        == 0
    )
    # every surviving %10 key carries the update
    upd = merged.filter(
        (F.col("o_orderkey") % _UPD_MOD == 0)
        & (F.col("o_orderkey") % _DEL_MOD != 0)
        & (F.col("o_orderkey") < _INS_OFFSET)
    )
    assert upd.filter(F.col("o_orderstatus") != "X").count() == 0


def test_snapshot_diff_roundtrips_change_batch(spark, sf_dir):
    """b76: diff(v1, merge(v1, changes)) recovers the change batch
    exactly — class counts match the derivation mods."""
    from etl_wildweb_spark.operators.merge import (
        _DEL_MOD,
        _INS_MOD,
        _UPD_MOD,
        b76_snapshot_diff,
    )

    o = table(spark, sf_dir, "orders")
    d = b76_snapshot_diff(spark, sf_dir)
    by = {r.change_type: r.n for r in d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by["removed"] == o.filter(F.col("o_orderkey") % _DEL_MOD == 0).count()
    assert by["added"] == o.filter(F.col("o_orderkey") % _INS_MOD == 0).count()
    assert by["changed"] == o.filter(
        (F.col("o_orderkey") % _UPD_MOD == 0) & (F.col("o_orderkey") % _DEL_MOD != 0)
    ).count()


def test_asof_snapshot_one_row_per_active_user(spark, sf_dir):
    """b98: AS OF returns exactly one interval per user active before
    T, none for users whose history starts after T."""
    from etl_wildweb_spark.operators.merge import _ASOF_T, b98_asof_snapshot

    snap = b98_asof_snapshot(spark, sf_dir)
    assert snap.count() == snap.select("user_id").distinct().count()
    active = (
        table(spark, sf_dir, "events")
        .filter(F.col("ts") <= F.lit(_ASOF_T).cast("timestamp"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert snap.count() == active
