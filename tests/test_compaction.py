"""io.compact_parquet: small-files directory → size-targeted rewrite."""

from __future__ import annotations

from pathlib import Path

from etl_wildweb_spark.io import compact_parquet, table


def test_compaction_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    src = str(tmp_path / "small_files")
    dst = str(tmp_path / "compacted")
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.repartition(64).write.parquet(src)  # simulate micro-batch litter
    n_src = len(list(Path(src).glob("*.parquet")))
    assert n_src >= 32

    out = compact_parquet(spark, src, dst, target_mb=512)
    n_dst = len(list(Path(dst).glob("*.parquet")))
    assert n_dst < n_src
    assert n_dst == 1  # tiny corpus → single target-size file
    # content identical (multiset of rows)
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b


def test_b100_compaction_conserves_rows(spark, sf_dir):
    from etl_wildweb_spark.io import table
    from etl_wildweb_spark.sources.files import b100_compaction

    r = b100_compaction(spark, sf_dir).first()
    assert r.n_rows == table(spark, sf_dir, "events").count()
    assert r.n_files_after < r.n_files_before
    assert r.n_files_after >= 1
