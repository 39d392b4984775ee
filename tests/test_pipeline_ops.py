"""Invariant tests for the training-pipeline operators (sampling,
packing, clustering) — properties the oracle hash-match can't express:
budget bounds, determinism across independent plans, subset discipline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_wildweb_spark.operators.packing import BUDGET, b35_sequence_pack
from etl_wildweb_spark.operators.sampling import (
    b34_hash_sample,
    b34_stratified_sample,
    b34_weighted_mix,
)
from etl_wildweb_spark.io import table


def test_pack_bins_respect_budget(spark, sf_dir):
    packed = b35_sequence_pack(spark, sf_dir)
    per_bin = packed.groupBy("source", "bin").agg(
        F.sum("n_tokens").alias("tot"), F.count(F.lit(1)).alias("n_docs")
    )
    # a bin may exceed the budget ONLY as a single oversized doc
    bad = per_bin.filter((F.col("tot") > BUDGET) & (F.col("n_docs") > 1)).count()
    assert bad == 0


def test_pack_bins_contiguous_and_complete(spark, sf_dir):
    packed = b35_sequence_pack(spark, sf_dir)
    # every doc packed exactly once
    n_docs = table(spark, sf_dir, "documents").count()
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs
    # bin ids per stream are 0..max with no gaps
    per_stream = packed.groupBy("source").agg(
        F.countDistinct("bin").alias("nbins"), F.max("bin").alias("maxbin")
    )
    assert per_stream.filter(F.col("nbins") != F.col("maxbin") + 1).count() == 0


def test_hash_sample_deterministic_and_subset(spark, sf_dir):
    a = set(r.doc_id for r in b34_hash_sample(spark, sf_dir).collect())
    b = set(r.doc_id for r in b34_hash_sample(spark, sf_dir).collect())
    assert a == b  # no seed, no partitioning dependence
    all_ids = set(
        r.doc_id for r in table(spark, sf_dir, "documents").select("doc_id").collect()
    )
    assert a <= all_ids
    # rate sanity: 2/16 nominal, generous tolerance at small SF
    assert 0.02 < len(a) / len(all_ids) < 0.30


def test_stratified_sample_quota(spark, sf_dir):
    s = b34_stratified_sample(spark, sf_dir)
    per_lang = s.groupBy("lang").count().collect()
    corpus = dict(
        (r.lang, r["count"])
        for r in table(spark, sf_dir, "documents").groupBy("lang").count().collect()
    )
    for r in per_lang:
        assert r["count"] == min(50, corpus[r.lang])


def test_weighted_mix_rates_ordered(spark, sf_dir):
    m = b34_weighted_mix(spark, sf_dir)
    kept = dict((r.source, r["count"]) for r in m.groupBy("source").count().collect())
    corpus = dict(
        (r.source, r["count"])
        for r in table(spark, sf_dir, "documents").groupBy("source").count().collect()
    )
    rates = {s: kept.get(s, 0) / corpus[s] for s in corpus}
    # wiki keeps everything; web keeps roughly half; others roughly 1/4
    if "wiki" in rates:
        assert rates["wiki"] == 1.0
    if "web" in rates:
        assert 0.3 < rates["web"] < 0.7
