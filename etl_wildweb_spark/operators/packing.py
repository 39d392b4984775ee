"""Sequence packing — batching documents into fixed token budgets.

Training pipelines pack variable-length documents into fixed-size
context windows (e.g. 2048 tokens) to avoid padding waste.  Packing is
inherently sequential WITHIN a stream — bin assignment depends on the
running fill — but embarrassingly parallel ACROSS streams, which is
exactly Spark's ``applyInPandas`` contract: partition by stream key
(here ``source``; at 100 TB, (source, shard) with ~10⁵ shards), order
within the group, run the greedy fold in Arrow-batched pandas.

The greedy rule: walk docs in (deterministic) doc_id order, keep a
running fill, start a new bin when the next doc would overflow the
budget.  A doc larger than the budget occupies a bin alone (real
pipelines then truncate or split it — out of scope here).  The DuckDB
oracle replays the identical fold as a recursive CTE, so this
sequential-looking operator is still exactly hash-checked.

The reference (task.ts) has none of this; north-star scope
(BASELINE.md "training-data pipeline ops").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query

BUDGET = 512  # tokens per packed sequence

# ~4 chars/token: the standard fast estimate when packing by byte
# length; swap in b31_bpe_token_count's tokenizer for exact counts.
TOKENS = "CAST(ceil(n_chars / 4.0) AS INT)"

_PACK_SCHEMA = "source string, doc_id long, n_tokens int, bin long"


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    bins, fill, b = [], 0, 0
    for t in pdf["n_tokens"]:
        if fill and fill + t > BUDGET:
            b += 1
            fill = 0
        fill += t
        bins.append(b)
    pdf["bin"] = pd.Series(bins, dtype="int64")
    return pdf[["source", "doc_id", "n_tokens", "bin"]]


@query(
    "b35_sequence_pack",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT source, doc_id, {TOKENS} AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents),
    pack(source, rn, doc_id, n_tokens, bin, fill) AS (
      SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.source, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN p.fill > 0 AND p.fill + d.n_tokens > {BUDGET}
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.fill > 0 AND p.fill + d.n_tokens > {BUDGET}
                  THEN d.n_tokens ELSE p.fill + d.n_tokens END
      FROM pack p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
    SELECT source, doc_id, n_tokens, bin FROM pack
    """,
)
def b35_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: greedy sequence packing into {BUDGET}-token bins, one
    independent bin sequence per source stream.  applyInPandas keeps
    the sequential fold off the JVM hot path but Arrow-batched; the
    shuffle is one exchange on the stream key.  Estimated token counts
    (n_chars/4) keep the fold integer-exact cross-engine."""
    d = table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.expr(TOKENS).alias("n_tokens")
    )
    return d.groupBy("source").applyInPandas(_pack_group, _PACK_SCHEMA)


@query(
    "b35_pack_utilization",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT source, doc_id, {TOKENS} AS n_tokens,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents),
    pack(source, rn, doc_id, n_tokens, bin, fill) AS (
      SELECT source, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.source, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN p.fill > 0 AND p.fill + d.n_tokens > {BUDGET}
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.fill > 0 AND p.fill + d.n_tokens > {BUDGET}
                  THEN d.n_tokens ELSE p.fill + d.n_tokens END
      FROM pack p JOIN d ON d.source = p.source AND d.rn = p.rn + 1)
    SELECT source, count(DISTINCT bin) AS n_bins,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM pack GROUP BY source
    """,
)
def b35_pack_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B35: packing efficiency report — bins used and total tokens per
    stream, the inputs to the utilization metric that tells you whether
    greedy packing is wasting accelerator time (total_tokens /
    (n_bins·BUDGET) ≪ 1 means you want length-sorted or offline
    bin-packing instead).  Only exact integers are emitted — the
    derived ratio is left to the consumer, keeping the result
    bit-identical across engines (float division canonicalizes
    differently between Spark and SQL engines)."""
    packed = b35_sequence_pack(spark, sf_dir)
    return packed.groupBy("source").agg(
        F.countDistinct("bin").alias("n_bins"),
        F.sum("n_tokens").alias("total_tokens"),
    )
