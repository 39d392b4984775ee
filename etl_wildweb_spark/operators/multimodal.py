"""Multimodal column conventions (SURVEY.md §2 B32).

Images/audio/video ride as opaque ``binary`` columns next to typed
metadata structs; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` over those bytes.  The decode itself is STUBBED here
(no imaging libs in this container — a deterministic fake stands in,
clearly marked), but everything Spark-side is real: schemas, batch
iteration, partition sizing, column pruning.

100 TB notes: binary payloads dominate row size, so (a) keep them in
their own column so Parquet column pruning skips them unless touched,
(b) size ``spark.sql.files.maxPartitionBytes`` so a batch of blobs
fits executor memory, (c) never collect blobs to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from ..registry import query


def with_blob_columns(docs: DataFrame) -> DataFrame:
    """documents → multimodal-shaped: an opaque binary payload (the
    utf-8 text bytes standing in for image bytes) + a typed metadata
    struct, the convention every decode/extract operator consumes."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.col("n_chars").cast("int").alias("byte_length"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


@query(
    "b32_multimodal_plumbing",
    oracle="""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS blob_len,
           'image/fake' AS mime
    FROM documents
    """,
)
def b32_multimodal_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: binary column round-trip — blob length computed from the
    binary column itself (hash-checked vs the text byte length)."""
    d = with_blob_columns(table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("blob").cast("bigint").alias("blob_len"),
        F.col("media_meta.mime").alias("mime"),
    )


#: Output schema of the fake decoder — what a real image decode would
#: produce (dimensions + a small feature vector).  The feature is emitted
#: as scalar columns (not array<double>) so downstream tabular tooling —
#: including the driver's pandas canonicalizer — can sort/hash rows.
DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, "
    "feat_len double, feat_first double, feat_last double, feat_sum8 double"
)


def fake_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """STUB decode (deterministic fake): a real implementation would call
    PIL/ffmpeg here on each blob.  The fake derives stable pseudo-
    dimensions and a 4-dim feature from the bytes so tests can assert
    exact values.  Raises NotImplementedError if asked for real decode.
    """
    for pdf in batches:
        blobs = pdf["blob"]
        n = blobs.str.len()
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": (n % 640).astype("int32"),
                "height": (n % 480).astype("int32"),
                "n_frames": (1 + n % 4).astype("int32"),
                "feat_len": [float(len(b)) for b in blobs],
                "feat_first": [float(b[0]) for b in blobs],
                "feat_last": [float(b[-1]) for b in blobs],
                "feat_sum8": [float(sum(b[:8])) for b in blobs],
            }
        )


def real_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    raise NotImplementedError(
        "image/audio decode requires PIL/ffmpeg, not present in this "
        "container — use fake_decode_batches (same Spark plumbing)"
    )


@query("b32_fake_decode")  # binary → features via mapInPandas; rows-only
def b32_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: the decode/feature-extract operator shape — mapInPandas over
    (doc_id, blob) with Arrow batching.  Blob column pruned at the scan
    when untouched; only this operator pays for the bytes."""
    d = with_blob_columns(table(spark, sf_dir, "documents"))
    return d.select("doc_id", "blob").mapInPandas(
        fake_decode_batches, schema=DECODE_SCHEMA
    )


#: Resize target: the fake keeps ≤64 evenly-strided bytes per blob —
#: the byte-subsampling analog of a thumbnail.
RESIZE_TARGET = 64

RESIZE_SCHEMA = (
    "doc_id bigint, out_len int, out_sum bigint, out_first int, out_last int"
)


def fake_resize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """STUB resize (deterministic fake): a real implementation would
    decode + rescale pixels here; the fake subsamples every k-th byte
    (k = ⌈len/target⌉) — same contract as a thumbnail: bounded output
    size, content-dependent values, order-preserving.  Emits integer
    summaries of the 'resized' bytes so tests assert exact values."""
    for pdf in batches:
        out_len, out_sum, out_first, out_last = [], [], [], []
        for b in pdf["blob"]:
            step = max(1, len(b) // RESIZE_TARGET)
            r = b[::step][:RESIZE_TARGET] if len(b) else b"\x00"
            out_len.append(len(r))
            out_sum.append(sum(r))
            out_first.append(r[0])
            out_last.append(r[-1])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "out_len": pd.array(out_len, dtype="int32"),
                "out_sum": pd.array(out_sum, dtype="int64"),
                "out_first": pd.array(out_first, dtype="int32"),
                "out_last": pd.array(out_last, dtype="int32"),
            }
        )


@query("b32_fake_resize")  # binary → bounded binary via mapInPandas; rows-only
def b32_fake_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: the resize/thumbnail operator shape — mapInPandas over the
    blob column with a bounded-size output contract (every input maps
    to ≤ RESIZE_TARGET bytes).  Same pruning/batching story as decode;
    at 100 TB this is the step that shrinks a crawl's media payload
    before feature extraction, so output size bounds matter more than
    fidelity."""
    d = with_blob_columns(table(spark, sf_dir, "documents"))
    return d.select("doc_id", "blob").mapInPandas(
        fake_resize_batches, schema=RESIZE_SCHEMA
    )


@query(
    "b32_frame_sample",
    oracle="""
    SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no
    FROM (SELECT doc_id, unnest(range(0, 1 + strlen(text) % 4)) AS frame_no
          FROM documents)
    """,
)
def b32_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32: frame sampling as an explode over per-row frame counts —
    the row-multiplying half of video processing, kept declarative so
    Catalyst sees cardinality.  Frame count mirrors the fake decoder."""
    d = with_blob_columns(table(spark, sf_dir, "documents"))
    n_frames = (F.octet_length("blob") % 4 + 1).cast("int")
    return d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
    )
