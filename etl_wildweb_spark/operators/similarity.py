"""Similarity search over embedding columns (SURVEY.md §2 B30).

Exact top-k cosine is the baseline: broadcast the (small) query set
against the candidate corpus, compute cosine with higher-order
functions (JVM-side, see functions/vector.py), rank with a window.

The scale path is LSH bucketing: random-hyperplane signatures prune the
candidate space so each query only scores vectors in (near-)matching
buckets.  At 100 TB the corpus is bucketed once (write-time), queries
hash to their buckets, and the scoring join touches a small fraction of
the corpus; multi-probe (flipping one signature bit) trades recall for
cost without re-bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot, sq_l2
from ..io import lift_parallelism, table
from ..registry import query

TOP_K = 10
N_QUERIES = 10  # vec_id < 10 are the query vectors in declared queries

#: Multi-table random-hyperplane LSH: L tables × k bits.  Collision
#: probability for a neighbor at angle θ is 1-(1-p^k)^L with
#: p = 1-θ/π, so more tables buy recall and more bits buy precision.
N_TABLES = 8
N_BITS = 8


@query(
    "b30_cosine_topk",
    oracle=f"""
    WITH sims AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
                   AS cos_sim
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, neighbor_id) AS rnk
          FROM sims)
    WHERE rnk <= {TOP_K}
    """,
)
def b30_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: exact brute-force cosine top-k — query set broadcast against
    the corpus, no shuffle of the big side; per-query ranking via
    window.  Double-precision sequential accumulation matches DuckDB's
    list_cosine_similarity bit-for-bit (verified by the oracle hash)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine("qe", "ce"))
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= TOP_K)
    )


def hyperplanes(
    spark: SparkSession, dim: int, n_tables: int = N_TABLES, n_bits: int = N_BITS
) -> DataFrame:
    """Deterministic pseudo-random hyperplanes: component of plane
    (t, b) at position j derived from xxhash64(t, b, j) mapped to
    [-1, 1).  Built as a DataFrame so the signature computation stays
    declarative end to end."""
    return (
        spark.range(n_tables * n_bits)
        .select(
            (F.col("id") / n_bits).cast("int").alias("table_id"),
            (F.col("id") % n_bits).cast("int").alias("bit_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: F.xxhash64(F.col("id"), j).cast("double") / F.lit(float(2**63)),
            ).alias("normal"),
        )
    )


def lsh_signatures(
    vectors: DataFrame, planes: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """vector → one integer bucket per hash table (sign-bit signature).
    Output: (vec_id, table_id, bucket)."""
    return (
        vectors.crossJoin(F.broadcast(planes))
        .withColumn("bit", (dot(vec_col, "normal") > 0).cast("long"))
        .groupBy("vec_id", "table_id")
        .agg(F.sum(F.expr("shiftleft(bit, bit_id)")).alias("bucket"))
    )


N_CELLS = 16  # IVF coarse-quantizer cells
N_PROBE = 4  # cells scanned per query


def _avg_vectors(df: DataFrame, key: str, vec_col: str, dim: int) -> DataFrame:
    """Component-wise mean of an array<float> column per key, kept
    declarative: posexplode → per-(key,pos) avg → reassemble ordered."""
    return (
        df.select(key, F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(key, "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy(key)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.getField("m"),
            ).alias("centroid")
        )
    )


def ivf_centroids(vectors: DataFrame, dim: int) -> DataFrame:
    """Deterministic coarse quantizer: seed with N_CELLS hash-picked
    corpus vectors, then one Lloyd refinement step (assign-all +
    component-wise mean), all in DataFrame ops.  At 100 TB the seeds
    come from a sample() and the refinement runs on that sample only —
    the full corpus is touched once, at assignment time."""
    seeds = (
        vectors.withColumn("r", F.xxhash64("vec_id"))
        .orderBy("r")
        .limit(N_CELLS)
        .select(
            F.row_number().over(W.orderBy("r")).alias("cell"),
            F.col("embedding").alias("centroid"),
        )
    )
    assigned = assign_cells(vectors, seeds, n_probe=1).select(
        "cell", "embedding"
    )
    # ROUND-13 OPTIMIZATION (guide §5 caching rule): every caller
    # consumes the centroid table at least twice (corpus assignment +
    # query probes), and each reference would replay the corpus-wide
    # seed-assignment window plus both refinement shuffles.  The table
    # is N_CELLS rows — materialize it once.
    return _avg_vectors(assigned, "cell", "embedding", dim).localCheckpoint(
        eager=True
    )


def assign_cells(vectors: DataFrame, centroids: DataFrame, n_probe: int) -> DataFrame:
    """Attach the ``n_probe`` nearest cells (by cosine) to each vector.
    Centroid table is tiny → broadcast; ranking via window."""
    w = W.partitionBy("vec_id").orderBy(F.desc("cell_sim"), "cell")
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("cell_sim", cosine("embedding", "centroid"))
        .withColumn("cell_rnk", F.row_number().over(w))
        .filter(F.col("cell_rnk") <= n_probe)
        .drop("centroid", "cell_sim", "cell_rnk")
    )


@query("b30_ann_ivf")  # approximate by construction → rows-only check
def b30_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30 scale path #2: IVF (inverted-file) top-k — a coarse k-means
    quantizer partitions the corpus into N_CELLS lists; each query
    scores only the N_PROBE nearest lists (~25% of this corpus, and a
    far smaller fraction as N_CELLS grows with corpus size: √n cells ×
    fixed probes ⇒ O(n/√n) scored per query).  At 100 TB the corpus is
    written partitioned by cell, so a probe is a partition-pruned scan —
    no shuffle of the big side, queries broadcast.  Recall vs exact
    top-10 is asserted in tests/test_llmops.py."""
    e = table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(e, dim=64)
    corpus = assign_cells(e, cents, n_probe=1).select(
        "cell", F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    queries = (
        assign_cells(e.filter(F.col("vec_id") < N_QUERIES), cents, n_probe=N_PROBE)
        .select("cell", F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        corpus.join(F.broadcast(queries), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", cosine("qe", "ce"))
        .select("query_id", "neighbor_id", "cos_sim")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
    )


@query("b30_ann_lsh")  # approximate by construction → rows-only check
def b30_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30 scale path: multi-table hyperplane LSH top-k (8 tables × 8
    bits, 1-bit multiprobe).  A query scores only candidates sharing a
    bucket in ≥1 table — here that's ~25-30% of an (unclustered,
    worst-case) corpus instead of 100%; on real clustered embeddings the
    pruning is far stronger.  At 100 TB: corpus bucketed at write time
    (partitioned by (table_id, bucket)), queries hash + probe, the
    scoring join is an equi-join on the bucket key — no cross product
    anywhere.  tests/test_llmops.py measures recall vs exact top-10."""
    e = table(spark, sf_dir, "embeddings")
    dim = 64
    planes = hyperplanes(spark, dim)
    # NOT materialized (round-13 A/B): both probe and corpus sides
    # read the signature table, but its replay is a broadcast fan-out
    # in codegen — cheaper than an eager checkpoint (1.39 → 1.62 s
    # min-of-3 at sf0.1 with the checkpoint; guide §1 keeps the
    # measurement, not the theory).
    sigs = lsh_signatures(e, planes)
    # multiprobe: the bucket itself + every 1-bit flip
    probes = F.array(
        F.col("bucket"),
        *[F.expr(f"cast(bucket ^ {1 << p} as long)") for p in range(N_BITS)],
    )
    q = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "table_id",
        F.explode(probes).alias("bucket"),
    )
    c = sigs.select(
        F.col("vec_id").alias("neighbor_id"), "table_id", "bucket"
    )
    # dedup on BARE ID PAIRS before fetching any embedding: a pair found
    # in k tables/probes would otherwise drag 2×64 floats through the
    # distinct's shuffle and be scored k times (measured 2× slower and
    # spill-prone at sf0.1)
    pairs = (
        q.join(c, ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    cand = pairs.join(
        e.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")),
        "query_id",
    ).join(
        e.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
        ),
        "neighbor_id",
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        cand.withColumn("cos_sim", cosine("qe", "ce"))
        .select("query_id", "neighbor_id", "cos_sim")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
    )


# ----------------------------------------------------------- clustering

N_CENTROIDS = 8  # deterministic seeds: the lowest vec_ids


@query(
    "b40_centroid_assign",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      WHERE vec_id < {N_CENTROIDS}),
    sims AS (
      SELECT e.vec_id, c.cid,
             list_cosine_similarity(e.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]) AS cos_sim
      FROM embeddings e CROSS JOIN c),
    best AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, cid ASC) AS rn
      FROM sims)
    SELECT cid AS cluster_id,
           count(*) AS n_members,
           min(vec_id) AS min_vec_id,
           max(vec_id) AS max_vec_id
    FROM best WHERE rn = 1
    GROUP BY cid
    """,
)
def b40_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment — the inner step of k-means / the
    routing step of IVF index builds — with deterministic seed
    centroids (the 8 lowest vec_ids) so the result is
    exactly oracle-checkable.  Emits per-cluster membership stats.

    Engine shape: the centroid set is broadcast (k centroids always
    fit in memory — k ≤ 10⁵ even for web-scale IVF), the corpus side is
    never shuffled for scoring, and the only exchanges are the tiny
    per-vector argmax rollup (vec_id, best) and the per-cluster count.
    Cosine runs in double with sequential accumulation
    (functions/vector.py) — bit-identical to DuckDB's
    list_cosine_similarity, so the argmax tie-break (similarity DESC,
    cid ASC) is cross-engine deterministic.  A full k-means would
    iterate this assignment against recomputed means; each round is
    this same broadcast-score-rollup plan."""
    e = table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    scored = e.select("vec_id", "embedding").join(F.broadcast(cents)).select(
        "vec_id", "cid", cosine("embedding", "ce").alias("cos_sim")
    )
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            "cid", F.struct(F.col("cos_sim"), (-F.col("cid")).alias("nc"))
        ).alias("cluster_id")
    )
    return best.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("vec_id").alias("min_vec_id"),
        F.max("vec_id").alias("max_vec_id"),
    )


# ------------------------------------------------- observed ANN quality

def ann_with_recall(
    spark: SparkSession, sf_dir: str, kind: str
) -> tuple[DataFrame, "F.Observation"]:
    """Wrap an ANN path with a ``df.observe`` recall@k probe: the ANN
    result left-joins the exact top-k on the SAME query sample and the
    observation aggregates hit-rate *during the action* — no second
    scan, no separate evaluation job.  This is the A20 observability
    pattern (metrics.py) applied to retrieval quality: at 100 TB you
    cannot afford an offline recall study per index build, but you can
    always afford the exact answer on a ~10-query probe sample (one
    broadcast pass) riding along with the real query.

    Returns (observed DataFrame, Observation); after any action on the
    DataFrame, ``obs.get`` carries ``recall_at_10`` and ``n_ann_rows``.
    """
    from pyspark.sql import Observation

    ann_fn = {"lsh": b30_ann_lsh, "ivf": b30_ann_ivf}[kind]
    ann = ann_fn(spark, sf_dir)
    exact = b30_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1.0).alias("in_exact")
    )
    obs = Observation(f"ann_{kind}_quality")
    observed = (
        ann.join(exact, ["query_id", "neighbor_id"], "left")
        .observe(
            obs,
            F.round(
                F.sum(F.coalesce("in_exact", F.lit(0.0)))
                / F.lit(float(N_QUERIES * TOP_K)),
                4,
            ).alias("recall_at_10"),
            F.count(F.lit(1)).alias("n_ann_rows"),
        )
        .drop("in_exact")
    )
    return observed, obs


@query("b30_ann_lsh_observed")  # approximate → rows-only; recall rides along
def b30_ann_lsh_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: the LSH path with its recall@10-vs-exact probe attached as
    an observe() metric (ADVICE round 1: surface ANN recall as an
    observable).  tests/test_llmops.py asserts the observed recall
    meets the same threshold the offline test enforces."""
    return ann_with_recall(spark, sf_dir, "lsh")[0]


@query("b30_ann_ivf_observed")  # approximate → rows-only; recall rides along
def b30_ann_ivf_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30: the IVF path with the same observed recall@10 probe."""
    return ann_with_recall(spark, sf_dir, "ivf")[0]


@query(
    "b56_embedding_quantize",
    oracle="""
    WITH m AS (
      SELECT vec_id, label, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS max_abs
      FROM embeddings),
    q AS (
      SELECT vec_id, label, max_abs,
             list_transform(embedding,
               x -> CASE WHEN max_abs = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(round(127.0 * CAST(x AS DOUBLE) / max_abs)
                              AS BIGINT) END) AS qv
      FROM m)
    SELECT vec_id, label,
           CAST(round(max_abs * 1000000) AS BIGINT) AS scale_ppm,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_min(qv) AS BIGINT) AS q_min,
           CAST(list_max(qv) AS BIGINT) AS q_max
    FROM q
    """,
)
def b56_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the 4×
    storage/bandwidth cut every billion-vector ANN index takes before
    sharding (scale = per-vector max|x|, q = round(127·x/scale)).
    Emitted as per-vector integer summaries (scale in exact ppm, sum/
    min/max of the quantized values) so the check is float-repr-free:
    every number is an integer derived from IEEE-exact steps (f32→f64
    widening is exact, both engines round half-away-from-zero).

    Scale: pure narrow per-row transform over the vector column — zero
    shuffles; the production variant writes q_arr (array<tinyint>) +
    scale side-by-side with the same plan shape, and the ANN operators
    up-cast on the fly."""
    e = table(spark, sf_dir, "embeddings")
    max_abs = F.array_max(
        F.transform("embedding", lambda x: F.abs(x.cast("double")))
    )
    withq = e.select(
        "vec_id",
        "label",
        max_abs.alias("max_abs"),
        F.transform(
            "embedding",
            # zero-vector guard: 0/0 would give NaN (Spark) vs error/NULL
            # (oracle); an all-zero embedding quantizes to all zeros.
            lambda x: F.when(max_abs == 0, F.lit(0).cast("bigint")).otherwise(
                F.round(F.lit(127.0) * x.cast("double") / max_abs).cast("bigint")
            ),
        ).alias("qv"),
    )
    return withq.select(
        "vec_id",
        "label",
        F.round(F.col("max_abs") * 1_000_000).cast("bigint").alias("scale_ppm"),
        F.aggregate("qv", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "q_sum"
        ),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
    )


@query(
    "b97_kmeans_update",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS cid, embedding FROM embeddings
      WHERE vec_id < {N_CENTROIDS}),
    sims AS (
      SELECT e.vec_id, c.cid,
             list_cosine_similarity(e.embedding::DOUBLE[],
                                    c.embedding::DOUBLE[]) AS cos_sim
      FROM embeddings e CROSS JOIN c),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos_sim DESC, cid ASC) AS rn
        FROM sims) WHERE rn = 1),
    expl AS (
      SELECT a.cid AS cluster_id, CAST(r.range AS INT) AS pos,
             CAST(floor(CAST(e.embedding[CAST(r.range AS INT) + 1]
                             AS DOUBLE) * 1000000) AS BIGINT) AS xs
      FROM embeddings e
      JOIN assign a ON e.vec_id = a.vec_id,
           range(64) r)
    SELECT cluster_id, pos,
           CAST(sum(xs) // count(*) AS BIGINT) AS mean_micro,
           CAST(count(*) AS BIGINT) AS n_members
    FROM expl GROUP BY cluster_id, pos
    """,
)
def b97_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-means UPDATE step completing b40's assign: per-cluster
    elementwise centroid means in integer MICRO units — floor(x·10⁶)
    per element, bigint sums, integer division (Spark ``div`` and
    DuckDB ``//`` both truncate toward zero, verified) — so one full
    Lloyd iteration is cross-engine bit-exact end to end.  Output is
    (cluster, dim) → mean_micro + member count, k×64 rows.

    Scale: assignment is b40's broadcast-score-rollup (corpus never
    shuffled); the update posexplodes to (cluster, dim) keys — a
    shuffle of k·dim·P partial sums AFTER map-side combine, i.e.
    centroid-table-sized, not corpus-sized.  Iterating Lloyd = loop
    this plan with the previous round's means broadcast back in
    (the b84_pagerank iterate-on-the-small-thing principle)."""
    e = table(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    scored = e.select("vec_id", "embedding").join(F.broadcast(cents)).select(
        "vec_id", "embedding", "cid", cosine("embedding", "ce").alias("cos_sim")
    )
    assign = scored.groupBy("vec_id").agg(
        F.max_by(
            "cid", F.struct(F.col("cos_sim"), (-F.col("cid")).alias("nc"))
        ).alias("cluster_id"),
        F.first("embedding").alias("embedding"),
    )
    expl = assign.select(
        "cluster_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "cluster_id",
        "pos",
        F.floor(F.col("x").cast("double") * 1_000_000)
        .cast("bigint")
        .alias("xs"),
    )
    return expl.groupBy("cluster_id", "pos").agg(
        F.expr("sum(xs) div count(1)").cast("bigint").alias("mean_micro"),
        F.count(F.lit(1)).alias("n_members"),
    )


#: b134 product-quantization geometry: 64-dim vectors → 8 subspaces of
#: 8 dims, 16 centroids per subspace (4-bit codes, 8 bytes per vector —
#: a 32x compression of float32 embeddings).
PQ_SUBSPACES = 8
PQ_SUBDIM = 8
PQ_K = 16

# b134 packs the PQ_SUBSPACES codes into ONE BIGINT with radix PQ_K
# (acc·PQ_K + code); the packed value must fit a signed 64-bit int.
# Guard the geometry here so raising either constant is a loud import
# error, not silent code collisions / overflow in packed_codes
# (ADVICE r7).
if PQ_K ** PQ_SUBSPACES > 2**62:
    raise ValueError(
        f"PQ geometry unpackable: PQ_K**PQ_SUBSPACES = {PQ_K}**{PQ_SUBSPACES} "
        "exceeds the signed-BIGINT packing budget of b134_pq_encode"
    )


def pq_codebooks(vectors: DataFrame) -> DataFrame:
    """Per-subspace codebooks seeded from the PQ_K lowest vec_ids'
    subvectors — the deterministic stand-in for one k-means iteration
    (b97_kmeans_update is the refinement step; composing them trains a
    real codebook).  Returns (sub, code, centroid array<float>), a
    PQ_SUBSPACES × PQ_K table — always broadcast-sized regardless of
    corpus scale."""
    seeds = (
        vectors.orderBy("vec_id")
        .limit(PQ_K)
        .select(
            # unpartitioned window — DELIBERATE and bounded: its input
            # is the limit(PQ_K)=16-row seed frame, never the corpus,
            # so the single-partition warning is vacuous here.  If
            # PQ_K ever grew past broadcast size the whole codebook
            # design (driver-side collect + broadcast in pq_encode)
            # would change first.
            F.row_number()
            .over(W.orderBy("vec_id"))
            .alias("code"),
            "embedding",
        )
        .withColumn("code", F.col("code") - 1)
    )
    return seeds.select(
        "code",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice(
                            "embedding", s * PQ_SUBDIM + 1, PQ_SUBDIM
                        ).alias("centroid"),
                    )
                    for s in range(PQ_SUBSPACES)
                ]
            )
        ).alias("sc"),
    ).select(
        F.col("sc.sub").alias("sub"),
        "code",
        F.col("sc.centroid").alias("centroid"),
    )


def _pq_encode_batches(codebook_rows, with_err: bool = True, keep: tuple = ()):
    """mapInPandas factory closed over the collected codebook (a
    PQ_SUBSPACES×PQ_K×PQ_SUBDIM float array — ~4 KB, shipped by value
    in the task closure like broadcast hyperplanes).  ``with_err=False``
    skips the reconstruction gather + squared-error sum and emits only
    (vec_id, codes) — the ADC search path needs nothing else.  ``keep``
    names input columns passed through unchanged AHEAD of vec_id (b175
    carries the IVF cell alongside the codes this way — the output
    schema must list them in the same order)."""
    import numpy as np
    import pandas as pd

    cb = np.zeros((PQ_SUBSPACES, PQ_K, PQ_SUBDIM), dtype=np.float32)
    for r in codebook_rows:
        cb[r["sub"], r["code"]] = r["centroid"]

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                cols = {k: [] for k in keep}
                cols.update({"vec_id": [], "codes": []})
                if with_err:
                    cols["recon_err"] = []
                yield pd.DataFrame(cols)
                continue
            v = np.stack([np.asarray(x, dtype=np.float32) for x in pdf["embedding"]])
            n = v.shape[0]
            vs = v.reshape(n, PQ_SUBSPACES, PQ_SUBDIM)
            # distances: (n, sub, K) = ||x||^2 - 2 x·c + ||c||^2 computed
            # stably as an explicit difference (small dims, exactness
            # beats the BLAS trick's cancellation here)
            diff = vs[:, :, None, :] - cb[None, :, :, :]
            d2 = np.einsum("nskd,nskd->nsk", diff, diff)
            codes = d2.argmin(axis=2).astype(np.int32)  # ties → lowest code
            cols = {k: pdf[k].values for k in keep}
            cols.update({"vec_id": pdf["vec_id"].values, "codes": list(codes)})
            if with_err:
                recon = cb[np.arange(PQ_SUBSPACES)[None, :], codes]
                cols["recon_err"] = (
                    ((vs - recon) ** 2).sum(axis=(1, 2)).astype(float)
                )
            yield pd.DataFrame(cols)

    return gen


@query("b134_pq_encode")  # codebook-dependent floats → rows-only check
def b134_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT QUANTIZATION encode — the memory side of
    billion-vector ANN (IVF-PQ): each 64-dim float vector compresses
    to 8 four-bit codes by nearest-centroid assignment per subspace,
    32x smaller than float32 with distances still computable from
    code→centroid lookup tables.  Complements b30_ann_ivf (the
    routing side) and b56_embedding_quantize (scalar int8).

    Scale: the codebook is PQ_SUBSPACES×PQ_K rows — collected once
    (a scalar-sized driver hop, same class as IVF centroids) and
    shipped by value into ONE Arrow-batched mapInPandas pass over the
    corpus; encoding is a narrow map, no shuffle anywhere.  Invariants
    (tests/test_llmops.py): codes in [0, PQ_K), deterministic across
    runs, reconstruction error strictly ≤ assigning every subvector
    to centroid 0, and bit-identical to a pure-numpy reference.

    Rows-only: the code assignment depends on float argmin over the
    data-derived codebook — expressible in DuckDB only by replaying
    the same float pipeline, which would test DuckDB, not the
    operator.

    Output shape: the 8 four-bit codes are packed big-endian into ONE
    BIGINT (code_0·16⁷ + … + code_7; max 16⁸−1 = 2³²−1, no overflow) —
    registered queries never emit top-level array/map columns (the
    driver's canonicalizer sorts pandas frames and ndarray cells are
    unhashable; guarded by tests/test_registry.py).  b137 consumes the
    unpacked array form internally."""
    e = table(spark, sf_dir, "embeddings")
    cb_rows = [r.asDict() for r in pq_codebooks(e).collect()]
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("codes", ArrayType(IntegerType()), False),
            StructField("recon_err", DoubleType(), False),
        ]
    )
    enc = e.select("vec_id", "embedding").mapInPandas(
        _pq_encode_batches(cb_rows), schema=schema
    )
    return enc.select(
        "vec_id",
        F.expr(
            # radix = PQ_K (codes live in [0, PQ_K)); the module-level
            # geometry guard next to PQ_K proves this fits a BIGINT
            f"aggregate(codes, 0L, (acc, c) -> acc * {PQ_K}L + cast(c as bigint))"
        ).alias("packed_codes"),
        "recon_err",
    )


def _adc_score_batches(dt_rows, query_ids):
    """mapInPandas factory closed over the per-query ADC distance
    tables (``dt_rows``: numpy (n_queries, PQ_SUBSPACES, PQ_K) float64
    — ~10 KB, shipped by value): each corpus batch scores ALL queries
    in one vectorized lookup-sum over its code matrix."""
    import numpy as np
    import pandas as pd

    dt = np.asarray(dt_rows, dtype=np.float64)
    qids = np.asarray(query_ids, dtype=np.int64)

    def gen(batches):
        subs = np.arange(PQ_SUBSPACES)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"query_id": [], "neighbor_id": [], "adist": []}
                )
                continue
            codes = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )  # (n, SUBS)
            vids = pdf["vec_id"].values
            # dist[q, n] = Σ_s dt[q, s, codes[n, s]]
            dist = dt[:, subs[None, :], codes].sum(axis=2)  # (nq, n)
            nq, n = dist.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(vids, nq),
                    "adist": dist.reshape(-1),
                }
            )

    return gen


@query("b137_pq_adc_search")  # approximate by construction → rows-only
def b137_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ's SEARCH side — Asymmetric Distance Computation: queries
    stay full-precision, the corpus is its 8×4-bit PQ codes, and each
    (query, vector) distance is EIGHT table lookups + a sum instead of
    a 64-dim float scan.  The per-query distance tables
    dt[s][c] = ||q_s − centroid_{s,c}||² are computed once against the
    broadcast-sized codebook and shipped by value; scoring the corpus
    is ONE Arrow-batched narrow map over the code table (no shuffle,
    no float vectors read), then top-k per query via the rank window.

    This composes b134 (encode) into the operating regime that makes
    billion-vector ANN memory-feasible: the scored table is 8 bytes
    per vector, 32× smaller than the float corpus, and the scan cost
    is lookup-bound.  In full IVF-PQ the same scoring runs only inside
    IVF-probed cells (b30_ann_ivf's routing); here it scans all codes
    so the invariants are exactly testable.

    Rows-only; tests/test_llmops.py pins (a) the ADC identity — adist
    equals ||q − reconstruct(v)||² computed independently in numpy —
    and (b) recall vs exact L2 top-k well above the random-scan
    baseline on these worst-case gaussian vectors."""
    import numpy as np

    e = table(spark, sf_dir, "embeddings")
    cb_rows = [
        r.asDict() for r in pq_codebooks(e).collect()
    ]  # codebook-sized driver hop, collected ONCE for dt + encode
    cb = np.zeros((PQ_SUBSPACES, PQ_K, PQ_SUBDIM), dtype=np.float64)
    for r in cb_rows:
        cb[r["sub"], r["code"]] = r["centroid"]
    qrows = sorted(
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )  # N_QUERIES rows — query-set-sized driver hop, like b30's broadcast
    qids = [r.vec_id for r in qrows]
    qs = np.asarray([r.embedding for r in qrows], dtype=np.float64).reshape(
        len(qrows), PQ_SUBSPACES, PQ_SUBDIM
    )
    # dt[q, s, c] = ||q_s - cb[s, c]||^2
    diff = qs[:, :, None, :] - cb[None, :, :, :]
    dt = np.einsum("qscd,qscd->qsc", diff, diff)

    codes = e.select("vec_id", "embedding").mapInPandas(
        _pq_encode_batches(cb_rows, with_err=False),
        schema="vec_id long, codes array<int> not null",
    )
    scored = codes.mapInPandas(
        _adc_score_batches(dt.tolist(), qids),
        schema="query_id long, neighbor_id long, adist double",
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "adist", F.col("rnk").cast("int").alias("rnk"))
    )


def _adc_pair_batches(dt_rows, query_ids):
    """mapInPandas factory for CELL-PRUNED ADC: unlike
    _adc_score_batches (which scores every query against every corpus
    batch — the full-scan b137 shape), each input row here is one
    (query_id, vec_id, codes) candidate produced by the IVF cell join,
    and the distance is the 8-lookup sum from that query's own table.
    dt_rows: (n_queries, PQ_SUBSPACES, PQ_K) float64 (~10 KB, shipped
    by value)."""
    import numpy as np
    import pandas as pd

    dt = np.asarray(dt_rows, dtype=np.float64)
    qindex = {int(q): i for i, q in enumerate(query_ids)}

    def gen(batches):
        subs = np.arange(PQ_SUBSPACES)
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {"query_id": [], "neighbor_id": [], "adist": []}
                )
                continue
            codes = np.stack(
                [np.asarray(c, dtype=np.int64) for c in pdf["codes"]]
            )  # (n, SUBS)
            qi = np.asarray([qindex[int(q)] for q in pdf["query_id"]])
            adist = dt[qi[:, None], subs[None, :], codes].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].values,
                    "neighbor_id": pdf["vec_id"].values,
                    "adist": adist,
                }
            )

    return gen


@query("b175_ivfpq_search")  # approximate by construction → rows-only
def b175_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL IVF-PQ — the composition b137's docstring promises, and
    the operating shape of billion-vector ANN (FAISS's IVFPQ index):
    b30's IVF coarse quantizer routes, b134's PQ codes compress, and
    ADC scoring runs ONLY inside each query's N_PROBE probed cells.
    Per query the work is (corpus/​N_CELLS)·N_PROBE code rows × 8 table
    lookups — both the scan fraction and the bytes-per-vector shrink
    independently, which is what makes the product feasible at 10⁹
    vectors.

    Engine shape at 100 TB: the code table is written PARTITIONED BY
    CELL (here: one narrow encode pass carrying the cell assignment
    through mapInPandas — no join to re-attach it); queries broadcast
    their (cell, query_id) probe list; the candidate join is a
    broadcast equi-join on cell (partition-pruned scan in the
    partitioned-table form); scoring is one Arrow-batched narrow map
    over candidates; top-k via the rank window's Partial+Final
    WindowGroupLimit.  The float corpus is read exactly twice (cell
    assignment + encode), never shuffled, never read at query time.

    Rows-only: both constituent approximations are already pinned
    individually; tests/test_llmops.py pins the COMPOSITION — a full
    numpy replay (route → encode → ADC → top-k over the Spark-computed
    centroids) must reproduce every returned row, ids and distances
    alike, so there is no recall threshold to flake on.  Honest
    accuracy note: on this worst-case corpus (unclustered gaussians,
    16-seed codebook) the composed recall sits at the probed-fraction
    baseline — IVF needs cluster structure and the tiny demo codebook
    quantizes coarsely; real embedding corpora supply both, which is
    why FAISS defaults to exactly this index."""
    return _ivfpq_topk(spark, sf_dir)


def _ivfpq_topk(
    spark: SparkSession, sf_dir: str, cand_pred: F.Column | None = None
) -> DataFrame:
    """IVF-PQ top-k over the corpus, optionally restricted to the
    candidate rows matching ``cand_pred`` (the b175_observed_sampled
    path: index artifacts — centroids, codebooks — always come from
    the full corpus, exactly like a production index; only the
    candidate/scan side shrinks)."""
    import numpy as np

    e = table(spark, sf_dir, "embeddings")
    cents = ivf_centroids(e, dim=64)
    cb_rows = [r.asDict() for r in pq_codebooks(e).collect()]
    corpus = e if cand_pred is None else e.filter(cand_pred)
    # corpus side: cell assignment + PQ encode in ONE narrow pass each;
    # the cell column rides through the encoder (keep=), standing in
    # for the partitioned-by-cell code table of the at-scale layout
    codes = (
        assign_cells(corpus, cents, n_probe=1)
        .select("cell", "vec_id", "embedding")
        .mapInPandas(
            _pq_encode_batches(cb_rows, with_err=False, keep=("cell",)),
            schema="cell int, vec_id long, codes array<int> not null",
        )
    )
    # query side: probe list (cell, query_id) + per-query ADC distance
    # tables from the collected codebook (both bounded driver hops)
    qrows = sorted(
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    qids = [r.vec_id for r in qrows]
    cb = np.zeros((PQ_SUBSPACES, PQ_K, PQ_SUBDIM), dtype=np.float64)
    for r in cb_rows:
        cb[r["sub"], r["code"]] = r["centroid"]
    qs = np.asarray([r.embedding for r in qrows], dtype=np.float64).reshape(
        len(qrows), PQ_SUBSPACES, PQ_SUBDIM
    )
    diff = qs[:, :, None, :] - cb[None, :, :, :]
    dt = np.einsum("qscd,qscd->qsc", diff, diff)
    probes = assign_cells(
        e.filter(F.col("vec_id") < N_QUERIES), cents, n_probe=N_PROBE
    ).select("cell", F.col("vec_id").alias("query_id"))
    cand = (
        codes.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "codes")
    )
    scored = cand.mapInPandas(
        _adc_pair_batches(dt.tolist(), qids),
        schema="query_id long, neighbor_id long, adist double",
    )
    w = W.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "adist",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@query("b175_ivfpq_observed")  # measured recall of an approximation → rows-only
def b175_ivfpq_observed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b175's accuracy as a driver-visible RESULT (VERDICT r7 item 7):
    per query, how many of the composed IVF-PQ top-{TOP_K} appear in
    the EXACT L2 top-{TOP_K} — (query_id, n_hits, recall_ppm), one row
    per query vector.  The b30_ann_*_observed twins surface recall as
    an observe() metric riding the ANN rows; this emits it as the rows
    themselves so the driver window records the composition's quality
    every time it runs, not only when pytest does.

    Deterministic despite measuring an approximation: both top-k sets
    are unique (distance ties broken by neighbor_id on both sides) and
    every emitted number is an integer — hit counts and ppm of a fixed
    denominator — so rows-only is a choice about SQL expressibility
    (replaying PQ in DuckDB would test DuckDB), not about stability.
    tests/test_llmops.py bounds the corpus-wide mean recall from below
    by the probed-fraction baseline the b175 docstring derives.

    Engine shape: b175's own plan plus ONE broadcast-queries exact
    pass (the same ~10-query probe-sample trick as ann_with_recall —
    always affordable at scale because the query side, not the corpus,
    is the small side) and a {TOP_K}·N_QUERIES-row join; nothing here
    touches the corpus a second time beyond that exact probe scan."""
    return _ivfpq_recall(spark, sf_dir)


#: Deterministic md5 corpus sample for the sampled recall probe:
#: SAMPLE_TAKE of SAMPLE_BUCKETS hash buckets of vec_id (25% at test
#: scale so every query keeps >= TOP_K sampled candidates; at
#: production scale the same two constants express 1/100).
SAMPLE_BUCKETS = 16
SAMPLE_TAKE = 4


@query("b175_ivfpq_observed_sampled")  # measured recall on a sample → rows-only
def b175_ivfpq_observed_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b175_ivfpq_observed's production form (VERDICT r8 item 6): the
    exact-L2 ground-truth probe is LINEAR in the corpus by definition
    — it computes ground truth — so at 100 TB the recall measurement
    runs on a deterministic md5 CORPUS SAMPLE (SAMPLE_TAKE of
    SAMPLE_BUCKETS vec_id hash buckets here; 1/100 at production scale
    is the same two constants).  Both sides of the comparison are
    restricted to the same sample — the IVF-PQ candidate set AND the
    exact probe — so recall@K of the sampled subproblem is an unbiased
    estimator of index quality, while the probe's cost drops from
    |corpus|·|queries| to |sample|·|queries|.  The index artifacts
    (centroids, codebooks) still come from the FULL corpus, exactly
    like the production index being measured.

    Rows-only for the same reason as the full twin (replaying PQ in
    DuckDB would test DuckDB, not the engine); tests/test_llmops.py
    pins the same probed-fraction recall lower bound on the sampled
    measurement, and SCALE.md records the 16x probe showing the exact
    side now scales with the sample, not the corpus."""
    from .sampling import hash_bucket

    return _ivfpq_recall(
        spark,
        sf_dir,
        cand_pred=hash_bucket(F.col("vec_id"), SAMPLE_BUCKETS) < SAMPLE_TAKE,
    )


def _ivfpq_recall(
    spark: SparkSession, sf_dir: str, cand_pred: F.Column | None = None
) -> DataFrame:
    """Recall@TOP_K of the IVF-PQ composition vs the exact-L2 top-k,
    both sides restricted to the same ``cand_pred`` candidate set when
    given (queries always come from the full table)."""
    ann = _ivfpq_topk(spark, sf_dir, cand_pred).select("query_id", "neighbor_id")
    full = table(spark, sf_dir, "embeddings")
    e = full if cand_pred is None else full.filter(cand_pred)
    q = full.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sq_l2("qe", "ce").alias("d2"))
    )
    w = W.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    return (
        ann.join(exact, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits") * F.lit(1_000_000) / F.lit(TOP_K))
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )


# ------------------------------------------- random projection (JL)

JL_OUT_DIMS = 16  # projected dimensionality (64 → 16)
JL_IN_DIMS = 64


def _jl_signs(j: int) -> list[int]:
    """Rademacher ±1 row j of the projection matrix, derived from
    md5(f"{j}_{i}") first-nibble parity — the b130 slice-split trick.
    Python's hashlib md5 is the same function both engines expose, so
    these driver-side literals equal the oracle's SQL-computed signs;
    the oracle recomputes them IN DuckDB to prove that derivation."""
    import hashlib

    return [
        1 if hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0] < "8" else -1
        for i in range(JL_IN_DIMS)
    ]


def _jl_oracle() -> str:
    cols = ",\n           ".join(
        f"CAST(max(CASE WHEN j = {j} THEN y END) AS BIGINT) AS y{j:02d}"
        for j in range(JL_OUT_DIMS)
    )
    return f"""
    WITH xq AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS xp
      FROM embeddings),
    sgn AS (
      SELECT j, i,
             CASE WHEN substr(md5(CAST(j AS VARCHAR) || '_'
                              || CAST(i AS VARCHAR)), 1, 1) < '8'
                  THEN 1 ELSE -1 END AS s
      FROM range({JL_OUT_DIMS}) t1(j), range({JL_IN_DIMS}) t2(i)),
    proj AS (
      SELECT xq.vec_id, xq.label, sgn.j,
             sum(sgn.s * xq.xp[CAST(sgn.i + 1 AS INTEGER)]) AS y
      FROM xq, sgn GROUP BY 1, 2, 3)
    SELECT vec_id, label,
           {cols}
    FROM proj GROUP BY vec_id, label
    """


@query("b154_jl_projection", oracle=_jl_oracle())
def b154_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→16 with a
    Rademacher ±1 matrix (Achlioptas 2003, "Database-friendly random
    projections") — the dimensionality cut an ANN/clustering pipeline
    takes before index build when vectors are wide.  Inputs are
    quantized to integer ppm first (b56's exact f32→f64→round recipe),
    so each projected component is a pure ±1 integer dot product —
    exact, order-independent, and identical across engines; the
    conventional 1/√k rescale is a downstream scalar that would only
    reintroduce float repr, so it is deliberately not applied here.
    Distance preservation is pinned in tests/test_llmops.py.

    Engine shape — ROUND-13 OPTIMIZATION (guide §4.2): one narrow
    zero-shuffle pass, as before, but the per-row work moved from 16
    aggregate(zip_with(...)) Catalyst folds to ONE int64 numpy matmul
    per Arrow batch.  Higher-order-function lambdas are
    CodegenFallback — every one of the 16×64 multiply-adds per row
    ran interpreted, which is exactly the engine's own
    simhash/repetition finding (SCALE.md: 15–25× for hash-once +
    numpy over HOF folds); measured here 2.25 s → ~0.4 s at sf0.1
    with a bit-identical result.  Exactness is preserved because
    every step is integer after quantization: the ppm quantizer
    replays Spark's round(double) = BigDecimal HALF_UP (away from
    zero, computed as floor(y+0.5)/ceil(y−0.5) — exact for these
    ≤44-bit-significand products, boundary-planted in
    tests/test_llmops.py), and the ±1 projection is an int64 matmul
    — order-free, overflow-free (|y| ≤ 64·2³⁰ ≪ 2⁶³).  The oracle
    still derives the same signs via md5 in SQL and replays the dot
    products through an explode-join — proving the numpy constant
    matrix IS the md5 derivation, not a copied constant."""
    e = table(spark, sf_dir, "embeddings")
    # lift_parallelism: the projection is CPU-bound and narrow; on a
    # 2-split local scan it serialized on 2 cores (3.1x at the 16x
    # probe, ~1x after)
    base = lift_parallelism(e, "vec_id").select(
        "vec_id", "label", "embedding"
    )
    schema = "vec_id long, label int, " + ", ".join(
        f"y{j:02d} long" for j in range(JL_OUT_DIMS)
    )
    return base.mapInPandas(_jl_project_batches, schema=schema)


def np_round_half_up(y):
    """Exact numpy replay of Spark's round(double) — BigDecimal
    ROUND_HALF_UP, i.e. half away from zero — for |y| < 2⁵²: y−floor(y)
    (resp. y−ceil(y)) is exactly representable there, so the half
    comparison is performed on the true fractional part rather than
    through a rounding-contaminated y+0.5.  (floor(y+0.5) misrounds
    when y sits within one sum-ulp below k+0.5; this form cannot.)"""
    import numpy as np

    kf = np.floor(y)
    pos = kf + (y - kf >= 0.5)
    kc = np.ceil(y)
    neg = kc - (y - kc <= -0.5)
    return np.where(y >= 0, pos, neg)


def _jl_project_batches(batches):
    """mapInPandas worker for b154: ppm-quantize (exact HALF_UP replay
    of Spark's round(double)) then project through the 16×64
    Rademacher matrix as one int64 matmul.  Module-level so cloudpickle
    ships it by reference; the sign matrix is built once per task
    (guide §4.5)."""
    import numpy as np
    import pandas as pd

    signs = np.asarray(
        [_jl_signs(j) for j in range(JL_OUT_DIMS)], dtype=np.int64
    )  # (16, 64)

    for pdf in batches:
        if len(pdf) == 0:
            cols = {"vec_id": [], "label": []}
            cols.update({f"y{j:02d}": [] for j in range(JL_OUT_DIMS)})
            yield pd.DataFrame(cols)
            continue
        x = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
        )  # float32 values upcast exactly, (n, 64)
        y = x * 1_000_000.0  # ≤44-bit significands — exact in f64
        q = np_round_half_up(y).astype(np.int64)
        proj = q @ signs.T  # (n, 16) exact int64
        out = {"vec_id": pdf["vec_id"].values, "label": pdf["label"].values}
        for j in range(JL_OUT_DIMS):
            out[f"y{j:02d}"] = proj[:, j]
        yield pd.DataFrame(out)


# ------------------------------------- late interaction (MaxSim)

MAXSIM_QUERIES = 5  # query vectors: the lowest vec_ids
MAXSIM_SUB = 4  # sub-vectors per embedding (64 dims → 4 × 16)
MAXSIM_TOP_K = 10


def _maxsim_oracle() -> str:
    def cos(qi: int, dj: int) -> str:
        qa, qb = 16 * qi + 1, 16 * (qi + 1)
        da, db = 16 * dj + 1, 16 * (dj + 1)
        return (
            f"list_cosine_similarity(q.embedding[{qa}:{qb}]::DOUBLE[],"
            f" c.embedding[{da}:{db}]::DOUBLE[])"
        )

    per_i = " + ".join(
        "greatest(" + ", ".join(cos(i, j) for j in range(MAXSIM_SUB)) + ")"
        for i in range(MAXSIM_SUB)
    )
    return f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
             CAST(round(1000000 * ({per_i})) AS BIGINT) AS maxsim_micro
      FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {MAXSIM_QUERIES})
    SELECT query_id, doc_id, maxsim_micro, CAST(rnk AS INTEGER) AS rnk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY maxsim_micro DESC, doc_id) AS rnk FROM scored)
    WHERE rnk <= {MAXSIM_TOP_K}
    """


@query("b162_maxsim_late_interaction", oracle=_maxsim_oracle())
def b162_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (MaxSim) retrieval scoring — the ColBERT
    operator (Khattab & Zaharia 2020): treat each embedding as 4
    sub-vectors of 16 dims (the multi-vector stand-in this corpus
    affords), score(q, d) = Σᵢ maxⱼ cos(qᵢ, dⱼ), and rank the corpus
    per query.  The sum runs over a FIXED i-order and rounds once to
    integer micro, so ranking and tie-breaks are cross-engine exact —
    the first late-interaction operator in the registry, next to
    single-vector b30 and token-level b150.

    Engine shape — ROUND-13 OPTIMIZATION (guide §4.2): the corpus
    still never shuffles for scoring and the per-query top-k still
    carries Partial+Final WindowGroupLimit, but the 16 sub-cosines per
    pair moved from a Catalyst expression tree (HOF folds +
    per-evaluation F.slice array allocations — CodegenFallback,
    interpreted) into ONE Arrow-batched numpy pass that scores all
    {MAXSIM_QUERIES} queries per corpus batch (measured 1.9 s →
    ~0.45 s at sf0.1, hash-identical).  The query set is a bounded
    driver hop (the b137/b175 pattern — {MAXSIM_QUERIES} rows, same
    class as b30's broadcast).  Exactness: every float op replays the
    JVM expression in the same order — sequential left-to-right
    accumulation for dots/norms (vectorized ACROSS rows, ordered
    within), the same clamp and NaN/zero-norm→NULL guards
    (functions/vector.py::cosine semantics: np.fmax skips NaN exactly
    as F.greatest skips NULL), and np_round_half_up replaying
    round(double) — so the emitted micro scores are bit-identical and
    the DuckDB oracle hash is unchanged.  At real multi-vector scale
    the inner max runs per (query-token, doc) over an IVF-pruned
    candidate set — same plan with a cell equi-join in front."""
    e = table(spark, sf_dir, "embeddings")
    qrows = sorted(
        e.filter(F.col("vec_id") < MAXSIM_QUERIES)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    c = lift_parallelism(e, "vec_id").select("vec_id", "embedding")
    scored = c.mapInPandas(
        _maxsim_score_batches(
            [r.vec_id for r in qrows], [list(r.embedding) for r in qrows]
        ),
        schema="query_id long, doc_id long, maxsim_micro long",
    ).filter(F.col("doc_id") != F.col("query_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("maxsim_micro"), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= MAXSIM_TOP_K)
    )


def _maxsim_score_batches(query_ids, query_vecs):
    """mapInPandas factory for b162: per corpus batch, score every
    query against every row with the MaxSim sum Σᵢ maxⱼ cos(qᵢ, cⱼ)
    over 4×16-dim sub-vectors.  Bit-exact replay of the former JVM
    expression tree: dots and norms accumulate sequentially
    left-to-right within each 16-dim slice (vectorized across rows
    only), cosine applies the same zero-den/NaN→NULL guard and ±1
    clamp as functions/vector.py::cosine (NULL carried as NaN;
    np.fmax skips NaN exactly as F.greatest skips NULL, and a
    NaN best_i poisons the sum exactly as NULL addition does), and
    np_round_half_up replays round(double).  Closure state (query
    matrix, sub-norms) is built once per task (guide §4.5)."""
    import numpy as np
    import pandas as pd

    qids = np.asarray(query_ids, dtype=np.int64)
    qm = np.asarray(query_vecs, dtype=np.float64)  # (nq, 64), exact upcast

    def _seq_dot(a, b):
        # sequential fold: acc = (…(0 + a₀b₀) + a₁b₁…) — JVM order
        acc = np.zeros(a.shape[:-1])
        for k in range(a.shape[-1]):
            acc = acc + a[..., k] * b[..., k]
        return acc

    qsub = qm.reshape(len(qids), MAXSIM_SUB, 16)
    qnorm = np.sqrt(_seq_dot(qsub, qsub))  # (nq, 4)

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    {"query_id": [], "doc_id": [], "maxsim_micro": []}
                )
                continue
            cm = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )  # (n, 64)
            csub = cm.reshape(n, MAXSIM_SUB, 16)
            cnorm = np.sqrt(_seq_dot(csub, csub))  # (n, 4)
            per = None
            for i in range(MAXSIM_SUB):
                best = None
                for j in range(MAXSIM_SUB):
                    d = _seq_dot(
                        np.broadcast_to(qsub[:, None, i, :], (len(qids), n, 16)),
                        np.broadcast_to(csub[None, :, j, :], (len(qids), n, 16)),
                    )
                    den = qnorm[:, None, i] * cnorm[None, :, j]
                    with np.errstate(invalid="ignore", divide="ignore"):
                        r = d / den
                        cosv = np.where(
                            (den != 0.0) & ~np.isnan(r),
                            np.maximum(-1.0, np.minimum(1.0, r)),
                            np.nan,  # NULL stand-in
                        )
                    best = cosv if best is None else np.fmax(best, cosv)
                per = best if per is None else per + best
            y = 1_000_000.0 * per  # (nq, n)
            micro = np_round_half_up(y)
            nq = len(qids)
            flat = micro.reshape(-1)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "doc_id": np.tile(
                        pdf["vec_id"].values.astype(np.int64), nq
                    ),
                    "maxsim_micro": (
                        flat.astype(np.int64)
                        if not np.isnan(flat).any()
                        else pd.array(
                            [None if np.isnan(v) else int(v) for v in flat],
                            dtype="Int64",
                        )
                    ),
                }
            )

    return gen


# --------------------------------------------- kNN label prediction

KNN_VOTE_K = 5
KNN_VOTE_QUERIES = 20  # the lowest vec_ids are held out as the "test set"


@query(
    "b172_knn_label_vote",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id < {KNN_VOTE_QUERIES}),
    c AS (SELECT vec_id, embedding, label FROM embeddings
          WHERE vec_id >= {KNN_VOTE_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, q.label AS true_label,
             c.label AS neighbor_label,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY CAST(round(1000000 * list_cosine_similarity(
                          q.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                          AS BIGINT) DESC,
                        c.vec_id) AS rnk
      FROM q JOIN c ON true),
    votes AS (
      SELECT query_id, true_label, neighbor_label,
             CAST(count(*) AS BIGINT) AS n_votes
      FROM scored WHERE rnk <= {KNN_VOTE_K}
      GROUP BY 1, 2, 3),
    pick AS (
      SELECT query_id, true_label, neighbor_label AS predicted, n_votes,
             row_number() OVER (PARTITION BY query_id
               ORDER BY n_votes DESC, neighbor_label) AS p
      FROM votes)
    SELECT query_id, CAST(true_label AS INTEGER) AS true_label,
           CAST(predicted AS INTEGER) AS predicted, n_votes,
           predicted = true_label AS correct
    FROM pick WHERE p = 1
    """,
)
def b172_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction by neighbor majority vote — the
    weak-supervision / label-propagation primitive (and the standard
    embedding-quality probe: if neighbors can't predict the label, the
    space is noise).  The {KNN_VOTE_QUERIES} lowest ids are held out;
    each is scored against the rest, its top-{KNN_VOTE_K} neighbors
    vote, ties break on the smaller label — every step integer- or
    order-deterministic, so the whole classifier is exact-oracled.
    The neighbor rank orders on INTEGER micro-cosine (not the raw
    double): a 1-ulp cross-engine skew at a near-tie would flip a
    neighbor in/out of the vote set (ADVICE r6; the b147/b149/b162
    integer-decision-predicate rule), micro ties resolve on vec_id.

    Engine shape: b30's broadcast-query scoring (the corpus never
    shuffles), per-query rank windows carrying Partial+Final
    WindowGroupLimit, then two query-count-sized aggregations.  At
    scale the scoring join swaps in the IVF/LSH candidate pruning
    (b30_ann_*) with the identical vote tail."""
    from ..functions.vector import cosine

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < KNN_VOTE_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("embedding").alias("qe"),
    )
    c = lift_parallelism(
        e.filter(F.col("vec_id") >= KNN_VOTE_QUERIES), "vec_id"
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("embedding").alias("ce"),
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("mcos"), "neighbor_id")
    votes = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "mcos",
            F.round(F.lit(1_000_000) * cosine("qe", "ce")).cast("bigint"),
        )
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= KNN_VOTE_K)
        .groupBy("query_id", "true_label", "neighbor_label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_votes"))
    )
    wp = W.partitionBy("query_id").orderBy(
        F.desc("n_votes"), "neighbor_label"
    )
    return (
        votes.withColumn("p", F.row_number().over(wp))
        .filter(F.col("p") == 1)
        .select(
            "query_id",
            F.col("true_label").cast("int").alias("true_label"),
            F.col("neighbor_label").cast("int").alias("predicted"),
            "n_votes",
            (F.col("neighbor_label") == F.col("true_label")).alias("correct"),
        )
    )
