"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Three operators:

- brute-force cosine top-k: the exact baseline — crossJoin of a tiny
  broadcast query set against the corpus, cosine fully JVM-side
  (zip_with/aggregate), per-query top-k via window. At 100 TB the
  corpus side stays partitioned; only the query set is broadcast, so
  the scan parallelizes perfectly with no shuffle until the (tiny)
  top-k aggregation.
- IVF top-k: the scale path — a coarse quantizer (per-label centroids
  here; k-means centroids in production) prunes the corpus to nprobe
  partitions before the exact search. At 100 TB this turns a full scan
  into a ~nprobe/nlist fraction scan, the standard ANN trade.
- embedding near-dup pairs: cosine ≥ threshold within coarse blocks
  (label blocking = the IVF cells), for embedding-level dedup.

All three have exact DuckDB oracles (list_cosine_similarity on
DOUBLE[] matches the JVM fold bit-for-bit at 2-decimal rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from reair_spark.datapipe.common import cosine, widen
from reair_spark.io import load_table as _t

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors
N_PROBE = 2
NEARDUP_COS = 0.99

_COS_SQL = "list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    e = widen(_t(spark, sf, "embeddings"), spark)
    return e.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"), "label")


def ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exact top-k neighbors for each query vector (vec_id < 5),
    excluding self. Query side broadcast; corpus side never shuffled
    until the final per-query top-k."""
    e = _emb(spark, sf)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    sim = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("qemb"), F.col("emb")).alias("sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "sim")
    )


def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: per-label centroids are the coarse quantizer;
    each query probes its nprobe nearest cells and brute-forces only
    those. Centroids are computed as per-dimension averages via
    posexplode + groupBy — one shuffle of (label, dim) pairs, i.e.
    64×nlist rows regardless of corpus size."""
    e = _emb(spark, sf)
    dims = e.select("vec_id", "label", F.posexplode("emb").alias("pos", "v"))
    cent = dims.groupBy("label", "pos").agg(F.avg("v").alias("c"))

    qdims = dims.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("v").alias("q")
    )
    # cosine(query, centroid) via per-dim join on pos — no array reassembly
    qc = (
        qdims.join(cent, "pos")
        .groupBy("query_id", "label")
        .agg(
            (
                F.sum(F.col("q") * F.col("c"))
                / (F.sqrt(F.sum(F.col("q") * F.col("q"))) * F.sqrt(F.sum(F.col("c") * F.col("c"))))
            ).alias("csim")
        )
    )
    wprobe = W.partitionBy("query_id").orderBy(F.desc("csim"), "label")
    probed = (
        qc.withColumn("pr", F.row_number().over(wprobe))
        .where(F.col("pr") <= N_PROBE)
        .select("query_id", "label")
    )

    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    cand = e.join(F.broadcast(probed), "label").where(F.col("vec_id") >= N_QUERIES)
    sim = cand.join(F.broadcast(q), "query_id").select(
        "query_id", "vec_id", cosine(F.col("qemb"), F.col("emb")).alias("sim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), "vec_id")
    return (
        sim.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "sim")
    )


def embedding_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-level near-dup pairs: cosine ≥ 0.99 within label
    blocks. The corpus is documents' embeddings ∪ deterministically
    perturbed copies (vec_id % 10 == 0 → +1_000_000, each dim scaled by
    1 + 0.01·((i mod 5) − 2)), planting known positives. Label blocking
    bounds the pair space to within-cell pairs — the same cells IVF
    uses, so at 100 TB this is nlist independent block self-joins."""
    e = _emb(spark, sf)
    perturbed = e.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "emb", lambda x, i: x * (1.0 + 0.01 * ((i % 5).cast("double") - 2.0))
        ).alias("emb"),
        "label",
    )
    c = e.union(perturbed)
    a = c.select(
        F.col("vec_id").alias("id_a"), F.col("emb").alias("ea"), F.col("label").alias("label")
    )
    b = c.select(
        F.col("vec_id").alias("id_b"), F.col("emb").alias("eb"), F.col("label").alias("label")
    )
    return (
        a.join(b, "label")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("ea"), F.col("eb")).alias("cos_sim"))
        .where(F.col("cos_sim") >= NEARDUP_COS)
    )


SIM_QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_neardup": embedding_neardup,
}

_NEARDUP_CORPUS_SQL = """
SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb, label FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id,
       list_transform(range(1, 65),
                      i -> CAST(embedding[i] AS DOUBLE) * (1.0 + 0.01 * (((i - 1) % 5) - 2.0))),
       label
FROM embeddings WHERE vec_id % 10 = 0
"""

SIM_ORACLES = {
    "ann_cosine_topk": f"""
SELECT query_id, vec_id, sim FROM (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         {_COS_SQL.format(a='q.embedding', b='e.embedding')} AS sim,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {_COS_SQL.format(a='q.embedding', b='e.embedding')} DESC,
                                     e.vec_id) AS rn
  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
) t WHERE rn <= {TOP_K}
""",
    "ann_ivf_topk": f"""
WITH dims AS (
  SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
),
cent AS (SELECT label, pos, avg(v) AS c FROM dims GROUP BY label, pos),
qc AS (
  SELECT d.vec_id AS query_id, cent.label,
         sum(d.v * cent.c) / (sqrt(sum(d.v * d.v)) * sqrt(sum(cent.c * cent.c))) AS csim
  FROM dims d JOIN cent ON d.pos = cent.pos
  WHERE d.vec_id < {N_QUERIES}
  GROUP BY d.vec_id, cent.label
),
probed AS (
  SELECT query_id, label FROM (
    SELECT query_id, label,
           row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, label) AS pr
    FROM qc) p
  WHERE pr <= {N_PROBE}
)
SELECT query_id, vec_id, sim FROM (
  SELECT probed.query_id, e.vec_id,
         {_COS_SQL.format(a='q.embedding', b='e.embedding')} AS sim,
         row_number() OVER (PARTITION BY probed.query_id
                            ORDER BY {_COS_SQL.format(a='q.embedding', b='e.embedding')} DESC,
                                     e.vec_id) AS rn
  FROM embeddings e
  JOIN probed ON e.label = probed.label
  JOIN embeddings q ON q.vec_id = probed.query_id
  WHERE e.vec_id >= {N_QUERIES}
) t WHERE rn <= {TOP_K}
""",
    "embedding_neardup": f"""
WITH c AS ({_NEARDUP_CORPUS_SQL})
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_cosine_similarity(a.emb, b.emb) AS cos_sim
FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.emb, b.emb) >= {NEARDUP_COS}
""",
}
