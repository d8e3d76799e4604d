"""Similarity search over the embeddings table (vec_id, embedding
array<float>, label).

The reference delegates ANN to vector DBs (lance_retrieval.py:104-166);
here both the brute-force baseline and the IVF scale path are native
Spark plans:

- ``knn_cosine``: exact cosine top-k against a query vector — the
  query vector is broadcast as a literal array; the dot product runs
  JVM-side via ``aggregate(zip_with(...))`` (no Python in the loop);
  TakeOrderedAndProject does the distributed top-k.
- ``ann_ivf``: IVF-style — centroid per ``label`` (posexplode +
  groupBy(label, dim) avg), probe the nearest centroid, search only
  that cluster (at scale: partition/bucket the table by cluster id so
  probing prunes partitions).

Scores exported as micro-BIGINTs for cross-engine hash stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from embedanything_spark.operators.docops import load, micro

QUERY_VEC_ID = 0  # fixed demo query vector


def _cosine(a, b) -> F.Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (load(spark, sf_dir, "embeddings")
           .filter(F.col("vec_id") == QUERY_VEC_ID)
           .select("embedding").collect()[0])
    return [float(x) for x in row["embedding"]]


def knn_cosine(spark, sf_dir) -> DataFrame:
    """Exact cosine top-10 vs the fixed query vector (excluding it)."""
    q = F.array(*[F.lit(x) for x in _query_vec(spark, sf_dir)])
    emb = load(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (emb.filter(F.col("vec_id") != QUERY_VEC_ID)
            .select("vec_id", micro(_cosine(e, q)).alias("cos_micro"))
            .orderBy(F.desc("cos_micro"), F.asc("vec_id"))
            .limit(10))


def ann_ivf(spark, sf_dir) -> DataFrame:
    """IVF probe: label-centroids → nearest centroid → in-cluster
    exact top-10. Returns the same schema as knn_cosine."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label",
        F.posexplode(F.transform("embedding",
                                 lambda x: x.cast("double")))
        .alias("dim", "v"))
    cents = (dims.groupBy("label", "dim").agg(F.avg("v").alias("c"))
             .groupBy("label")
             .agg(F.array_sort(F.collect_list(F.struct("dim", "c")))
                  .alias("s"))
             .select("label", F.transform("s", lambda x: x["c"])
                     .alias("centroid")))
    q = F.array(*[F.lit(x) for x in _query_vec(spark, sf_dir)])
    best = (cents.select("label", _cosine(F.col("centroid"), q)
                         .alias("cc"))
            .orderBy(F.desc("cc"), F.asc("label")).limit(1)
            .collect()[0]["label"])
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (emb.filter((F.col("label") == int(best)) &
                       (F.col("vec_id") != QUERY_VEC_ID))
            .select("vec_id", micro(_cosine(e, q)).alias("cos_micro"))
            .orderBy(F.desc("cos_micro"), F.asc("vec_id"))
            .limit(10))
