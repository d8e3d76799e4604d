"""Embedding-space operators mirroring the reference's E-family
(SURVEY.md §2.3) over the embeddings/documents tables, each with an
exact DuckDB oracle in __spark_entry__:

- pool_mean (E4 mean pooling, pooling.rs:130-180): per-label masked
  mean over vectors → the first dims, micro-rounded.
- l2_normalize (E5, mod.rs:80-82): rowwise v/||v||.
- static_embed (E6 Model2Vec, model2vec.rs:17-34): token → static
  vector lookup + mean; the "vector" here is a deterministic
  md5-derived scalar per token so both engines derive it identically.
- maxsim (E10 late interaction, examples/colbert.py:38-43): treat each
  label's vector set as a multi-vector document; score = max cosine
  vs the query vector (single-token query MaxSim).
- agg_stats (A3, statistical.rs:14-41): median + stddev per group.
- cumulative (A4, statistical.rs:281-287): running token counts.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from embedanything_spark.operators.docops import hash12, load, micro
from embedanything_spark.operators.similarity import _cosine, query_vec_df


def pool_mean(spark, sf_dir):
    """Mean-pool vectors per label; export first 4 dims micro-rounded."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select("label",
                      F.posexplode(F.transform(
                          "embedding", lambda x: x.cast("double")))
                      .alias("dim", "v")).filter(F.col("dim") < 4)
    return (dims.groupBy("label", "dim")
            .agg(micro(F.avg("v")).alias("mean_micro"),
                 F.count("*").alias("n")))


def pool_cls_last(spark, sf_dir):
    """E4's other pooling modes (pooling.rs:50-128): treat each label's
    vec_id-ordered vector set as one sequence; CLS = first vector,
    LastToken = last non-pad (here: last) vector. Export dim 0 of each,
    micro-rounded."""
    emb = load(spark, sf_dir, "embeddings")
    d0 = F.element_at(F.transform("embedding",
                                  lambda x: x.cast("double")), 1)
    w = Window.partitionBy("label").orderBy("vec_id")
    wd = Window.partitionBy("label").orderBy(F.desc("vec_id"))
    return (emb.select("label", "vec_id", d0.alias("d0"))
            .withColumn("rf", F.row_number().over(w))
            .withColumn("rl", F.row_number().over(wd))
            .groupBy("label")
            .agg(micro(F.max(F.when(F.col("rf") == 1, F.col("d0"))))
                 .alias("cls_dim0_micro"),
                 micro(F.max(F.when(F.col("rl") == 1, F.col("d0"))))
                 .alias("last_dim0_micro"),
                 F.count("*").alias("n")))


def l2_normalize(spark, sf_dir):
    """Rowwise L2 normalization; export dim-0 of the unit vector."""
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    e = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda a, x: a + x * x))
    return emb.select(
        "vec_id",
        micro(F.element_at(e, 1) / norm).alias("unit_dim0_micro"))


def static_embed(spark, sf_dir):
    """Model2Vec-style static embedding: per-token scalar 'vector' from
    an md5-derived lookup, mean-pooled per doc (degenerate dictionary
    embedding — no transformer)."""
    from embedanything_spark.operators.docops import _tokens
    toks = _tokens(load(spark, sf_dir, "documents"))
    val = (hash12(F.col("term")) % F.lit(10**6)) / F.lit(10**6)
    return (toks.groupBy("doc_id")
            .agg(micro(F.avg(val)).alias("embed_micro"),
                 F.count("*").alias("n_tokens")))


def maxsim(spark, sf_dir):
    """Single-query-token MaxSim: per label (multi-vector doc), the max
    cosine of any member vector vs the query vector."""
    emb = load(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    return (emb.crossJoin(F.broadcast(query_vec_df(spark, sf_dir)))
            .select("label", _cosine(e, F.col("qv")).alias("cos"))
            .groupBy("label")
            .agg(micro(F.max("cos")).alias("maxsim_micro")))


def maxsim_multi(spark, sf_dir):
    """FULL MaxSim late interaction (E10, colbert.py:38-43): per query
    TOKEN (vectors 0..2 play the query's token vectors), take the max
    cosine over the doc's vector set (label = multi-vector doc), then
    SUM over query tokens — einsum('bnd,csd->bcns').max(3).sum(2)."""
    emb = load(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    qs = (emb.filter(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("qid"), e.alias("qv")))
    per_tok = (emb.crossJoin(F.broadcast(qs))
               .select("label", "qid",
                       _cosine(e, F.col("qv")).alias("cos"))
               .groupBy("label", "qid").agg(F.max("cos").alias("m")))
    return (per_tok.groupBy("label")
            .agg(micro(F.sum("m")).alias("maxsim_micro")))


def agg_stats(spark, sf_dir):
    """Median (continuous) + sample stddev of doc length per source."""
    docs = load(spark, sf_dir, "documents")
    return (docs.groupBy("source")
            .agg(micro(F.percentile("n_chars", F.lit(0.5)))
                 .alias("median_micro"),
                 micro(F.stddev_samp("n_chars")).alias("stddev_micro"),
                 F.count("*").alias("n")))


def cumulative_tokens(spark, sf_dir):
    """Running token count per source in doc_id order (scan/prefix-sum)."""
    from embedanything_spark.operators.docops import doc_stats
    dl = doc_stats(spark, sf_dir).join(
        load(spark, sf_dir, "documents").select("doc_id", "source"),
        "doc_id")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return dl.select("source", "doc_id",
                     F.sum("doclen").over(w).alias("running_tokens"))


def link_strip(spark, sf_dir):
    """P5 (html_processor.rs:36-38): strip markdown links, keep text."""
    docs = load(spark, sf_dir, "documents")
    stripped = F.regexp_replace(
        F.col("text"), r"\[([^\]]+)\]\([^\)]+\)", "$1")
    return docs.select("doc_id", F.length(stripped).cast("long")
                       .alias("stripped_len"))
