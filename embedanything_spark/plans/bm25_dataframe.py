"""DataFrame-only BM25 pipeline — the minimum end-to-end slice (SURVEY.md §7.4).

No custom index: pure Catalyst plan establishing the scoring expression
and correctness before the posting-list engine exists. This is the
declarative restatement of the reference's SPLADE path — per-chunk term
weights (``rust/src/embeddings/local/bert.rs:361-400``) become exact
TF×IDF statistics computed by distributed aggregation:

    explode(tokenize(text)) → groupBy(doc,term).count  [tf]
    groupBy(term).count                                 [df → idf]
    groupBy(doc).sum(tf)                                [doclen, avgdl]
    broadcast(query terms) ⋈ dictionary ⋈ postings →
    BM25 expression → per-query top-k (row_number window)

Everything is Catalyst built-ins: partial+final hash aggregation gives
map-side combine on the hot Zipf head terms for free; the query-term
and dictionary joins broadcast; the final top-k is a tiny window over
50 query groups.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from embedanything_spark import B, K1
from embedanything_spark.analyzer import tokenize_udf
from embedanything_spark.operators.doc_ids import zip_with_index


@dataclass
class CorpusStats:
    """Materialized corpus statistics (the 'index' of the no-index plan)."""
    docmap: DataFrame        # doc_id, conv_id, turn_idx
    doc_stats: DataFrame     # doc_id, doclen
    postings: DataFrame      # term, doc_id, tf
    dictionary: DataFrame    # term, df, cf
    n_docs: int
    avgdl: float


def tokenized_docs(transcripts: DataFrame,
                   num_partitions: int | None = None) -> DataFrame:
    """(doc_id, conv_id, turn_idx, tokens) with stable dense doc_ids."""
    docs = zip_with_index(
        transcripts.select("conv_id", "turn_idx", "text"),
        ["conv_id", "turn_idx"], num_partitions=num_partitions)
    return docs.select("doc_id", "conv_id", "turn_idx",
                       tokenize_udf("text").alias("tokens"))


def build_stats(transcripts: DataFrame,
                num_partitions: int | None = None) -> CorpusStats:
    docs = tokenized_docs(transcripts, num_partitions).persist()
    docmap = docs.select("doc_id", "conv_id", "turn_idx")
    doc_stats = docs.select(
        "doc_id", F.size("tokens").alias("doclen"))
    postings = (docs
                .select("doc_id", F.explode("tokens").alias("term"))
                .groupBy("doc_id", "term")
                .agg(F.count("*").alias("tf")))
    dictionary = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf"))
    g = doc_stats.agg(F.count("*").alias("n"),
                      F.avg("doclen").alias("avgdl")).collect()[0]
    return CorpusStats(docmap=docmap, doc_stats=doc_stats,
                       postings=postings, dictionary=dictionary,
                       n_docs=int(g["n"]), avgdl=float(g["avgdl"] or 0.0))


def bm25_contrib(tf_col, df_col, dl_col, n_docs: int, avgdl: float):
    """Okapi BM25 per-(doc,term) contribution as a Catalyst expression.
    Lucene idf = ln(1 + (N - df + 0.5)/(df + 0.5)); k1=1.2, b=0.75."""
    idf = F.log(F.lit(1.0) +
                (F.lit(float(n_docs)) - df_col + F.lit(0.5)) /
                (df_col + F.lit(0.5)))
    denom = tf_col + F.lit(K1) * (F.lit(1.0 - B) +
                                  F.lit(B) * dl_col / F.lit(avgdl))
    return idf * (tf_col * F.lit(K1 + 1.0)) / denom


def score_queries(spark: SparkSession, stats: CorpusStats,
                  queries: pd.DataFrame) -> DataFrame:
    """Top-k per query: (query_id, rank, doc_id, conv_id, turn_idx, score).

    Query relation is tiny → exploded to distinct (query_id, term, k)
    and broadcast against the dictionary, then against postings
    (equi-join on term). Tie-break (score DESC, doc_id ASC).
    """
    qdf = spark.createDataFrame(queries[["query_id", "query_text", "k"]])
    qterms = (qdf
              .select("query_id", "k",
                      F.explode(tokenize_udf("query_text")).alias("term"))
              .dropDuplicates(["query_id", "term"]))  # query tf weight = 1
    qdict = F.broadcast(
        qterms.join(stats.dictionary, "term", "inner"))
    contribs = (stats.postings.join(qdict, "term")
                .join(stats.doc_stats, "doc_id")
                .select("query_id", "k", "doc_id",
                        bm25_contrib(F.col("tf").cast("double"),
                                     F.col("df").cast("double"),
                                     F.col("doclen").cast("double"),
                                     stats.n_docs, stats.avgdl)
                        .alias("contrib")))
    scored = contribs.groupBy("query_id", "k", "doc_id").agg(
        F.sum("contrib").alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .join(stats.docmap, "doc_id")
            .select("query_id", "rank", "doc_id", "conv_id",
                    "turn_idx", "score")
            .orderBy("query_id", "rank"))
