"""Cross-encoder reranking stage over top-k candidates.

Mirrors the reference's rerank path (`rust/src/reranker/model.rs`):
take the retriever's top-k, score every (query, doc) PAIR with a
cross-model in batches (`:151-166` pair building, `:216-241` batched
scores + sigmoid), then reassemble ranks (`DocumentRank`, `:244-276`).

The Spark restatement: candidates join back to docmap text → Arrow-
batched pandas UDF scores the pairs → row_number window reassigns
ranks with the same deterministic tie-break. The kernel is a REAL
classical lexical cross-scorer — query-term coverage, BM25-style tf
saturation, and an exact-phrase interaction feature, combined through
a sigmoid like the reference's logit path (model.rs:239). These are
genuine query×document interaction features (the cross-encoder
family's defining property), computable without a model runtime; a
NEURAL cross-encoder (ONNX/torch forward per Arrow batch, model.rs:
216-241) swaps in at the same ``_cross_score_batch`` seam and nothing
else changes.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from embedanything_spark.analyzer import tokenize

_PAIR_SCHEMA = ("query_id int, doc_id long, conv_id string, "
                "turn_idx int, score double, rerank_score double")

# logit weights: coverage dominates, tf saturation refines within
# full-coverage ties, exact phrase is a fixed bonus. Deterministic and
# documented so the DuckDB oracle reproduces scores bit-for-bit.
_W_COVER, _W_SAT, _W_PHRASE, _BIAS = 4.0, 2.0, 1.0, 3.0


def _cross_score_batch(queries: pd.Series, texts: pd.Series) -> np.ndarray:
    """Classical lexical cross-scorer over (query, doc) pairs:
    coverage = |q∩d| / |q|, saturation = Σ_{t∈q∩d} tf_t/(tf_t+1) / |q|
    (BM25's tf shape at k1=1), phrase = 1 if the normalized query is a
    contiguous token subsequence of the doc. sigmoid(4·cover + 2·sat
    + 1·phrase − 3)."""
    out = np.empty(len(queries), dtype=np.float64)
    for i, (q, t) in enumerate(zip(queries, texts)):
        qt = tokenize(q)
        dt = tokenize(t or "")
        quniq = sorted(set(qt))   # fixed iteration → fixed f64 order
        tf = Counter(dt)
        nq = max(len(quniq), 1)
        cover = sum(1 for w in quniq if tf[w]) / nq
        sat = sum(tf[w] / (tf[w] + 1.0) for w in quniq if tf[w]) / nq
        phrase = 1.0 if qt and \
            f" {' '.join(qt)} " in f" {' '.join(dt)} " else 0.0
        logit = (_W_COVER * cover + _W_SAT * sat +
                 _W_PHRASE * phrase - _BIAS)
        out[i] = 1.0 / (1.0 + np.exp(-logit))  # sigmoid (model.rs:239)
    return out


def rerank(results: DataFrame, queries: pd.DataFrame,
           transcripts: DataFrame, top_n: int | None = None) -> DataFrame:
    """Re-score retriever results with the cross encoder and reassign
    ranks. ``results``: (query_id, rank, doc_id, conv_id, turn_idx,
    score); returns the same shape + rerank_score, rank = new order.
    """
    spark = results.sparkSession
    qmap = spark.createDataFrame(queries[["query_id", "query_text"]])
    pairs = (results
             .join(F.broadcast(qmap), "query_id")
             .join(transcripts.select("conv_id", "turn_idx", "text"),
                   ["conv_id", "turn_idx"], "left"))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf["rerank_score"] = _cross_score_batch(
                pdf["query_text"], pdf["text"])
            yield pdf[["query_id", "doc_id", "conv_id", "turn_idx",
                       "score", "rerank_score"]]

    scored = pairs.mapInPandas(score, schema=_PAIR_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rerank_score"), F.asc("doc_id"))
    out = (scored.withColumn("rank", F.row_number().over(w))
           .select("query_id", "rank", "doc_id", "conv_id", "turn_idx",
                   "score", "rerank_score"))
    if top_n:
        out = out.filter(F.col("rank") <= top_n)
    return out.orderBy("query_id", "rank")
