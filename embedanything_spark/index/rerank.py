"""Cross-encoder reranking stage over top-k candidates.

Mirrors the reference's rerank path (`rust/src/reranker/model.rs`):
take the retriever's top-k, score every (query, doc) PAIR with a
cross-model in batches (`:151-166` pair building, `:216-241` batched
scores + sigmoid), then reassemble ranks (`DocumentRank`, `:244-276`).

The Spark restatement: candidates join back to docmap text → Arrow-
batched pandas UDF scores the pairs → row_number window reassigns
ranks with the same deterministic tie-break. The CROSS-ENCODER KERNEL
IS A STUB (deterministic token-overlap + md5 jitter — the container
has no model runtime); swap ``_cross_score_batch`` for an ONNX/torch
call and nothing else changes. The plumbing (pair batching, sigmoid,
rank assembly, ordering) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from embedanything_spark.analyzer import tokenize

_PAIR_SCHEMA = ("query_id int, doc_id long, conv_id string, "
                "turn_idx int, score double, rerank_score double")


def _cross_score_batch(queries: pd.Series, texts: pd.Series) -> np.ndarray:
    """STUB cross-encoder: deterministic overlap logit → sigmoid.
    Real impl: tokenizer + cross-encoder forward per Arrow batch
    (exactly the reference's ort batch loop, model.rs:216-241)."""
    out = np.empty(len(queries), dtype=np.float64)
    for i, (q, t) in enumerate(zip(queries, texts)):
        qt, tt = set(tokenize(q)), set(tokenize(t or ""))
        overlap = len(qt & tt) / max(len(qt), 1)
        h = hashlib.md5(f"{q}\x00{t}".encode()).digest()
        jitter = int.from_bytes(h[:4], "little") / 2**32
        logit = 4.0 * overlap - 2.0 + 0.1 * jitter
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
