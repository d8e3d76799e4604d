"""Semantic chunkers: conservation invariants (chunks tile the window
sequence exactly; token counts are conserved) and the engine-path
BM25 equals the index-less DataFrame plan row-for-row."""

import pandas as pd
from pyspark.sql import functions as F

from embedanything_spark.operators import chunkers, docops

SF_DIR = "/root/testdata/sf0.001"


def _token_windows(spark):
    docs = docops.load(spark, SF_DIR, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.filter(F.split(F.lower("text"), " "),
                              lambda x: x != "")).alias("pos", "term"))
    return (toks.withColumn("win_id", (F.col("pos") / 10).cast("long"))
            .groupBy("doc_id")
            .agg(F.countDistinct("win_id").alias("n_windows"),
                 F.count("*").alias("n_tokens")).toPandas())


def _check_partition(spark, chunks_pdf):
    ref = _token_windows(spark)
    got = (chunks_pdf.groupby("doc_id")
           .agg(n_windows=("n_windows", "sum"),
                n_tokens=("n_tokens", "sum"),
                n_chunks=("chunk_id", "count"),
                first=("chunk_id", "min")).reset_index())
    m = ref.merge(got, on="doc_id", how="outer", suffixes=("_r", "_g"))
    assert not m.isna().any().any()  # same doc set
    assert (m["n_windows_r"] == m["n_windows_g"]).all()
    assert (m["n_tokens_r"] == m["n_tokens_g"]).all()
    assert (m["first"] == 1).all()  # chunk ids start at 1 per doc
    assert (got["n_chunks"] >= 1).all()


def test_statistical_chunk_partitions_windows(spark):
    pdf = chunkers.statistical_chunk(spark, SF_DIR).toPandas()
    _check_partition(spark, pdf)
    # budget: subdivision count always covers the token count
    assert (pdf["n_subchunks"] * chunkers.MAX_CHUNK_TOKENS
            >= pdf["n_tokens"]).all()
    # threshold actually splits: more chunks than docs overall
    assert len(pdf) > pdf["doc_id"].nunique()


def test_cumulative_chunk_partitions_windows(spark):
    pdf = chunkers.cumulative_chunk(spark, SF_DIR).toPandas()
    _check_partition(spark, pdf)


def test_chunk_ids_contiguous(spark):
    pdf = chunkers.statistical_chunk(spark, SF_DIR).toPandas()
    for _, g in pdf.groupby("doc_id"):
        ids = sorted(g["chunk_id"])
        assert ids == list(range(1, len(ids) + 1))


def test_engine_equals_dataframe_bm25(spark):
    """bm25_topk (index-less Catalyst plan) and bm25_topk_indexed
    (posting-list engine + WAND) must agree row-for-row."""
    a = docops.bm25_topk(spark, SF_DIR).toPandas()
    b = docops.bm25_topk_indexed(spark, SF_DIR).toPandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))
