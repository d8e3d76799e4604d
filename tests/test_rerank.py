import numpy as np
import pandas as pd

from embedanything_spark.index.build import IndexWriter
from embedanything_spark.index.query import IndexReader
from embedanything_spark.index.rerank import _cross_score_batch, rerank


def test_kernel_deterministic_and_bounded():
    q = pd.Series(["apple pie", "apple pie"])
    t = pd.Series(["apple pie recipe", "unrelated text entirely"])
    s1 = _cross_score_batch(q, t)
    s2 = _cross_score_batch(q, t)
    np.testing.assert_array_equal(s1, s2)
    assert ((s1 > 0) & (s1 < 1)).all()
    assert s1[0] > s1[1]  # coverage dominates the logit


def test_kernel_feature_ordering():
    """phrase > scrambled > partial > none; tf saturation breaks
    full-coverage ties; closed-form check of one score."""
    q = pd.Series(["apple pie"] * 4)
    t = pd.Series(["fresh apple pie today",      # exact phrase
                   "pie of apple",               # full coverage, no phrase
                   "apple only here",            # partial coverage
                   "nothing relevant at all"])   # none
    s = _cross_score_batch(q, t)
    assert s[0] > s[1] > s[2] > s[3]
    # saturation: repeated query terms score higher at equal coverage
    r = _cross_score_batch(pd.Series(["apple pie"] * 2),
                           pd.Series(["apple pie", "apple apple pie pie"]))
    assert r[1] > r[0]
    # closed form for "pie of apple": cover=1, sat=(1/2+1/2)/2=.5,
    # phrase=0 → sigmoid(4 + 1 - 3) = sigmoid(2)
    assert abs(s[1] - 1.0 / (1.0 + np.exp(-2.0))) < 1e-12


def test_rerank_pipeline(spark, tmp_path, transcripts_df, queries_pdf):
    root = str(tmp_path / "rr_idx")
    IndexWriter(root, block_range=256, num_partitions=4).build(
        transcripts_df)
    queries = queries_pdf.head(5)
    base = IndexReader(spark, root).search(queries)
    rr = rerank(base, queries, transcripts_df, top_n=5).toPandas()
    assert set(rr.columns) == {"query_id", "rank", "doc_id", "conv_id",
                               "turn_idx", "score", "rerank_score"}
    # rank follows rerank_score desc, doc_id asc per query
    for _, g in rr.groupby("query_id"):
        g = g.sort_values("rank")
        rs = g["rerank_score"].to_numpy()
        d = g["doc_id"].to_numpy()
        for i in range(len(g) - 1):
            assert rs[i] > rs[i + 1] or (rs[i] == rs[i + 1]
                                         and d[i] < d[i + 1])
    # same candidate set as the retriever (top_n within base results)
    base_pdf = base.toPandas()
    for qid, g in rr.groupby("query_id"):
        bset = set(base_pdf[base_pdf.query_id == qid]["doc_id"])
        assert set(g["doc_id"]).issubset(bset)
