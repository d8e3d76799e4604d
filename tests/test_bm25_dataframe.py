"""End-to-end rank-identity: DataFrame-only BM25 vs the numpy oracle
(north rule: rank-identical top-k docIDs, scores rtol=1e-6)."""

import numpy as np
import pandas as pd
import pytest

from embedanything_spark.plans.bm25_dataframe import (build_stats,
                                                      score_queries)


@pytest.fixture(scope="module")
def stats(transcripts_df):
    return build_stats(transcripts_df, num_partitions=8)


def assert_rank_identical(got: pd.DataFrame, want: pd.DataFrame):
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "conv_id", "turn_idx"]],
        want[["query_id", "rank", "doc_id", "conv_id", "turn_idx"]],
        check_dtype=False)
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-6)


def test_stats_match_oracle(stats, oracle):
    assert stats.n_docs == oracle.n_docs
    assert stats.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    df_pdf = stats.dictionary.toPandas().set_index("term")["df"]
    assert df_pdf.to_dict() == oracle.df


def test_docmap_matches_oracle(stats, oracle):
    got = (stats.docmap.toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = oracle.docmap.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "conv_id", "turn_idx"]],
                                  want, check_dtype=False)


def test_rank_identity_full_query_set(spark, stats, queries_pdf,
                                      golden_topk):
    got = score_queries(spark, stats, queries_pdf).toPandas()
    assert_rank_identical(got, golden_topk)


def test_per_turn_text_roundtrip(spark, stats, transcripts_df):
    """input_hint per-row invariant: docmap join returns text equal to
    input under (conv_id, turn_idx) ordering."""
    joined = (stats.docmap
              .join(transcripts_df, ["conv_id", "turn_idx"])
              .orderBy("doc_id")
              .select("conv_id", "turn_idx", "text").toPandas())
    want = (transcripts_df.select("conv_id", "turn_idx", "text").toPandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(joined, want, check_dtype=False)
