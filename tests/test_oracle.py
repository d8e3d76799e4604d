"""Oracle sanity: hand-computed BM25 on a tiny fixed corpus
(reference style: hand-computed goldens, pooling.rs:183-239)."""

import math

import numpy as np
import pandas as pd

from embedanything_spark import B, K1
from embedanything_spark.oracle import OracleIndex


def _mini():
    rows = [
        ("c0", 0, "user", "apple banana apple", None, "2026-01-01"),
        ("c0", 1, "assistant", "banana cherry", None, "2026-01-01"),
        ("c1", 0, "user", "apple", None, "2026-01-01"),
        ("c1", 1, "assistant", "", None, "2026-01-01"),
    ]
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                       "text", "tool", "ts"])


def test_hand_computed_bm25():
    idx = OracleIndex(_mini())
    # docs sorted by (conv_id, turn_idx): d0="apple banana apple",
    # d1="banana cherry", d2="apple", d3=""
    assert idx.n_docs == 4
    assert list(idx.doclen) == [3, 2, 1, 0]
    assert idx.avgdl == 1.5
    assert idx.df == {"apple": 2, "banana": 2, "cherry": 1}

    idf_apple = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    # d0: tf=2, dl=3 → 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/1.5))
    s_d0 = idf_apple * (2 * (K1 + 1)) / (2 + K1 * (1 - B + B * 3 / 1.5))
    s_d2 = idf_apple * (1 * (K1 + 1)) / (1 + K1 * (1 - B + B * 1 / 1.5))
    r = idx.score_query("apple", 10)
    assert list(r["doc_id"]) == ([2, 0] if s_d2 > s_d0 else [0, 2])
    got = dict(zip(r["doc_id"], r["score"]))
    assert np.isclose(got[0], s_d0)
    assert np.isclose(got[2], s_d2)


def test_unseen_term_empty():
    idx = OracleIndex(_mini())
    assert len(idx.score_query("zebra", 5)) == 0


def test_duplicate_query_term_counts_once():
    idx = OracleIndex(_mini())
    a = idx.score_query("apple", 10)
    b = idx.score_query("apple apple", 10)
    pd.testing.assert_frame_equal(a, b)


def test_k_larger_than_matches():
    idx = OracleIndex(_mini())
    assert len(idx.score_query("cherry", 100)) == 1


def test_empty_doc_never_retrieved(golden_topk, oracle):
    empty_ids = set(np.nonzero(oracle.doclen == 0)[0])
    assert empty_ids, "fixture should contain empty turns"
    assert not (set(golden_topk["doc_id"]) & empty_ids)


def test_golden_tiebreak_deterministic(golden_topk):
    g = golden_topk.sort_values(["query_id", "rank"])
    for _, grp in g.groupby("query_id"):
        s = grp["score"].to_numpy()
        d = grp["doc_id"].to_numpy()
        for i in range(len(grp) - 1):
            assert s[i] > s[i + 1] or (s[i] == s[i + 1] and d[i] < d[i + 1])
