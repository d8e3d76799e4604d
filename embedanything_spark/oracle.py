"""Brute-force exact BM25 oracle (pure numpy/pandas, no Spark).

Plays the role of "the reference engine" from BASELINE.json north_rule:
the distributed engine must be rank-identical in top-k docIDs and match
scores at rtol=1e-6 on the frozen query set (FIXTURES.md §3).

Scoring: Okapi BM25, k1=1.2, b=0.75, Lucene-style
idf = ln(1 + (N - df + 0.5) / (df + 0.5)); query-term tf weight = 1
(duplicate query terms collapse). Tie-break (score DESC, doc_id ASC).
doc_id = dense rank over sorted (conv_id, turn_idx).

Mirrors the golden-value test style of the reference
(``/root/reference/rust/src/embeddings/local/bert.rs:407-435``): an
independently-computed exact result that the fast engine must hit.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from embedanything_spark import B, K1
from embedanything_spark.analyzer import tokenize


def assign_doc_ids(transcripts: pd.DataFrame) -> pd.DataFrame:
    """doc_id = dense rank over sorted (conv_id, turn_idx)."""
    out = transcripts.sort_values(["conv_id", "turn_idx"],
                                  kind="mergesort").reset_index(drop=True)
    out["doc_id"] = np.arange(len(out), dtype=np.int64)
    return out


class OracleIndex:
    """In-memory exact index over a transcripts pandas DataFrame."""

    def __init__(self, transcripts: pd.DataFrame):
        docs = assign_doc_ids(transcripts)
        self.docmap = docs[["doc_id", "conv_id", "turn_idx"]].copy()
        toks = [tokenize(t) for t in docs["text"]]
        self.doclen = np.array([len(t) for t in toks], dtype=np.int64)
        self.n_docs = len(docs)
        self.avgdl = float(self.doclen.mean()) if self.n_docs else 0.0
        # postings: term -> (doc_ids asc, tfs)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        tmp: dict[str, list[tuple[int, int]]] = {}
        for did, t in enumerate(toks):
            for term, tf in Counter(t).items():
                tmp.setdefault(term, []).append((did, tf))
        for term, plist in tmp.items():
            arr = np.array(plist, dtype=np.int64)
            self.postings[term] = (arr[:, 0], arr[:, 1])
        self.df = {t: len(p[0]) for t, p in self.postings.items()}

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return float(np.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5)))

    def score_query(self, query_text: str, k: int) -> pd.DataFrame:
        """Exact top-k: columns (rank, doc_id, conv_id, turn_idx, score)."""
        terms = sorted(set(tokenize(query_text)))  # query tf weight = 1
        scores = np.zeros(self.n_docs, dtype=np.float64)
        hit = np.zeros(self.n_docs, dtype=bool)
        for term in terms:  # fixed term order → deterministic f64 sums
            if term not in self.postings:
                continue
            dids, tfs = self.postings[term]
            dl = self.doclen[dids]
            denom = tfs + K1 * (1.0 - B + B * dl / self.avgdl)
            scores[dids] += self.idf(term) * (tfs * (K1 + 1.0)) / denom
            hit[dids] = True
        cand = np.nonzero(hit)[0]
        if len(cand) == 0:
            return pd.DataFrame(columns=["rank", "doc_id", "conv_id",
                                         "turn_idx", "score"])
        # sort (score DESC, doc_id ASC); lexsort is stable
        order = np.lexsort((cand, -scores[cand]))[:k]
        top = cand[order]
        out = pd.DataFrame({"doc_id": top.astype(np.int64),
                            "score": scores[top]})
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int32)
        out = out.merge(self.docmap, on="doc_id", how="left")
        return out[["rank", "doc_id", "conv_id", "turn_idx", "score"]]

    def score_all(self, queries: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for q in queries.itertuples():
            r = self.score_query(q.query_text, int(q.k))
            if len(r):
                r.insert(0, "query_id", np.int32(q.query_id))
                frames.append(r)
        cols = ["query_id", "rank", "doc_id", "conv_id", "turn_idx", "score"]
        if not frames:
            return pd.DataFrame(columns=cols)
        return pd.concat(frames, ignore_index=True)[cols]
