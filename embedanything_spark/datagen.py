"""Deterministic synthetic transcripts + query-set generator (FIXTURES.md §1-2).

Determinism contract: every conversation is generated from an RNG seeded
by ``(base_seed, conv_index)`` only, so the SAME rows are produced
regardless of Spark parallelism, partitioning or batch boundaries — a
prerequisite for the N-vs-4N rank-identity requirement (BASELINE.json
north_rule). Generation itself is distributed: ``spark.range(n_convs)``
→ ``mapInPandas`` (Arrow-batched numpy, no per-row Python).

Mirrors the reference's fixture philosophy (deterministic small inputs,
``/root/reference/tests/model_tests/conftest.py:17-148``) at Spark scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 50_000
ZIPF_S = 1.07
TOOLS = [f"tool_{n}" for n in (
    "search", "browser", "python", "bash", "sql", "calc",
    "files", "email", "cal", "maps", "wiki", "translate")]
NON_ASCII = ["héllo", "世界", "naïve", "café", "übung", "日本語"]
PUNCT = ["foo.bar", "a,b", "x-y", "end."]

_SCHEMA = ("conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")


def _zipf_probs(n: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** (-s)
    return w / w.sum()


_CDF = None
_VOCAB = None


def _vocab() -> tuple[np.ndarray, np.ndarray]:
    """(vocab array, Zipf CDF) — CDF + searchsorted makes sampling
    O(log V) per token instead of rng.choice's O(V) per call."""
    global _CDF, _VOCAB
    if _CDF is None:
        _CDF = np.cumsum(_zipf_probs())
        # float cumsum can end slightly below 1.0; a draw above it would
        # searchsorted to VOCAB_SIZE (index error). Pin the tail.
        _CDF[-1] = 1.0
        _VOCAB = np.array([f"term{i:05d}" for i in range(VOCAB_SIZE)])
    return _VOCAB, _CDF


CLUSTER_EPOCH = 2000   # convs per topic epoch in clustered mode
CLUSTER_POOL = 64      # terms per epoch pool


def topic_pool(epoch: int) -> np.ndarray:
    """Deterministic 64-term topic pool for one epoch (clustered
    mode), spread over the torso/tail vocab region."""
    vocab, _ = _vocab()
    idx = (epoch * 9973 + np.arange(CLUSTER_POOL) * 131) \
        % (VOCAB_SIZE - 2000) + 2000
    return vocab[idx]


def _gen_conv_arrays(conv_i: int, seed: int = SEED,
                     clustered: bool = False) -> dict:
    """Column arrays for one conversation; pure function of
    (seed, conv_i). Fully vectorized (one batch of draws per conv).

    ``clustered``: convs arrive in epochs of CLUSTER_EPOCH sharing a
    CLUSTER_POOL-term topic pool — the temporal/topical locality real
    time-ordered agent logs have (doc_ids follow conv order, so
    posting blocks inherit it). The default corpus is uniformly
    shuffled: every doc range is statistically identical, which is
    the worst case for block-max pruning by construction."""
    vocab, cdf = _vocab()
    rng = np.random.default_rng((seed, conv_i))
    n_turns = int(min(1 + rng.poisson(7), 40))
    # sticky per-conv topic terms → realistic df spread
    if clustered:
        pool = topic_pool(conv_i // CLUSTER_EPOCH)
        topic = pool[rng.integers(CLUSTER_POOL, size=3)]
    else:
        topic = vocab[np.searchsorted(cdf, rng.random(3))]
    conv_id = f"conv-{conv_i:08d}"
    base = np.datetime64("2026-01-01T00:00:00") + \
        np.timedelta64(conv_i * 37, "s")
    ts = base + np.cumsum(rng.integers(1, 91, size=n_turns)) \
        .astype("timedelta64[s]")
    is_tool = rng.random(n_turns) < 0.15
    roles = np.where(is_tool, "tool",
                     np.where(np.arange(n_turns) % 2 == 0,
                              "user", "assistant"))
    tool_pick = rng.integers(len(TOOLS), size=n_turns)
    tools = [TOOLS[int(t)] if it else None
             for t, it in zip(tool_pick, is_tool)]
    empty = rng.random(n_turns) < 0.005
    n_tok = rng.integers(5, 121, size=n_turns)
    n_tok[empty] = 0
    total = int(n_tok.sum())
    toks = vocab[np.searchsorted(cdf, rng.random(total))].astype(object)
    # sprinkle sticky topic / non-ASCII / punct tokens
    r = rng.random(total)
    m = r < 0.08
    toks[m] = topic[rng.integers(3, size=int(m.sum()))]
    m = (r >= 0.08) & (r < 0.10)
    toks[m] = np.array(NON_ASCII, dtype=object)[
        rng.integers(len(NON_ASCII), size=int(m.sum()))]
    m = (r >= 0.10) & (r < 0.11)
    toks[m] = np.array(PUNCT, dtype=object)[
        rng.integers(len(PUNCT), size=int(m.sum()))]
    bounds = np.r_[0, np.cumsum(n_tok)]
    texts = [" ".join(toks[bounds[i]:bounds[i + 1]])
             for i in range(n_turns)]
    return {
        "conv_id": np.full(n_turns, conv_id, dtype=object),
        "turn_idx": np.arange(n_turns, dtype=np.int32),
        "role": roles.astype(object),
        "text": np.array(texts, dtype=object),
        "tool": np.array(tools, dtype=object),
        "ts": ts,
    }


def _gen_batch(conv_ids, seed: int = SEED,
               clustered: bool = False) -> pd.DataFrame:
    """Many convs → ONE DataFrame (per-conv frame construction is the
    dominant cost otherwise)."""
    parts = [_gen_conv_arrays(int(i), seed, clustered) for i in conv_ids]
    return pd.DataFrame({
        c: np.concatenate([p[c] for p in parts])
        for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")})


def gen_conv(conv_i: int, seed: int = SEED) -> pd.DataFrame:
    return _gen_batch([conv_i], seed)


def gen_transcripts_pdf(n_convs: int, seed: int = SEED,
                        clustered: bool = False) -> pd.DataFrame:
    """Driver-side generation (tests, oracle). Same rows as the Spark path."""
    return _gen_batch(range(n_convs), seed, clustered)


def gen_transcripts_df(spark, n_convs: int, seed: int = SEED,
                       partitions: int | None = None,
                       clustered: bool = False):
    """Distributed generation: identical rows at any parallelism."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf["id"].to_numpy(), seed, clustered)

    return (spark.range(0, n_convs, numPartitions=parts)
            .mapInPandas(gen, schema=_SCHEMA))


def gen_query_set(seed: int = SEED) -> pd.DataFrame:
    """Frozen 50-query fixture (FIXTURES.md §2): head/torso/tail terms,
    unseen terms, non-ASCII, duplicate-term queries, k∈{1,10,100}."""
    vocab, probs = _vocab()
    rng = np.random.default_rng((seed, 10**9))

    def pick(band: str) -> str:
        if band == "head":
            return str(vocab[int(rng.integers(0, 50))])
        if band == "torso":
            return str(vocab[int(rng.integers(50, 2000))])
        return str(vocab[int(rng.integers(2000, VOCAB_SIZE))])

    bands = ["head", "torso", "tail"]
    queries: list[str] = []
    for _ in range(10):          # 1-term
        queries.append(pick(bands[int(rng.integers(3))]))
    for _ in range(15):          # 2-term
        queries.append(" ".join(pick(bands[int(rng.integers(3))]) for _ in range(2)))
    for _ in range(15):          # 3-5 term
        n = int(rng.integers(3, 6))
        queries.append(" ".join(pick(bands[int(rng.integers(3))]) for _ in range(n)))
    for i in range(5):           # contains an unseen term
        queries.append(f"zzunseen{i:02d} " + pick("torso"))
    for i in range(3):           # non-ASCII
        queries.append(NON_ASCII[i] + " " + pick("head"))
    for _ in range(2):           # duplicated term
        t = pick("head")
        queries.append(f"{t} {t}")
    ks = [10] * 50
    for i, k in zip((0, 11, 27, 41, 48), (1, 100, 1, 100, 100)):
        ks[i] = k
    return pd.DataFrame({
        "query_id": np.arange(50, dtype=np.int32),
        "query_text": queries,
        "k": np.array(ks, dtype=np.int32),
    })


def gen_cluster_query_set(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    """Frozen 50-query set for the CLUSTERED corpus: topic-pool terms
    whose high-tf postings are range-local (their epoch), plus a few
    head-mixed queries showing the bound-stacking limit. Deterministic
    in (seed, n_convs)."""
    vocab, _ = _vocab()
    rng = np.random.default_rng((seed, 10**9 + 1))
    n_epochs = max(1, n_convs // CLUSTER_EPOCH)
    queries: list[str] = []
    for i in range(20):          # 1 pool term
        pool = topic_pool(int(rng.integers(n_epochs)))
        queries.append(str(pool[int(rng.integers(CLUSTER_POOL))]))
    for i in range(20):          # 2 pool terms, same epoch
        pool = topic_pool(int(rng.integers(n_epochs)))
        a, b = rng.integers(CLUSTER_POOL, size=2)
        queries.append(f"{pool[int(a)]} {pool[int(b)]}")
    for i in range(10):          # pool + head mix
        pool = topic_pool(int(rng.integers(n_epochs)))
        queries.append(f"{pool[int(rng.integers(CLUSTER_POOL))]} "
                       f"{vocab[int(rng.integers(0, 50))]}")
    return pd.DataFrame({
        "query_id": np.arange(50, dtype=np.int32),
        "query_text": queries,
        "k": np.full(50, 10, dtype=np.int32),
    })
