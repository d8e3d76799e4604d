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


_PROBS = None
_VOCAB = None


def _vocab() -> tuple[np.ndarray, np.ndarray]:
    global _PROBS, _VOCAB
    if _PROBS is None:
        _PROBS = _zipf_probs()
        _VOCAB = np.array([f"term{i:05d}" for i in range(VOCAB_SIZE)])
    return _VOCAB, _PROBS


def gen_conv(conv_i: int, seed: int = SEED) -> pd.DataFrame:
    """Generate one conversation; pure function of (seed, conv_i)."""
    vocab, probs = _vocab()
    rng = np.random.default_rng((seed, conv_i))
    n_turns = min(1 + rng.poisson(7), 40)
    # sticky per-conv topic terms → realistic df spread
    topic = vocab[rng.choice(VOCAB_SIZE, size=3, p=probs)]
    conv_id = f"conv-{conv_i:08d}"
    base_ts = np.datetime64("2026-01-01T00:00:00") + np.timedelta64(conv_i * 37, "s")
    rows = []
    ts = base_ts
    for t in range(n_turns):
        ts = ts + np.timedelta64(int(rng.integers(1, 91)), "s")
        is_tool = rng.random() < 0.15
        role = "tool" if is_tool else ("user" if t % 2 == 0 else "assistant")
        tool = TOOLS[int(rng.integers(len(TOOLS)))] if is_tool else None
        if rng.random() < 0.005:
            text = ""
        else:
            n_tok = int(rng.integers(5, 121))
            toks = list(vocab[rng.choice(VOCAB_SIZE, size=n_tok, p=probs)])
            # sprinkle sticky topic terms
            for j in range(len(toks)):
                r = rng.random()
                if r < 0.08:
                    toks[j] = topic[int(rng.integers(3))]
                elif r < 0.10:
                    toks[j] = NON_ASCII[int(rng.integers(len(NON_ASCII)))]
                elif r < 0.11:
                    toks[j] = PUNCT[int(rng.integers(len(PUNCT)))]
            text = " ".join(toks)
        rows.append((conv_id, t, role, text, tool, ts))
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])


def gen_transcripts_pdf(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    """Driver-side generation (tests, oracle). Same rows as the Spark path."""
    out = [gen_conv(i, seed) for i in range(n_convs)]
    pdf = pd.concat(out, ignore_index=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def gen_transcripts_df(spark, n_convs: int, seed: int = SEED,
                       partitions: int | None = None):
    """Distributed generation: identical rows at any parallelism."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            for conv_i in pdf["id"].to_numpy():
                out = gen_conv(int(conv_i), seed)
                out["turn_idx"] = out["turn_idx"].astype("int32")
                yield out

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
