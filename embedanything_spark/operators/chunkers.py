"""Semantic chunkers — the reference's statistical and cumulative
chunking re-expressed as pure Catalyst plans (SURVEY.md §2.2 P2/P3).

Reference semantics being mirrored:

- Statistical (``rust/src/chunkers/statistical.rs:43-383``, tested
  ``:394-413``): split text into fixed ~token windows (``:141-145``),
  embed each window (``:155-173``), cosine similarity of window i vs
  the rolling mean of the previous ``window_size=5`` windows
  (``:206-262``), derive a similarity threshold from the distribution
  (``:264-332`` binary-searches one; here: the per-doc P25 —
  A3's percentile machinery), split below threshold (``:333-341``),
  and re-pack against a token budget (``:343-383``; here: chunks over
  ``MAX_CHUNK_TOKENS`` are subdivided at window granularity — the
  greedy re-pack is sequential by nature, ceil-division keeps the plan
  relational and the budget respected).
- Cumulative (``rust/src/chunkers/cumulative.rs:39-111``, tested
  ``:150-168``): grow a chunk while the next piece stays similar to
  what has accumulated; here window i is compared against the PREFIX
  mean of all previous windows (running-mean embedding — A4's prefix
  machinery) and splits below a fixed threshold.

The "embedding" is the deterministic static-embed scalar family (E6,
``model2vec.rs:17-34``): 4 dims per token from md5 hex slices, mean-
pooled per window — both engines (Spark and the DuckDB oracle) derive
identical vectors, which is what makes an exact SQL oracle possible.
Float landmines: boolean split decisions compare raw doubles (sim <
threshold) — within-engine consistent; cross-engine flips would need
two sims within ~1 ulp, negligible for this data. All OUTPUT columns
are integers (counts/ids), so the value hash is float-free.

Scale notes: everything here is one narrow token pass + per-doc window
functions partitioned by doc_id — no joins of the token stream, no
driver actions; at 100 TB the only shuffle is the doc-keyed window
exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from embedanything_spark.operators.docops import load, spread

WIN_TOKENS = 10       # tokens per similarity window (statistical.rs:141-145)
ROLL_WINDOWS = 5      # rolling-mean width (statistical.rs window_size=5)
MAX_CHUNK_TOKENS = 80  # token budget for the re-pack stage
SPLIT_PCT = 0.25      # per-doc similarity percentile used as threshold
CUM_THRESHOLD = 0.98  # fixed prefix-similarity split threshold (P3)
DIMS = 4


def _tok_dims() -> list[F.Column]:
    """Deterministic token dims from md5 hex slices (6 hex chars each
    → 24 bits, scaled to [0,1) with 1e-6 granularity). Each PAIR of
    dims is parsed with ONE ``conv`` over 12 hex chars (48 bits — fits
    a signed long) and split with shiftright / bitwiseAND: bit-exact
    the same integers as four 6-char parses, at half the base-convert
    cost. Reads a pre-computed ``h`` = md5(term) column so the hash
    runs once per token."""
    out = []
    for p in range(DIMS // 2):
        v = (F.conv(F.substring(F.col("h"), 1 + 12 * p, 12), 16, 10)
             .cast("long"))
        hi = F.shiftright(v, 24)                    # == int(h[12p:12p+6], 16)
        lo = v.bitwiseAND(F.lit((1 << 24) - 1))     # == int(h[12p+6:12p+12], 16)
        for part in (hi, lo):
            out.append((part % F.lit(1_000_000)) / F.lit(1_000_000.0))
    return out


def _window_embeddings(spark, sf_dir) -> DataFrame:
    """(doc_id, win_id, n_tok, e0..e3): mean-pooled deterministic
    window embeddings over WIN_TOKENS-token windows. Dim extraction
    (md5 + 2 convs + bit ops) runs in the per-token PROJECTION ahead
    of the partial aggregation, so each hash/parse happens exactly
    once per token and the aggregate averages plain doubles."""
    docs = load(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "doc_id",
        F.posexplode(F.filter(F.split(F.lower("text"), " "),
                              lambda x: x != "")).alias("pos", "term"))
    dims = (toks
            .withColumn("win_id", (F.col("pos") / WIN_TOKENS)
                        .cast("long"))
            .withColumn("h", F.md5("term"))
            .select("doc_id", "win_id",
                    *[d.alias(f"e{i}")
                      for i, d in enumerate(_tok_dims())]))
    return (dims
            .groupBy("doc_id", "win_id")
            .agg(F.count("*").alias("n_tok"),
                 *[F.avg(f"e{d}").alias(f"e{d}")
                   for d in range(DIMS)]))


def _sims(wins: DataFrame, frame_start) -> DataFrame:
    """Cosine of each window vs the mean of a preceding frame
    (frame_start..-1). NULL for the first window (empty frame)."""
    w = (Window.partitionBy("doc_id").orderBy("win_id")
         .rowsBetween(frame_start, -1))
    cols = [F.avg(f"e{d}").over(w).alias(f"r{d}") for d in range(DIMS)]
    out = wins.select("*", *cols)
    dot = sum(F.col(f"e{d}") * F.col(f"r{d}") for d in range(DIMS))
    ne = F.sqrt(sum(F.col(f"e{d}") * F.col(f"e{d}") for d in range(DIMS)))
    nr = F.sqrt(sum(F.col(f"r{d}") * F.col(f"r{d}") for d in range(DIMS)))
    return out.withColumn("sim", dot / (ne * nr))


def _chunk_rollup(simdf: DataFrame, boundary: F.Column) -> DataFrame:
    """boundary flags → chunk ids (running sum) → per-chunk rollup."""
    wseq = (Window.partitionBy("doc_id").orderBy("win_id")
            .rowsBetween(Window.unboundedPreceding, 0))
    return (simdf
            .withColumn("chunk_id",
                        F.sum(boundary.cast("long")).over(wseq))
            .groupBy("doc_id", "chunk_id")
            .agg(F.min("win_id").alias("start_win"),
                 F.count("*").alias("n_windows"),
                 F.sum("n_tok").alias("n_tokens"))
            .withColumn("n_subchunks",
                        F.ceil(F.col("n_tokens") /
                               F.lit(float(MAX_CHUNK_TOKENS)))))


def statistical_chunk(spark, sf_dir) -> DataFrame:
    """P2: rolling-mean similarity split at the per-doc P25 threshold +
    token-budget subdivision count. Output (doc_id, chunk_id,
    start_win, n_windows, n_tokens, n_subchunks) — all integral."""
    wins = _window_embeddings(spark, sf_dir)
    simdf = _sims(wins, -ROLL_WINDOWS)
    # per-doc threshold as a WINDOW aggregate (percentile skips nulls)
    # — no groupBy + self-join, no recompute of the sim subtree
    joined = simdf.withColumn(
        "th", F.percentile("sim", F.lit(SPLIT_PCT)).over(
            Window.partitionBy("doc_id")))
    boundary = F.col("sim").isNull() | (F.col("sim") < F.col("th"))
    return _chunk_rollup(joined, boundary).orderBy("doc_id", "chunk_id")


LATE_CTX = 2          # context radius in docs (E3 cross-boundary window)
LATE_CHUNK_DOCS = 4   # docs pooled per late chunk


def late_chunk(spark, sf_dir) -> DataFrame:
    """E3 late chunking (bert.rs:147-238): embed with FULL-sequence
    context first, slice per chunk after. Relational restatement over
    the documents table (source = the sequence, doc_id = order): each
    doc's contextual embedding is the mean of its neighbors' static-
    embed scalars over a ±LATE_CTX window (context crosses chunk
    boundaries — the point of late chunking), then fixed runs of
    LATE_CHUNK_DOCS docs are mean-pooled per chunk. Output
    (source, chunk_id, n_docs, late_micro)."""
    from embedanything_spark.operators.docops import (_tokens, hash12,
                                                      load, micro)
    docs = load(spark, sf_dir, "documents")
    val = (hash12(F.col("term")) % F.lit(10**6)) / F.lit(10**6)
    e = (_tokens(docs).groupBy("doc_id").agg(F.avg(val).alias("e")))
    d = (docs.select("source", "doc_id").join(e, "doc_id", "left")
         .select("source", "doc_id",
                 F.coalesce("e", F.lit(0.0)).alias("e")))
    wc = (Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(-LATE_CTX, LATE_CTX))
    wr = Window.partitionBy("source").orderBy("doc_id")
    return (d.withColumn("c", F.avg("e").over(wc))
            .withColumn("chunk_id",
                        F.floor((F.row_number().over(wr) - 1) /
                                F.lit(LATE_CHUNK_DOCS)))
            .groupBy("source", "chunk_id")
            .agg(F.count("*").alias("n_docs"),
                 micro(F.avg("c")).alias("late_micro")))


def cumulative_chunk(spark, sf_dir) -> DataFrame:
    """P3: prefix-mean similarity split at a fixed threshold. Output
    (doc_id, chunk_id, start_win, n_windows, n_tokens, n_subchunks)."""
    wins = _window_embeddings(spark, sf_dir)
    simdf = _sims(wins, Window.unboundedPreceding)
    boundary = (F.col("sim").isNull() |
                (F.col("sim") < F.lit(CUM_THRESHOLD)))
    return _chunk_rollup(simdf, boundary).orderBy("doc_id", "chunk_id")
