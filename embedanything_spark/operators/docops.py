"""Document-table operators: BM25-family + text-analysis + dedup.

These run over the driver's ``documents`` parquet table
(doc_id, text, lang, source, n_chars) and each has an exact DuckDB
oracle in ``__spark_entry__.oracle_sql`` — tokenization here is plain
space-split + lowercase so both engines tokenize identically (the
transcripts engine uses the frozen unicode analyzer instead).

Float outputs are exported as ``*_micro`` BIGINTs (round(x·1e6)) so the
driver's value-hash comparison is immune to last-ulp float noise, and
rows are ordered by the ROUNDED value so LIMIT boundaries are
deterministic across engines.

Dedup + quality operators are the training-data-pipeline surface
(MinHash-LSH, SimHash, n-gram Jaccard, quality scoring, language
guess, fingerprinting) — all expressed as Catalyst built-ins; hashes
are md5-prefix BIGINTs which Spark and DuckDB compute identically
(verified: conv(substring(md5(x),1,12),16,10) == CAST('0x'||… AS BIGINT)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from embedanything_spark import B, K1

DOC_QUERY_TERMS = ["spark", "join", "filter"]  # fixed demo query


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism for token-exploding subtrees
    (guide §2): a small single-row-group parquet file plans as ONE
    scan task, serializing the whole explode + hash pipeline onto one
    core. Repartition to the session's core count ONLY when the scan
    plans fewer partitions than that — at real scale input splits
    exceed the core count and this is a structural no-op (zero added
    shuffle); in the small regime the exchange moves just the raw doc
    rows (bounded by the same condition that triggered it). Bonus:
    consumers that branch off the same spread subtree share ONE
    ReusedExchange instead of re-scanning the input."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def micro(col) -> F.Column:
    return F.round(col * F.lit(1e6)).cast("long")


def _tokens(df: DataFrame) -> DataFrame:
    """(doc_id, term) exploded space tokens, empties dropped.

    Deliberately NOT spread(): these consumers (term_tf,
    quality_score, simhash, late_chunk) do only a cheap split+explode
    before a partial aggregation, and the measured cold cost of the
    extra exchange + AQE stage exceeds the serialized-scan cost
    (interleaved A/B: term_dictionary 0.96 → 2.24 s with spread,
    quality_score 1.20 → 1.44 s). The heavy per-token kernels
    (md5+conv: window embeddings, shingles, bm25's array projection)
    keep it — there the parallelization wins (bm25_topk 1.08 → 0.75,
    statistical_chunk 2.22 → 1.80 cold)."""
    return (df.select("doc_id",
                      F.explode(F.split(F.lower("text"), " ")).alias("term"))
              .filter(F.col("term") != ""))


def hash12(col) -> F.Column:
    """48-bit BIGINT from md5 hex prefix — DuckDB-parity hash."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def rank_small(df: DataFrame, val_col: str, id_col: str,
               col: str = "r") -> DataFrame:
    """Rank a BOUNDED relation (≤ k rows, post-top-k) on
    (val_col DESC, id_col ASC) WITHOUT a window: fold the rows into one
    sorted array (a global agg whose partial aggregation is map-side;
    the final reduce holds ≤ k structs by construction) and posexplode
    with the position as the rank. A zero-key row_number window would
    plan the same single-partition placement but via WindowExec, which
    (rightly) flags it as a scale hazard at ANY input size — this shape
    is explicit about the bound instead. Never call on an unbounded
    relation; (val_col, id_col) must be a total order."""
    cols = df.columns
    arr = df.agg(F.sort_array(F.collect_list(F.struct(
        (-F.col(val_col)).alias("_negv"),
        F.col(id_col).alias("_id"),
        F.struct(*cols).alias("_row")))).alias("a"))
    return (arr.select(F.posexplode("a").alias("_pos", "_s"))
            .select("_s._row.*",
                    (F.col("_pos") + 1).cast("int").alias(col)))


def topk_ranked(df: DataFrame, val_col: str, id_col: str,
                k: int) -> DataFrame:
    """Distributed top-k THEN rank: orderBy().limit(k) plans as
    TakeOrderedAndProject (per-partition heap + driver merge — nothing
    corpus-proportional ever moves to one partition), and only the ≤k
    survivors get a rank. This replaces the 100×-fatal
    rank-everything-then-filter shape (a global unpartitioned window
    pulls ALL rows into a single task). Ordering is
    (val_col DESC, id_col ASC) — a total order, so the rank boundary
    is deterministic. Reference analogue: Qdrant-side top-k prefetch
    before fusion (examples/hybridsearch.py:64-77)."""
    top = df.orderBy(F.desc(val_col), F.asc(id_col)).limit(k)
    return rank_small(top, val_col, id_col)


# ---------- BM25 family (S1/E2/A6/J1/T2 in SURVEY.md §2) ----------

def term_tf(spark, sf_dir):
    """tf per (doc, term) — the SPLADE-slot statistic (E2/A1)."""
    return (_tokens(load(spark, sf_dir, "documents"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf")))


def term_dictionary(spark, sf_dir):
    """Global dictionary: df + cf per term (A6, segment merge)."""
    return (term_tf(spark, sf_dir)
            .groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("cf")))


def doc_stats(spark, sf_dir):
    """Per-doc length; zero-token docs kept (A6). Computed NARROWLY —
    size(filter(split(...))) per row — instead of the former
    explode → groupBy → left join back, which shuffled the whole token
    stream and re-scanned the table just to count tokens per doc: one
    projection, zero exchanges, identical rows (null/empty text → 0,
    matching the oracle's coalesce)."""
    docs = load(spark, sf_dir, "documents")
    doclen = F.size(F.filter(F.split(F.lower("text"), " "),
                             lambda x: x != ""))
    return docs.select(
        "doc_id",
        F.coalesce(doclen, F.lit(0)).cast("long").alias("doclen"))


def _bm25_scores(spark, sf_dir):
    """(doc_id, score_micro) for the fixed query — NARROW DataFrame
    BM25 plan with ZERO driver actions and ZERO token shuffles: the
    per-doc tf of each query term and the doc length are computed as
    per-row array expressions (size(filter(tokens))) in ONE projection
    over ONE scan, so the token stream is never exploded, grouped, or
    joined (the former shape shuffled (doc_id, term) for the whole
    corpus twice and re-scanned the table for doclen). n/avgdl/df ride
    along as ONE broadcast 1-row aggregate of the same projection.

    Equivalence to the DuckDB oracle (which keeps the explode+join
    shape): tf-from-array == tf-from-groupBy per (doc, term);
    df == count of docs with tf>0; a zero-tf term contributes exactly
    +0.0 (numerator 0, denominator ≥ K1·(1−B) > 0), and docs matching
    no query term are filtered out, reproducing the inner-join row
    set. Scores sum in fixed term order; micro-rounding absorbs
    sub-ulp ordering noise exactly as in the aggregated shape (whose
    hash-agg update order was already arbitrary)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    nq = len(DOC_QUERY_TERMS)
    # two-step select: split/lower is non-cheap, so CollapseProject
    # keeps `_t` materialized once instead of inlining it per tf column.
    # spread(): parallelize the tokenize work when the scan is a single
    # small split, and let the stats and scored branches share ONE
    # ReusedExchange instead of re-scanning the parquet.
    proj = (spread(docs).select("doc_id", toks.alias("_t"))
            .select(
                "doc_id",
                F.coalesce(F.size("_t"), F.lit(0)).cast("long")
                .alias("doclen"),
                *[F.coalesce(
                    F.size(F.filter(F.col("_t"), lambda x: x == qt)),
                    F.lit(0))
                  .cast("double").alias(f"tf{i}")
                  for i, qt in enumerate(DOC_QUERY_TERMS)]))
    # tf columns are coalesced non-nullable (null text → 0, the same
    # rows the oracle's inner join drops via the Σtf filter below) —
    # also deliberate plan hygiene: nullable tf would let the optimizer
    # infer isnotnull() constraints from the join filter and push them
    # to the scan, re-tokenizing text per term below the exchange.
    st = proj.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("doclen").alias("avgdl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("int")).cast("double")
          .alias(f"df{i}") for i in range(nq)])
    # The zero-match filter is written as (Σtf)·n > 0 — exactly
    # Σtf > 0, since n ≥ 1 — so it REFERENCES the broadcast stats side
    # and cannot be pushed below the join: a bare Σtf > 0 predicate
    # gets substituted through the projection down to the scan, where
    # it re-tokenizes text three times per row AND splits the plan
    # into two scans (the pre-filter exchange no longer matches the
    # stats branch, killing ReusedExchange — observed in the formatted
    # plan). Kept at the join, both branches share ONE scan+exchange.
    scored = proj.crossJoin(F.broadcast(st)).filter(
        sum(F.col(f"tf{i}") for i in range(nq)) * F.col("n") > 0)
    contribs = []
    for i in range(nq):
        idf = F.log(F.lit(1.0) + (F.col("n") - F.col(f"df{i}") + 0.5) /
                    (F.col(f"df{i}") + 0.5))
        contribs.append(
            idf * (F.col(f"tf{i}") * F.lit(K1 + 1.0)) /
            (F.col(f"tf{i}") + F.lit(K1) *
             (F.lit(1.0 - B) +
              F.lit(B) * F.col("doclen") / F.col("avgdl"))))
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    return scored.select("doc_id", micro(score).alias("score_micro"))


def bm25_topk(spark, sf_dir):
    """Okapi BM25 (k1=1.2, b=0.75, Lucene idf) top-20 for the fixed
    query — the index-less DataFrame slice (§3.3)."""
    return (_bm25_scores(spark, sf_dir)
            .orderBy(F.desc("score_micro"), F.asc("doc_id"))
            .limit(20))


def bm25_topk_indexed(spark, sf_dir):
    """The same flagship query answered by the REAL posting-list
    engine: map the documents table to transcript shape (one turn per
    doc, conv_id = zero-padded doc_id so the engine's dense doc_id
    order equals the original), build the compressed block index, and
    run the query through block-max WAND. Shares bm25_topk's DuckDB
    oracle — the index path must reproduce the index-less DataFrame
    plan exactly. Engine fetches k+32, then ranks are cut on
    (score_micro DESC, doc_id ASC) to match the oracle's LIMIT
    boundary under micro-rounding."""
    import shutil
    from pathlib import Path

    import pandas as pd

    from embedanything_spark.index.build import IndexWriter
    from embedanything_spark.index.query import IndexReader
    from embedanything_spark.session import package_zip

    spark.sparkContext.addPyFile(package_zip())
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("doc").alias("role"),
        F.lit(None).cast("timestamp").alias("ts"),
        "text")
    root = Path(f"/tmp/ea_docidx_{Path(sf_dir).name}")
    shutil.rmtree(root, ignore_errors=True)
    IndexWriter(str(root), num_partitions=8).build(t)
    q = pd.DataFrame({"query_id": [0],
                      "query_text": [" ".join(DOC_QUERY_TERMS)],
                      "k": [20 + 32]})
    res = IndexReader(spark, str(root)).search(q, prune=True)
    # res is ≤ k+32 rows by construction (engine top-k); the final cut
    # to 20 on micro-rounded scores is a plain distributed top-k
    return (res
            .select(F.col("conv_id").cast("long").alias("doc_id"),
                    micro(F.col("score")).alias("score_micro"))
            .orderBy(F.desc("score_micro"), F.asc("doc_id"))
            .limit(20))


def incremental_antijoin(spark, sf_dir):
    """S5/J2: skip already-indexed docs (indexed set = doc_id % 7 == 0)."""
    docs = load(spark, sf_dir, "documents")
    indexed = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    return (docs.join(indexed, "doc_id", "left_anti")
            .select("doc_id", "source"))


def rank_by_source(spark, sf_dir):
    """W2: per-source length rank (reranker rank assembly analogue)."""
    w = Window.partitionBy("source").orderBy(
        F.desc("n_chars"), F.asc("doc_id"))
    return (load(spark, sf_dir, "documents")
            .select("source", "doc_id", "n_chars",
                    F.row_number().over(w).cast("long").alias("rnk"))
            .filter(F.col("rnk") <= 3))


def hybrid_rrf(spark, sf_dir):
    """J3 — REAL hybrid fusion (hybridsearch.py:64-77): reciprocal-rank
    fusion of the live SPARSE retriever (BM25 over documents; score-
    identical to the IndexReader path — proven by bm25_topk_indexed's
    shared oracle) and the live DENSE retriever — the IVF PROBE
    (``similarity.ivf_cluster_scored``: materialized-centroid nearest-
    cluster scan, vec_id ≡ doc_id), the retriever a 100× corpus would
    actually serve (exact full-corpus cosine stays only as the
    knn_cosine baseline). Top-50 prefetch each side, RRF k=60. Both
    rankings use micro-rounded scores so the rank boundary is
    deterministic across engines."""
    from embedanything_spark.operators.similarity import \
        ivf_cluster_scored
    sparse = topk_ranked(_bm25_scores(spark, sf_dir),
                         "score_micro", "doc_id", 50) \
        .select("doc_id", "r")
    dense_scored = (ivf_cluster_scored(spark, sf_dir)
                    .select(F.col("vec_id").alias("doc_id"),
                            "cos_micro"))
    dense = topk_ranked(dense_scored, "cos_micro", "doc_id", 50) \
        .select("doc_id", "r")
    u = sparse.unionByName(dense)
    return (u.groupBy("doc_id")
            .agg(F.sum(F.lit(1.0) / (F.lit(60.0) + F.col("r")))
                 .alias("rrf"))
            .select("doc_id", micro(F.col("rrf")).alias("rrf_micro"))
            .orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(15))


def rerank_topk(spark, sf_dir):
    """T1/J1 — cross-encoder rerank of the BM25 top-20 as a driver
    entry (reranker/model.rs:139-276). The kernel is the repo's
    classical lexical cross-scorer (coverage + tf-saturation +
    exact-phrase → sigmoid, index/rerank.py) scored over Arrow
    batches; its exact arithmetic is reproduced in the DuckDB
    oracle."""
    import pandas as pd

    from embedanything_spark.index.rerank import _cross_score_batch
    from embedanything_spark.session import package_zip

    spark.sparkContext.addPyFile(package_zip())
    qtext = " ".join(DOC_QUERY_TERMS)
    top = (bm25_topk(spark, sf_dir)
           .join(load(spark, sf_dir, "documents")
                 .select("doc_id", "text"), "doc_id"))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.copy()
            pdf["rerank_score"] = _cross_score_batch(
                pd.Series([qtext] * len(pdf)), pdf["text"])
            yield pdf[["doc_id", "score_micro", "rerank_score"]]

    scored = top.mapInPandas(
        score, schema="doc_id long, score_micro long, rerank_score double")
    # scored is the BM25 top-20 (≤ 20 rows) — rank_small, not a global
    # window
    ranked = rank_small(
        scored.withColumn("rerank_micro", micro(F.col("rerank_score")))
              .select("doc_id", "score_micro", "rerank_micro"),
        "rerank_micro", "doc_id", col="rank")
    return (ranked.withColumn("rank", F.col("rank").cast("long"))
            .orderBy("rank"))


def rrf_fusion(spark, sf_dir):
    """J3: reciprocal-rank fusion of two top-50 prefetch rankings (by
    n_chars, by token count), RRF k=60 — hybridsearch.py:64-77
    re-expressed. Each retriever contributes a TOP-50 prefetch list
    (the reference fuses bounded prefetch lists, not full corpus
    rankings) via distributed top-k — no global window ranks the whole
    table."""
    docs = load(spark, sf_dir, "documents")
    r1 = topk_ranked(docs.select("doc_id", "n_chars"),
                     "n_chars", "doc_id", 50).select("doc_id", "r")
    r2 = topk_ranked(doc_stats(spark, sf_dir),
                     "doclen", "doc_id", 50).select("doc_id", "r")
    u = r1.unionByName(r2)
    return (u.groupBy("doc_id")
            .agg(F.sum(F.lit(1.0) / (F.lit(60.0) + F.col("r")))
                 .alias("rrf"))
            .select("doc_id", micro(F.col("rrf")).alias("rrf_micro"))
            .orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(15))


# ---------- Text analysis (training-data pipeline) ----------

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def quality_score(spark, sf_dir):
    """Length/stopword/distinct-ratio quality heuristic per doc."""
    toks = _tokens(load(spark, sf_dir, "documents"))
    agg = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("term").alias("n_distinct"),
        F.sum(F.col("term").isin(STOPWORDS).cast("int"))
         .alias("n_stop"),
        F.avg(F.length("term")).alias("avg_len"))
    score = (F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4 +
             (F.col("n_distinct") / F.col("n_tokens")) * 0.4 +
             (1.0 - F.col("n_stop") / F.col("n_tokens")) * 0.2)
    return agg.select("doc_id", "n_tokens", "n_distinct", "n_stop",
                      micro(score).alias("quality_micro"))


def token_count(spark, sf_dir):
    """Whitespace + word-regex token counts per source (P4 analogue)."""
    docs = load(spark, sf_dir, "documents")
    return (docs.select(
            "source",
            F.size(F.filter(F.split(F.col("text"), " "),
                            lambda x: x != "")).alias("ws"),
            F.size(F.regexp_extract_all(
                F.col("text"), F.lit(r"[a-z0-9]+"), 0)).alias("re"))
            .groupBy("source")
            .agg(F.sum("ws").alias("ws_tokens"),
                 F.sum("re").alias("re_tokens"),
                 F.count("*").alias("n_docs")))


def lang_guess(spark, sf_dir):
    """Charset-based language-ID heuristic (n-gram LID stand-in —
    honest: this corpus is ASCII so the guess is structural)."""
    docs = load(spark, sf_dir, "documents")
    guess = (F.when(F.col("text").rlike(r"[\x{4e00}-\x{9fff}]"), "cjk")
             .when(F.col("text").rlike(r"[^\x00-\x7f]"), "latin_ext")
             .when(F.length("text") < 50, "short")
             .otherwise("ascii"))
    return (docs.select(guess.alias("guess"), "lang")
            .groupBy("guess", "lang").agg(F.count("*").alias("n")))


def doc_fingerprint(spark, sf_dir):
    """Position-weighted content fingerprint per doc (rolling-hash
    style): sum(hash48(term) * (pos+1)) mod 2^31."""
    docs = load(spark, sf_dir, "documents")
    toks = spread(docs).select(
        "doc_id",
        F.posexplode(F.filter(F.split(F.lower("text"), " "),
                              lambda x: x != "")).alias("pos", "term"))
    fp = toks.groupBy("doc_id").agg(
        (F.sum(hash12(F.col("term")) % F.lit(2**31) *
               (F.col("pos") + 1)) % F.lit(2**31)).alias("fingerprint"))
    return fp.select("doc_id", F.col("fingerprint").cast("long")
                     .alias("fingerprint"))


def chunk_text(spark, sf_dir):
    """P1 character chunking (TextEmbedConfig chunk_size/overlap,
    config.rs:37-78): fixed 120-char windows, 30-char overlap, as a
    pure Catalyst plan (sequence → posexplode → substring)."""
    size, step = 120, 90
    docs = (load(spark, sf_dir, "documents")
            .filter(F.length("text") > 0))
    starts = F.sequence(F.lit(0), F.length("text") - 1, F.lit(step))
    return (docs
            .select("doc_id", "text",
                    F.explode(starts).alias("s"))
            .select("doc_id",
                    F.col("s").cast("long").alias("chunk_start"),
                    F.expr(f"substring(text, s + 1, {size})")
                    .alias("chunk"))
            .withColumn("chunk_len", F.length("chunk").cast("long")))


def distinct_terms(spark, sf_dir):
    """A5 distinct-count progress tracking: exact distinct terms and
    token totals per source."""
    docs = load(spark, sf_dir, "documents")
    toks = (spread(docs)
            .select("source",
                    F.explode(F.split(F.lower("text"), " "))
                    .alias("term"))
            .filter(F.col("term") != ""))
    return (toks.groupBy("source")
            .agg(F.countDistinct("term").alias("n_distinct_terms"),
                 F.count("*").alias("n_tokens")))


# ---------- Deduplication (training-data pipeline) ----------

def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash; keeper = min doc_id per group."""
    docs = load(spark, sf_dir, "documents")
    return (docs.select(F.md5(F.lower("text")).alias("h"), "doc_id")
            .groupBy("h")
            .agg(F.min("doc_id").alias("keeper"),
                 F.count("*").alias("n_dups"))
            .filter(F.col("n_dups") >= 1)
            .select("keeper", "n_dups"))


def _shingles(spark, sf_dir, distinct: bool = True):
    """3-gram token shingles per doc, computed NARROWLY from the token
    array (transform over a position sequence — zero joins, zero
    shuffles of the token stream; same row set as the DuckDB oracle's
    positional self-join). At 100 TB this is a per-row map; the old
    posexplode + double self-join tripled and double-shuffled the
    whole token stream. ``distinct=False`` skips the dedup shuffle for
    consumers whose aggregate is multiset-invariant (e.g. MinHash)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    sh = (spread(docs)
          .select("doc_id", toks.alias("t"))
          .select("doc_id", F.explode(F.when(
              F.size("t") >= 3,
              F.expr("transform(sequence(0, size(t)-3), "
                     "i -> concat_ws('_', t[i], t[i+1], t[i+2]))"))
              .otherwise(F.array())).alias("shingle")))
    return sh.distinct() if distinct else sh


def dedup_minhash(spark, sf_dir):
    """MinHash signatures (8 permutations) + LSH bands of 2 →
    candidate pairs per band bucket. The scale path: band buckets
    shard the pair-join so no O(n²) compare. All 8 signatures are
    computed in ONE aggregation pass over the RAW (non-distinct)
    shingle stream — min is multiset-invariant, so the dedup shuffle
    is skipped and the per-doc agg gets map-side partial aggregation:
    the only shuffle moves one (doc_id, 8 hashes) row per doc.

    Permutations use the two-hash construction (Kirsch–Mitzenmacher:
    g_s = (h1 + s·h2) mod p, public standard for k-wise hashing):
    ONE md5 per shingle, split into two 32-bit halves, then 8 cheap
    modular combinations — previously 8 full md5 calls per shingle
    dominated the entry's CPU."""
    P = 4294967291  # largest 32-bit prime
    sh = _shingles(spark, sf_dir, distinct=False)
    hashed = sh.select(
        "doc_id", F.md5("shingle").alias("h")).select(
        "doc_id",
        F.conv(F.substring("h", 1, 8), 16, 10)
        .cast("long").alias("h1"),
        F.conv(F.substring("h", 9, 8), 16, 10)
        .cast("long").alias("h2"))
    mh = hashed.groupBy("doc_id").agg(*[
        F.min((F.col("h1") + F.lit(s) * F.col("h2")) % F.lit(P))
        .alias(f"mh{s}") for s in range(8)])
    # band b = seeds (2b, 2b+1); sig = order-insensitive concat (the
    # same value the per-seed groupBy + string_agg oracle produces)
    bands_arr = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.concat_ws("|", F.transform(
                     F.array_sort(F.array(
                         F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))),
                     lambda x: x.cast("string")))
                 .alias("sig"))
        for b in range(4)])
    bands = (mh.select("doc_id", F.explode(bands_arr).alias("bs"))
             .select("doc_id", F.col("bs.band").alias("band"),
                     F.col("bs.sig").alias("sig")))
    a, bdf = bands.alias("a"), bands.alias("b")
    pairs = (a.join(bdf, (F.col("a.band") == F.col("b.band")) &
                         (F.col("a.sig") == F.col("b.sig")) &
                         (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("d1"),
                     F.col("b.doc_id").alias("d2")).distinct())
    return pairs.agg(F.count("*").alias("n_candidate_pairs"),
                     F.coalesce(F.min("d1"), F.lit(-1)).alias("min_d1"))


def dedup_simhash(spark, sf_dir):
    """64-bit SimHash per doc from md5 bits of tokens (tf-weighted),
    emitted as two 32-bit halves (hi/lo) so neither engine's signed
    BIGINT overflows. 16 bits collide massively at 10^12 docs; 64 is
    the standard width (Charikar/Google near-dup).

    Plan shape: the 64 per-bit votes are 64 NARROW sum columns over
    one row per (doc, term) — map-side partial aggregation combines
    them before the shuffle, so exactly one 64-column row per doc
    moves, and the token stream is never multiplied (the previous
    shape exploded 64 bit-rows per (doc, term): a 64× CPU/row blowup
    ahead of the partial agg)."""
    tf = (term_tf(spark, sf_dir)
          .withColumn("h", F.md5("term"))
          .withColumn("h_lo", F.conv(F.substring("h", 1, 8),
                                     16, 10).cast("long"))
          .withColumn("h_hi", F.conv(F.substring("h", 9, 8),
                                     16, 10).cast("long")))
    votes = tf.select("doc_id", *[
        F.expr(f"((shiftright({'h_lo' if b < 32 else 'h_hi'}, {b % 32}) "
               f"& 1) * 2 - 1) * tf").alias(f"v{b}")
        for b in range(64)])
    agg = votes.groupBy("doc_id").agg(
        *[F.sum(f"v{b}").alias(f"v{b}") for b in range(64)])
    hi = sum((F.when(F.col(f"v{b}") > 0,
                     F.lit(1 << (b - 32)).cast("long"))
              .otherwise(F.lit(0).cast("long")) for b in range(32, 64)),
             start=F.lit(0).cast("long"))
    lo = sum((F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long"))
              .otherwise(F.lit(0).cast("long")) for b in range(32)),
             start=F.lit(0).cast("long"))
    return agg.select("doc_id", hi.alias("simhash_hi"),
                      lo.alias("simhash_lo"))


JACCARD_DF_CAP = 64  # Zipf-head shingles are dropped before the pair join


def dedup_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dup over the RARE-shingle universe: shingles
    with df > JACCARD_DF_CAP are dropped symmetrically (from both the
    common counts and the set sizes) — standard LSH practice; an
    uncapped join on raw shingle equality goes quadratic on Zipf-head
    shingles at corpus scale.

    Plan shape (audited): ONE aggregation of the raw shingle stream
    into per-shingle doc SETS (collect_set also dedups, so no separate
    distinct shuffle), then candidate pairs are exploded NARROWLY from
    each ≤cap-sized set — no self-join, and the cap structurally
    bounds pairs-per-shingle at cap·(cap-1)/2. Sizes derive from the
    same small aggregated relation."""
    sh = _shingles(spark, sf_dir, distinct=False)
    # persisted because BOTH sizes and pairs read it — without the
    # persist Spark recomputes the whole shingle aggregation twice
    # (measured: the dominant cost of this entry). At 100 TB this is
    # a materialize-to-table step, not an in-memory cache.
    grp = (sh.groupBy("shingle")
           .agg(F.collect_set("doc_id").alias("docs"))
           .filter(F.size("docs") <= JACCARD_DF_CAP)
           .persist())
    sizes = (grp.select(F.explode("docs").alias("doc_id"))
             .groupBy("doc_id").agg(F.count("*").alias("sz")))
    # singleton shingles (the vast majority) contribute no pairs —
    # skip them before the O(cap²) pair expansion
    pairs = (grp.filter(F.size("docs") >= 2)
             .select(F.array_sort("docs").alias("docs"))
             .select(F.explode(F.expr(
                 "flatten(transform(docs, (x, i) -> "
                 "transform(slice(docs, i + 2, size(docs)), "
                 "y -> struct(x AS d1, y AS d2))))")).alias("p")))
    common = (pairs.select("p.d1", "p.d2")
              .groupBy("d1", "d2").agg(F.count("*").alias("common")))
    s1 = sizes.select(F.col("doc_id").alias("d1"),
                      F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"),
                      F.col("sz").alias("sz2"))
    j = (common.join(s1, "d1").join(s2, "d2")
         .select("d1", "d2",
                 micro(F.col("common") /
                       (F.col("sz1") + F.col("sz2") - F.col("common")))
                 .alias("jaccard_micro")))
    return j.orderBy(F.desc("jaccard_micro"), "d1", "d2").limit(20)
