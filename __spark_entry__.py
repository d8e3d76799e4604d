"""Driver contract for the spark-graft builder (PySpark target).

entry()     — flagship BM25 top-20 over the sf0.001 documents table,
              answered THROUGH the posting-list engine (index build +
              block-max WAND via IndexReader).
queries()   — one entry per implemented operator family (SURVEY.md §2):
              BM25/index statistics (DataFrame slice AND engine path),
              joins/windows/top-k, hybrid fusion of the live
              retrievers, cross-encoder rerank, semantic chunkers
              (statistical/cumulative/late), dedup (exact/minhash/
              simhash/jaccard), similarity search (brute cosine + IVF
              + MaxSim), text analysis, event windows/sessionization,
              multimodal plumbing, and the transcripts posting-list
              engine end-to-end (transcripts_bm25_wand).
oracle_sql()— exact DuckDB equivalents for EVERY entry (the stub
              decode kernels are sha256-derived, so even the
              multimodal embeddings are independently recomputable in
              SQL). Floats are exported as micro-rounded
              BIGINTs on BOTH sides so value hashes are immune to
              last-ulp noise; every computed column is aliased
              identically in Spark and SQL. Entries that need inputs
              beyond the driver tables (the WAND engine, multimodal
              features) persist their deterministic inputs to fixed
              /tmp paths that the SQL reads back.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-20 over /root/testdata/sf0.001 documents,
    answered by the posting-list engine (index build + block-max WAND
    query via IndexReader — precomputed n_docs/avgdl from _meta, no
    per-query corpus scan)."""
    from embedanything_spark.operators import docops
    return docops.bm25_topk_indexed(spark, "/root/testdata/sf0.001")


_WAND_ORACLE_DIR = "/tmp/ea_wand_oracle"


def _transcripts_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full posting-list engine end-to-end, DuckDB-oracle-checked:
    build a compressed block index over synthetic transcripts, run the
    frozen query set with block-max WAND pruning. The transcripts and
    query set are persisted to a fixed path so oracle_sql() can score
    the SAME rows independently in DuckDB (tokenizer parity:
    [\\p{L}\\p{N}_]+ over NFC-lowercased text == the frozen analyzer's
    \\w+). Scores are micro-rounded and ranks reassigned on
    (score_micro DESC, doc_id ASC) on BOTH sides; the engine fetches
    k+32 so every candidate that can enter the micro-rounded top-k is
    present. Rank-identity vs the exact numpy oracle (raw f64 scores)
    is additionally asserted in tests/."""
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from embedanything_spark.datagen import (gen_query_set,
                                             gen_transcripts_df)
    from embedanything_spark.index.build import IndexWriter
    from embedanything_spark.index.query import IndexReader
    from embedanything_spark.session import package_zip

    # the caller's session may not have the package on executors
    spark.sparkContext.addPyFile(package_zip())
    root = Path(_WAND_ORACLE_DIR)
    shutil.rmtree(root, ignore_errors=True)
    gen_transcripts_df(spark, 500).write.mode("overwrite").parquet(
        str(root / "transcripts"))
    queries = gen_query_set()
    spark.createDataFrame(queries).write.mode("overwrite").parquet(
        str(root / "queries"))
    transcripts = spark.read.parquet(str(root / "transcripts"))
    IndexWriter(str(root / "index"), num_partitions=8).build(transcripts)
    qfetch = queries.copy()
    qfetch["k"] = qfetch["k"] + 32
    res = IndexReader(spark, str(root / "index")).search(qfetch, prune=True)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id"))
    kmap = F.create_map(*[x for r in queries.itertuples()
                          for x in (F.lit(int(r.query_id)),
                                    F.lit(int(r.k)))])
    return (res
            .withColumn("score_micro",
                        F.round(F.col("score") * 1e6).cast("long"))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= kmap[F.col("query_id")])
            .select("query_id", "rank", "doc_id", "conv_id", "turn_idx",
                    "score_micro"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from embedanything_spark.operators import (chunkers, docops, embedops,
                                               events, similarity)
    return {
        # BM25 / inverted-index statistics (E2, A6, A1)
        "term_tf": docops.term_tf,
        "term_dictionary": docops.term_dictionary,
        "doc_stats": docops.doc_stats,
        "bm25_topk": docops.bm25_topk,
        "bm25_topk_indexed": docops.bm25_topk_indexed,
        # joins / windows / top-k (J2, J3, W2, T2)
        "incremental_antijoin": docops.incremental_antijoin,
        "rank_by_source": docops.rank_by_source,
        "rrf_fusion": docops.rrf_fusion,
        "hybrid_rrf": docops.hybrid_rrf,
        "rerank_topk": docops.rerank_topk,
        # chunking + distinct-count (P1, P2, P3, A5)
        "chunk_text": docops.chunk_text,
        "statistical_chunk": chunkers.statistical_chunk,
        "cumulative_chunk": chunkers.cumulative_chunk,
        "late_chunk": chunkers.late_chunk,
        "distinct_terms": docops.distinct_terms,
        "rolling_window_avg": events.rolling_window_avg,
        # dedup (training-data pipeline)
        "dedup_exact": docops.dedup_exact,
        "dedup_minhash": docops.dedup_minhash,
        "dedup_simhash": docops.dedup_simhash,
        "dedup_ngram_jaccard": docops.dedup_ngram_jaccard,
        # text analysis
        "quality_score": docops.quality_score,
        "token_count": docops.token_count,
        "lang_guess": docops.lang_guess,
        "doc_fingerprint": docops.doc_fingerprint,
        # similarity search
        "knn_cosine": similarity.knn_cosine,
        "ann_ivf": similarity.ann_ivf,
        "near_dup_embeddings": similarity.near_dup_embeddings,
        # embedding-space ops (E4/E5/E6/E10, A3/A4, P5)
        "pool_mean": embedops.pool_mean,
        "pool_cls_last": embedops.pool_cls_last,
        "l2_normalize": embedops.l2_normalize,
        "static_embed": embedops.static_embed,
        "maxsim": embedops.maxsim,
        "maxsim_multi": embedops.maxsim_multi,
        "agg_stats": embedops.agg_stats,
        "cumulative_tokens": embedops.cumulative_tokens,
        "link_strip": embedops.link_strip,
        # event-time semantics (streaming analogs)
        "event_tumbling_window": events.event_tumbling_window,
        "event_sessionize": events.event_sessionize,
        # multimodal plumbing (stubbed decode kernel): metadata AND
        # hash-derived embeddings are DuckDB-oracle-checked against
        # the persisted payloads
        "multimodal_features": _multimodal_features,
        "multimodal_near_dup": _multimodal_near_dup,
        # REAL decode kernels (pure stdlib + numpy — no media libs):
        # PNG zlib inflate + unfilter, DOCX unzip + document.xml walk,
        # PDF Flate-stream Tj/TJ extraction; SQL recomputes each
        # decoded value closed-form from the deterministic payloads
        "image_decode": _image_decode,
        "doc_decode": _doc_decode,
        # the engine itself (DuckDB-oracle-checked: full BM25 over the
        # persisted transcripts, independently tokenized in SQL)
        "transcripts_bm25_wand": _transcripts_bm25,
    }


_MM_ORACLE_DIR = "/tmp/ea_mm_oracle"


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing, DuckDB-oracle-checked on the
    deterministic metadata (width/height from the payload hash,
    n_frames from the video sampling rule): the synthetic assets are
    persisted so oracle_sql() recomputes the same columns in SQL. The
    embedding column is dropped here (it is oracle-checked end-to-end
    by multimodal_near_dup, whose SQL recomputes the sha256-derived
    embedding from the same payloads)."""
    import shutil

    from embedanything_spark.operators.multimodal import (extract_features,
                                                          synth_assets)
    from embedanything_spark.session import package_zip
    spark.sparkContext.addPyFile(package_zip())
    root = Path(_MM_ORACLE_DIR)
    shutil.rmtree(root, ignore_errors=True)
    synth_assets(spark, 120).write.mode("overwrite").parquet(
        str(root / "assets"))
    assets = spark.read.parquet(str(root / "assets"))
    return extract_features(assets).drop("embedding")


_IMG_ORACLE_DIR = "/tmp/ea_img_oracle"


def _image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end (S2 with an actual kernel, not the
    stub): synth_assets(real=True) authors genuine PNGs — a horizontal
    gradient pixel[y,x] = v + x with v = id % 200, dims
    (32 + 8·(id%4)) × (24 + 8·(id%3)), a different scanline filter
    type per id — and image_stats inflates + unfilters the actual
    pixels on executors (mediacodecs.decode_png). The oracle
    recomputes width/height/lum2 (= 2·mean luminance = 2v + w − 1,
    integer-exact) from the id in the path: any decode defect (wrong
    filter reconstruction, wrong dims, wrong bytes) breaks the value
    hash."""
    import shutil

    from embedanything_spark.operators.multimodal import (image_stats,
                                                          synth_assets)
    from embedanything_spark.session import package_zip
    spark.sparkContext.addPyFile(package_zip())
    root = Path(_IMG_ORACLE_DIR)
    shutil.rmtree(root, ignore_errors=True)
    synth_assets(spark, 120, real=True).write.mode("overwrite").parquet(
        str(root / "assets"))
    return image_stats(spark.read.parquet(str(root / "assets")))


def _doc_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL DOCX + PDF text extraction end-to-end (S8/S9 with actual
    kernels): synth_binary_docs authors genuine .docx zips and
    Flate-compressed PDFs whose text embeds the id; decode_documents
    routes them through the Arrow-batched binary decode UDF
    (mediacodecs.docx_to_text / pdf_to_text). The oracle rebuilds the
    decoded text from the path alone — the Spark side must actually
    unzip + parse XML / inflate + parse content-stream operators to
    match."""
    from embedanything_spark.session import package_zip
    from embedanything_spark.sources import (decode_documents,
                                             synth_binary_docs)
    spark.sparkContext.addPyFile(package_zip())
    files = synth_binary_docs(spark, 60)
    return decode_documents(files).select("conv_id", "turn_idx", "text")


def _multimodal_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH near-dup over stub-decoded media embeddings,
    now DuckDB-oracle-checked end-to-end: the assets are persisted and
    the stub embedding is sha256-derived (not RNG), so the oracle
    recomputes embeddings, band signatures (same hyperplane literals)
    and cosine entirely in SQL. Copies (exact-duplicate payloads under
    new paths) are planted deterministically: asset ids 0-4."""
    import shutil

    from pyspark.sql import functions as F

    from embedanything_spark.operators.multimodal import (
        extract_features, near_dup_by_embedding, synth_assets)
    from embedanything_spark.session import package_zip
    spark.sparkContext.addPyFile(package_zip())
    root = Path(_MM_ORACLE_DIR)
    shutil.rmtree(root / "nd_assets", ignore_errors=True)
    synth_assets(spark, 60).write.mode("overwrite").parquet(
        str(root / "nd_assets"))
    assets = spark.read.parquet(str(root / "nd_assets"))
    copies = (assets
              .filter(F.regexp_extract("path", r"(\d{6})\.bin$", 1)
                      .cast("int") < 5)
              .withColumn("path", F.concat(F.col("path"),
                                           F.lit("__copy"))))
    # materialize features BEFORE the LSH: near_dup_by_embedding
    # references its input three times (signature branch + two
    # candidate-pair fetch joins); over an unpersisted mapInPandas
    # frame that would re-decode every asset three times, while a
    # parquet table costs three cheap column-pruned scans — the shape
    # a 100 TB pipeline needs
    shutil.rmtree(root / "nd_feats", ignore_errors=True)
    extract_features(assets.unionByName(copies)) \
        .write.mode("overwrite").parquet(str(root / "nd_feats"))
    feats = spark.read.parquet(str(root / "nd_feats"))
    return (near_dup_by_embedding(feats, threshold=0.99)
            .select("p1", "p2").orderBy("p1", "p2"))


_TOKS = ("SELECT doc_id, unnest(string_split(lower(text),' ')) AS term "
         "FROM documents")
_TOKS_POS = (
    "SELECT doc_id, unnest(l) AS term, generate_subscripts(l,1) AS pos "
    "FROM (SELECT doc_id, list_filter(string_split(lower(text),' '), "
    "x -> x <> '') AS l FROM documents)")
_TF = (f"WITH toks AS ({_TOKS}), "
       "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks "
       "WHERE term <> '' GROUP BY doc_id, term)")
_SHINGLES = (
    f"base AS ({_TOKS_POS}), "
    "sh AS (SELECT DISTINCT t1.doc_id, "
    "t1.term || '_' || t2.term || '_' || t3.term AS shingle "
    "FROM base t1 "
    "JOIN base t2 ON t1.doc_id=t2.doc_id AND t2.pos=t1.pos+1 "
    "JOIN base t3 ON t1.doc_id=t3.doc_id AND t3.pos=t1.pos+2)")


# The engine-side analyzer is NFC-normalize → lower → \w+ (Unicode).
# RE2's [\p{L}\p{N}_]+ over lower(nfc_normalize(text)) matches it
# token-for-token (Python \w == Unicode alnum + underscore).
_WAND_TOKS = (f"regexp_extract_all(lower(nfc_normalize({{col}})), "
              r"'[\p{{L}}\p{{N}}_]+')")

_WAND_SQL = (
    "WITH t AS (SELECT conv_id, turn_idx, text FROM "
    f"read_parquet('{_WAND_ORACLE_DIR}/transcripts/*.parquet')), "
    "d AS (SELECT conv_id, turn_idx, "
    " row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id, "
    f" {_WAND_TOKS.format(col='text')} AS toks FROM t), "
    "dl AS (SELECT doc_id, conv_id, turn_idx, len(toks)::BIGINT AS "
    " doclen FROM d), "
    "st AS (SELECT count(*)::DOUBLE AS n, avg(doclen)::DOUBLE AS avgdl "
    " FROM dl), "
    "tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM "
    " (SELECT doc_id, unnest(toks) AS term FROM d) GROUP BY doc_id, "
    " term), "
    "dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term), "
    "q AS (SELECT query_id, k, unnest(list_distinct("
    f" {_WAND_TOKS.format(col='query_text')})) AS term FROM "
    f" read_parquet('{_WAND_ORACLE_DIR}/queries/*.parquet')), "
    "contrib AS (SELECT q.query_id, q.k, tf.doc_id, "
    " ln(1.0 + (st.n - dft.df + 0.5)/(dft.df + 0.5)) * "
    " (tf.tf * (1.2 + 1.0)) / "
    " (tf.tf + 1.2*((1.0 - 0.75) + 0.75*dl2.doclen/st.avgdl)) AS c "
    " FROM q JOIN dft USING(term) JOIN tf USING(term) "
    " JOIN dl dl2 ON dl2.doc_id = tf.doc_id CROSS JOIN st), "
    "sc AS (SELECT query_id, k, doc_id, "
    " CAST(ROUND(sum(c)*1e6) AS BIGINT) AS score_micro FROM contrib "
    " GROUP BY query_id, k, doc_id), "
    "rr AS (SELECT query_id, doc_id, score_micro, k, "
    " row_number() OVER (PARTITION BY query_id "
    " ORDER BY score_micro DESC, doc_id) AS rnk FROM sc) "
    "SELECT rr.query_id, rr.rnk::BIGINT AS \"rank\", rr.doc_id, "
    "dl.conv_id, dl.turn_idx, rr.score_micro "
    "FROM rr JOIN dl USING(doc_id) WHERE rr.rnk <= rr.k")


def _chunker_sql(boundary: str, th_join: str, frame: str) -> str:
    """Shared oracle for the semantic chunkers: deterministic 4-dim
    window embeddings → cosine vs a preceding-frame mean → boundary
    predicate → running chunk ids → per-chunk integral rollup."""
    dims = ", ".join(
        f"avg((CAST(('0x' || substring(md5(term),{1 + 6 * d},6)) AS "
        f"BIGINT) % 1000000)/1000000.0) AS e{d}" for d in range(4))
    rolls = ", ".join(
        f"avg(e{d}) OVER (PARTITION BY doc_id ORDER BY win_id {frame}) "
        f"AS r{d}" for d in range(4))
    dot = "+".join(f"e{d}*r{d}" for d in range(4))
    ne = "+".join(f"e{d}*e{d}" for d in range(4))
    nr = "+".join(f"r{d}*r{d}" for d in range(4))
    return (
        f"WITH base AS ({_TOKS_POS}), "
        "wins AS (SELECT doc_id, CAST(floor((pos-1)/10.0) AS BIGINT) AS "
        f"win_id, count(*) AS n_tok, {dims} FROM base "
        " GROUP BY doc_id, win_id), "
        f"r AS (SELECT *, {rolls} FROM wins), "
        f"sim AS (SELECT *, ({dot})/(sqrt({ne})*sqrt({nr})) AS sim "
        " FROM r), "
        f"b AS (SELECT sim.*, ({boundary}) AS boundary FROM sim "
        f"{th_join}), "
        "c AS (SELECT *, sum(CASE WHEN boundary THEN 1 ELSE 0 END) OVER "
        " (PARTITION BY doc_id ORDER BY win_id ROWS UNBOUNDED PRECEDING) "
        " AS chunk_id FROM b) "
        "SELECT doc_id, chunk_id::BIGINT AS chunk_id, "
        "min(win_id)::BIGINT AS start_win, count(*)::BIGINT AS n_windows, "
        "sum(n_tok)::BIGINT AS n_tokens, "
        "CAST(ceil(sum(n_tok)/80.0) AS BIGINT) AS n_subchunks "
        "FROM c GROUP BY doc_id, chunk_id")


def _near_dup_sql() -> str:
    """Code-generated oracle for banded sign-LSH near-dup: the SAME
    hyperplane literals as the Spark plan, 32 sign bits → 4×8-bit band
    signatures, candidates share a band, cosine-filtered. Planted
    scaled copies (vec_id+10000, embedding×2) are unioned in SQL too."""
    from embedanything_spark.operators.similarity import (
        NEAR_DUP_BANDS, NEAR_DUP_PLANES, NEAR_DUP_THRESHOLD,
        near_dup_planes)
    planes = near_dup_planes()
    signs = ", ".join(
        "CASE WHEN (" + " + ".join(
            f"embedding[{i + 1}]*({v!r})" for i, v in enumerate(p)) +
        f") >= 0 THEN '1' ELSE '0' END AS s{j}"
        for j, p in enumerate(planes))
    per = NEAR_DUP_PLANES // NEAR_DUP_BANDS
    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {b} AS band, " +
        "||".join(f"s{b * per + k}" for k in range(per)) +
        " AS sig FROM s" for b in range(NEAR_DUP_BANDS))
    return (
        "WITH u AS (SELECT vec_id, embedding FROM embeddings "
        " UNION ALL SELECT vec_id + 10000, "
        " list_transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) "
        " AS FLOAT)) FROM embeddings WHERE vec_id < 10), "
        f"s AS (SELECT vec_id, embedding, {signs} FROM u), "
        f"bands AS ({band_rows}) "
        "SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2, "
        "CAST(ROUND(list_cosine_similarity(a.embedding, b.embedding)"
        "*1e6) AS BIGINT) AS cos_micro "
        "FROM bands a JOIN bands b ON a.band = b.band AND "
        "a.sig = b.sig AND a.vec_id < b.vec_id "
        f"WHERE CAST(ROUND(list_cosine_similarity(a.embedding, "
        f"b.embedding)*1e6) AS BIGINT) >= "
        f"{int(NEAR_DUP_THRESHOLD * 1e6)} ORDER BY v1, v2")


def _mm_near_dup_sql() -> str:
    """Code-generated oracle for multimodal near-dup: recompute the
    stub-decode embedding from the persisted payloads (sha256-derived
    components, unnormalized doubles — normalization is a positive
    scale so sign bits and cosine are unaffected), band with the SAME
    hyperplane literals as the Spark plan, join on full-band matches,
    cosine-filter, emit pairs."""
    from embedanything_spark.operators.multimodal import (
        EMBED_DIM, N_BANDS, N_PLANES, mm_planes)
    planes = mm_planes()
    comps = ", ".join(
        f"(CAST(('0x' || substr(sha256(hx || '-{d}'),1,8)) AS BIGINT) "
        f"% 1000000)/1000000.0 - 0.5 AS e{d}"
        for d in range(EMBED_DIM))
    emb = "[" + ", ".join(f"e{d}" for d in range(EMBED_DIM)) + "]"
    signs = ", ".join(
        "CASE WHEN (" + " + ".join(
            f"e{i}*({float(v)!r})" for i, v in enumerate(p)) +
        f") >= 0 THEN '1' ELSE '0' END AS s{j}"
        for j, p in enumerate(planes))
    per = N_PLANES // N_BANDS
    band_rows = " UNION ALL ".join(
        f"SELECT path, emb, {b} AS band, " +
        "||".join(f"s{b * per + k}" for k in range(per)) +
        " AS sig FROM v" for b in range(N_BANDS))
    return (
        "WITH a AS (SELECT path, content FROM "
        f"read_parquet('{_MM_ORACLE_DIR}/nd_assets/*.parquet')), "
        "u AS (SELECT path, content FROM a UNION ALL "
        " SELECT path || '__copy', content FROM a "
        " WHERE CAST(regexp_extract(path, '(\\d{6})\\.bin$', 1) AS "
        " INTEGER) < 5), "
        "h AS (SELECT path, sha256(lower(hex(content))) AS hx FROM u), "
        f"e AS (SELECT path, {comps} FROM h), "
        f"v AS (SELECT path, {emb} AS emb, {signs} FROM e), "
        f"bands AS ({band_rows}) "
        "SELECT DISTINCT a.path AS p1, b.path AS p2 "
        "FROM bands a JOIN bands b ON a.band = b.band AND "
        "a.sig = b.sig AND a.path < b.path "
        "WHERE list_cosine_similarity(a.emb, b.emb) >= 0.99 "
        "ORDER BY p1, p2")


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts_bm25_wand": _WAND_SQL,
        "near_dup_embeddings": _near_dup_sql(),
        "multimodal_near_dup": _mm_near_dup_sql(),

        "term_tf": f"{_TF} SELECT doc_id, term, tf FROM tf",

        "term_dictionary":
            f"{_TF} SELECT term, count(*)::BIGINT AS df, "
            "sum(tf)::BIGINT AS cf FROM tf GROUP BY term",

        "doc_stats":
            f"WITH toks AS ({_TOKS}), "
            "c AS (SELECT doc_id, count(*)::BIGINT AS cnt FROM toks "
            "WHERE term <> '' GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(c.cnt, 0)::BIGINT AS doclen "
            "FROM documents d LEFT JOIN c USING(doc_id)",

        "bm25_topk":
            f"{_TF}, "
            "dl AS (SELECT d.doc_id, coalesce(c.cnt,0)::BIGINT AS doclen "
            " FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS cnt "
            " FROM toks WHERE term <> '' GROUP BY doc_id) c USING(doc_id)), "
            "st AS (SELECT count(*)::DOUBLE AS n, avg(doclen)::DOUBLE AS "
            " avgdl FROM dl), "
            "dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf "
            " GROUP BY term), "
            "contrib AS (SELECT tf.doc_id, "
            " ln(1.0 + (st.n - dft.df + 0.5)/(dft.df + 0.5)) * "
            " (tf.tf * (1.2 + 1.0)) / "
            " (tf.tf + 1.2*((1.0 - 0.75) + 0.75*dl.doclen/st.avgdl)) AS c "
            " FROM tf JOIN dft USING(term) JOIN dl USING(doc_id) "
            " CROSS JOIN st "
            " WHERE tf.term IN ('spark','join','filter')) "
            "SELECT doc_id, CAST(ROUND(sum(c)*1e6) AS BIGINT) AS "
            "score_micro FROM contrib GROUP BY doc_id "
            "ORDER BY score_micro DESC, doc_id LIMIT 20",

        # same oracle as bm25_topk — the engine path must reproduce the
        # index-less DataFrame plan exactly
        "bm25_topk_indexed":
            f"{_TF}, "
            "dl AS (SELECT d.doc_id, coalesce(c.cnt,0)::BIGINT AS doclen "
            " FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS cnt "
            " FROM toks WHERE term <> '' GROUP BY doc_id) c USING(doc_id)), "
            "st AS (SELECT count(*)::DOUBLE AS n, avg(doclen)::DOUBLE AS "
            " avgdl FROM dl), "
            "dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf "
            " GROUP BY term), "
            "contrib AS (SELECT tf.doc_id, "
            " ln(1.0 + (st.n - dft.df + 0.5)/(dft.df + 0.5)) * "
            " (tf.tf * (1.2 + 1.0)) / "
            " (tf.tf + 1.2*((1.0 - 0.75) + 0.75*dl.doclen/st.avgdl)) AS c "
            " FROM tf JOIN dft USING(term) JOIN dl USING(doc_id) "
            " CROSS JOIN st "
            " WHERE tf.term IN ('spark','join','filter')) "
            "SELECT doc_id, CAST(ROUND(sum(c)*1e6) AS BIGINT) AS "
            "score_micro FROM contrib GROUP BY doc_id "
            "ORDER BY score_micro DESC, doc_id LIMIT 20",

        "incremental_antijoin":
            "SELECT doc_id, source FROM documents WHERE doc_id NOT IN "
            "(SELECT doc_id FROM documents WHERE doc_id % 7 = 0)",

        "rank_by_source":
            "SELECT * FROM (SELECT source, doc_id, n_chars, "
            "row_number() OVER (PARTITION BY source ORDER BY n_chars "
            "DESC, doc_id)::BIGINT AS rnk FROM documents) WHERE rnk <= 3",

        "rrf_fusion":
            f"WITH toks AS ({_TOKS}), "
            "dl AS (SELECT d.doc_id, coalesce(c.cnt,0)::BIGINT AS doclen "
            " FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS cnt "
            " FROM toks WHERE term <> '' GROUP BY doc_id) c USING(doc_id)), "
            # each retriever contributes a TOP-50 prefetch list (the
            # reference fuses bounded prefetch lists), mirroring the
            # Spark side's distributed top-k-then-rank
            "r1 AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars "
            " DESC, doc_id) AS r FROM documents), "
            "r2 AS (SELECT doc_id, row_number() OVER (ORDER BY doclen "
            " DESC, doc_id) AS r FROM dl), "
            "u AS (SELECT * FROM r1 WHERE r <= 50 "
            " UNION ALL SELECT * FROM r2 WHERE r <= 50) "
            "SELECT doc_id, CAST(ROUND(sum(1.0/(60.0 + r))*1e6) AS BIGINT) "
            "AS rrf_micro FROM u GROUP BY doc_id "
            "ORDER BY rrf_micro DESC, doc_id LIMIT 15",

        # live sparse (BM25) × live dense retriever fusion; the dense
        # side is the IVF PROBE (nearest centroid → in-cluster cosine
        # top-50), mirroring similarity.ivf_cluster_scored — the same
        # centroid arithmetic as the ann_ivf oracle below
        "hybrid_rrf":
            f"{_TF}, "
            "dl AS (SELECT d.doc_id, coalesce(c.cnt,0)::BIGINT AS doclen "
            " FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS cnt "
            " FROM toks WHERE term <> '' GROUP BY doc_id) c USING(doc_id)), "
            "st AS (SELECT count(*)::DOUBLE AS n, avg(doclen)::DOUBLE AS "
            " avgdl FROM dl), "
            "dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf "
            " GROUP BY term), "
            "contrib AS (SELECT tf.doc_id, "
            " ln(1.0 + (st.n - dft.df + 0.5)/(dft.df + 0.5)) * "
            " (tf.tf * (1.2 + 1.0)) / "
            " (tf.tf + 1.2*((1.0 - 0.75) + 0.75*dl.doclen/st.avgdl)) AS c "
            " FROM tf JOIN dft USING(term) JOIN dl USING(doc_id) "
            " CROSS JOIN st "
            " WHERE tf.term IN ('spark','join','filter')), "
            "sc AS (SELECT doc_id, CAST(ROUND(sum(c)*1e6) AS BIGINT) AS "
            " score_micro FROM contrib GROUP BY doc_id), "
            "r1 AS (SELECT doc_id, row_number() OVER (ORDER BY "
            " score_micro DESC, doc_id) AS r FROM sc), "
            "q AS (SELECT embedding AS qv FROM embeddings "
            " WHERE vec_id = 0), "
            "edims AS (SELECT vec_id, label, "
            " unnest(embedding)::DOUBLE AS v, "
            " generate_subscripts(embedding,1) AS dim FROM embeddings), "
            "cents AS (SELECT label, list(avg_v ORDER BY dim) AS "
            " centroid FROM (SELECT label, dim, avg(v) AS avg_v "
            " FROM edims GROUP BY label, dim) GROUP BY label), "
            "best AS (SELECT label FROM cents, q ORDER BY "
            " list_cosine_similarity(centroid, qv) DESC, label LIMIT 1), "
            "cosd AS (SELECT vec_id AS doc_id, CAST(ROUND("
            " list_cosine_similarity(embedding, qv)*1e6) AS BIGINT) AS "
            " cos_micro FROM embeddings, q WHERE vec_id <> 0 "
            " AND label = (SELECT label FROM best)), "
            "r2 AS (SELECT doc_id, row_number() OVER (ORDER BY "
            " cos_micro DESC, doc_id) AS r FROM cosd), "
            "u AS (SELECT * FROM r1 WHERE r <= 50 "
            " UNION ALL SELECT * FROM r2 WHERE r <= 50) "
            "SELECT doc_id, CAST(ROUND(sum(1.0/(60.0 + r))*1e6) AS "
            "BIGINT) AS rrf_micro FROM u GROUP BY doc_id "
            "ORDER BY rrf_micro DESC, doc_id LIMIT 15",

        # classical lexical cross-scorer (index/rerank.py) over the
        # BM25 top-20: sigmoid(4·coverage + 2·tf-saturation +
        # 1·exact-phrase − 3), exact arithmetic replicated here
        "rerank_topk":
            f"{_TF}, "
            "dl AS (SELECT d.doc_id, coalesce(c.cnt,0)::BIGINT AS doclen "
            " FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS cnt "
            " FROM toks WHERE term <> '' GROUP BY doc_id) c USING(doc_id)), "
            "st AS (SELECT count(*)::DOUBLE AS n, avg(doclen)::DOUBLE AS "
            " avgdl FROM dl), "
            "dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf "
            " GROUP BY term), "
            "contrib AS (SELECT tf.doc_id, "
            " ln(1.0 + (st.n - dft.df + 0.5)/(dft.df + 0.5)) * "
            " (tf.tf * (1.2 + 1.0)) / "
            " (tf.tf + 1.2*((1.0 - 0.75) + 0.75*dl.doclen/st.avgdl)) AS c "
            " FROM tf JOIN dft USING(term) JOIN dl USING(doc_id) "
            " CROSS JOIN st "
            " WHERE tf.term IN ('spark','join','filter')), "
            "sc AS (SELECT doc_id, CAST(ROUND(sum(c)*1e6) AS BIGINT) AS "
            " score_micro FROM contrib GROUP BY doc_id "
            " ORDER BY score_micro DESC, doc_id LIMIT 20), "
            "p AS (SELECT sc.doc_id, sc.score_micro, "
            " list_filter(string_split(lower(d.text),' '), "
            "  x -> x <> '') AS tl "
            " FROM sc JOIN documents d USING(doc_id)), "
            "s AS (SELECT doc_id, score_micro, "
            " len(list_filter(tl, x -> x = 'spark'))::DOUBLE AS tfs, "
            " len(list_filter(tl, x -> x = 'join'))::DOUBLE AS tfj, "
            " len(list_filter(tl, x -> x = 'filter'))::DOUBLE AS tff, "
            " CASE WHEN contains(' ' || array_to_string(tl, ' ') || "
            "  ' ', ' spark join filter ') THEN 1.0 ELSE 0.0 END "
            " AS phrase FROM p), "
            "sg AS (SELECT doc_id, score_micro, CAST(ROUND((1.0/(1.0 + "
            " exp(-(4.0*((CASE WHEN tfs > 0 THEN 1 ELSE 0 END + "
            "  CASE WHEN tfj > 0 THEN 1 ELSE 0 END + "
            "  CASE WHEN tff > 0 THEN 1 ELSE 0 END)/3.0) + "
            " 2.0*((tff/(tff+1.0) + tfj/(tfj+1.0) + tfs/(tfs+1.0))/3.0)"
            " + 1.0*phrase - 3.0))))*1e6) AS BIGINT) "
            " AS rerank_micro FROM s) "
            "SELECT doc_id, score_micro, rerank_micro, "
            "row_number() OVER (ORDER BY rerank_micro DESC, doc_id)"
            "::BIGINT AS \"rank\" FROM sg",

        "chunk_text":
            "SELECT doc_id, s::BIGINT AS chunk_start, "
            "substring(text, s::INTEGER + 1, 120) AS chunk, "
            "length(substring(text, s::INTEGER + 1, 120))::BIGINT AS "
            "chunk_len FROM (SELECT doc_id, text, "
            "unnest(generate_series(0, length(text)-1, 90)) AS s "
            "FROM documents WHERE length(text) > 0)",

        "statistical_chunk": _chunker_sql(
            "sim IS NULL OR sim < th",
            "LEFT JOIN (SELECT doc_id, quantile_cont(sim, 0.25) AS th "
            "FROM sim WHERE sim IS NOT NULL GROUP BY doc_id) th "
            "USING(doc_id)",
            "ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING"),

        "cumulative_chunk": _chunker_sql(
            "sim IS NULL OR sim < 0.98", "",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING"),

        # multimodal decode metadata recomputed from the persisted
        # payloads (stub kernel contract: width/height = 64 + first
        # two sha256 bytes of the lowercase-hex payload; n_frames =
        # every-Nth cap 10 for video)
        "multimodal_features":
            "WITH a AS (SELECT * FROM "
            f"read_parquet('{_MM_ORACLE_DIR}/assets/*.parquet')), "
            "h AS (SELECT path, modality, length, "
            " sha256(lower(hex(content))) AS hx FROM a) "
            "SELECT path, modality, "
            "CAST(64 + CAST(('0x' || substr(hx,1,2)) AS INTEGER) AS "
            "INTEGER) AS width, "
            "CAST(64 + CAST(('0x' || substr(hx,3,2)) AS INTEGER) AS "
            "INTEGER) AS height, "
            "CAST(CASE WHEN modality = 'video' THEN "
            "least(10, greatest(1, length // 512)) ELSE 1 END AS "
            "INTEGER) AS n_frames FROM h",

        # REAL PNG decode: width/height/luminance recomputed from the
        # id in the path (gradient closed form: mean = v + (w-1)/2,
        # v = id % 200, w = 32 + 8*(id%4), h = 24 + 8*(id%3));
        # the Spark side zlib-inflates + unfilters the actual pixels
        "image_decode":
            "WITH a AS (SELECT path, CAST(regexp_extract(path, "
            "'([0-9]+)\\.png$', 1) AS BIGINT) AS i FROM "
            f"read_parquet('{_IMG_ORACLE_DIR}/assets/*.parquet') "
            "WHERE modality = 'image') "
            "SELECT path, CAST(32 + 8 * (i % 4) AS INTEGER) AS width, "
            "CAST(24 + 8 * (i % 3) AS INTEGER) AS height, "
            "CAST(2 * (i % 200) + 32 + 8 * (i % 4) - 1 AS BIGINT) "
            "AS lum2 FROM a",

        # REAL DOCX/PDF text extraction: even ids are .docx (two
        # paragraphs joined by \n), odd ids .pdf (two Tj lines joined
        # by space); text reconstructed from the id alone
        "doc_decode":
            "WITH i AS (SELECT * FROM range(60)), "
            "d AS (SELECT CASE WHEN range % 2 = 0 THEN "
            "'/docs/' || lpad(CAST(range AS VARCHAR), 6, '0') || "
            "'.docx' ELSE '/docs/' || lpad(CAST(range AS VARCHAR), 6, "
            "'0') || '.pdf' END AS conv_id, "
            "CASE WHEN range % 2 = 0 THEN "
            "'para one of ' || range || chr(10) || 'para two of ' || "
            "range ELSE 'line one of ' || range || ' line two of ' || "
            "range END AS text FROM i) "
            "SELECT conv_id, CAST(0 AS INTEGER) AS turn_idx, text "
            "FROM d",

        # E3 late chunking: contextual (±2-doc window) static-embed
        # scalar, mean-pooled per fixed 4-doc chunk within source
        "late_chunk":
            f"WITH toks AS ({_TOKS}), "
            "e AS (SELECT doc_id, avg((CAST(('0x' || "
            " substring(md5(term),1,12)) AS BIGINT) % 1000000)/1000000.0)"
            " AS e FROM toks WHERE term <> '' GROUP BY doc_id), "
            "d AS (SELECT d.source, d.doc_id, coalesce(e.e, 0.0) AS e "
            " FROM documents d LEFT JOIN e USING(doc_id)), "
            "c AS (SELECT source, doc_id, avg(e) OVER (PARTITION BY "
            " source ORDER BY doc_id ROWS BETWEEN 2 PRECEDING AND "
            " 2 FOLLOWING) AS c FROM d), "
            "s AS (SELECT source, c, CAST(floor((row_number() OVER "
            " (PARTITION BY source ORDER BY doc_id) - 1) / 4.0) AS "
            " BIGINT) AS chunk_id FROM c) "
            "SELECT source, chunk_id, count(*)::BIGINT AS n_docs, "
            "CAST(ROUND(avg(c)*1e6) AS BIGINT) AS late_micro "
            "FROM s GROUP BY source, chunk_id",

        "distinct_terms":
            f"WITH toks AS ({_TOKS}) "
            "SELECT source, count(DISTINCT term)::BIGINT AS "
            "n_distinct_terms, count(*)::BIGINT AS n_tokens "
            "FROM toks JOIN documents USING(doc_id) WHERE term <> '' "
            "GROUP BY source",

        "rolling_window_avg":
            "SELECT user_id, event_id, CAST(ROUND(coalesce(avg(value) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING), -1.0)*1e6) AS "
            "BIGINT) AS prev_avg_micro FROM events",

        "dedup_exact":
            "SELECT min(doc_id)::BIGINT AS keeper, count(*)::BIGINT AS "
            "n_dups FROM documents GROUP BY md5(lower(text))",

        "dedup_minhash":
            f"WITH {_SHINGLES}, "
            "hh AS (SELECT doc_id, "
            " CAST(('0x' || substring(md5(shingle),1,8)) AS BIGINT) "
            "  AS h1, "
            " CAST(('0x' || substring(md5(shingle),9,8)) AS BIGINT) "
            "  AS h2 FROM sh), "
            "mh AS (SELECT doc_id, seed, "
            " min((h1 + seed * h2) % 4294967291) AS mh FROM hh "
            " CROSS JOIN (SELECT unnest(range(8)) AS seed) "
            " GROUP BY doc_id, seed), "
            "bands AS (SELECT doc_id, CAST(floor(seed/2.0) AS INTEGER) AS "
            " band, string_agg(mh, '|' ORDER BY mh) AS sig FROM mh "
            " GROUP BY doc_id, CAST(floor(seed/2.0) AS INTEGER)), "
            "pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 "
            " FROM bands a JOIN bands b ON a.band=b.band AND a.sig=b.sig "
            " AND a.doc_id < b.doc_id) "
            "SELECT count(*)::BIGINT AS n_candidate_pairs, "
            "coalesce(min(d1), -1)::BIGINT AS min_d1 FROM pairs",

        "dedup_simhash":
            f"{_TF}, "
            "h AS (SELECT doc_id, tf, "
            " CAST(('0x' || substring(md5(term),1,8)) AS BIGINT) AS h_lo, "
            " CAST(('0x' || substring(md5(term),9,8)) AS BIGINT) AS h_hi "
            " FROM tf), "
            "bits AS (SELECT doc_id, b, "
            " sum(((((CASE WHEN b < 32 THEN h_lo ELSE h_hi END) "
            " >> (b % 32)) & 1)*2 - 1) * tf) AS v FROM h CROSS JOIN "
            " (SELECT unnest(range(64)) AS b) GROUP BY doc_id, b) "
            "SELECT doc_id, "
            "CAST(sum(CASE WHEN v > 0 AND b >= 32 THEN "
            "(1::BIGINT << (b - 32)) ELSE 0 END) AS BIGINT) AS simhash_hi, "
            "CAST(sum(CASE WHEN v > 0 AND b < 32 THEN (1::BIGINT << b) "
            "ELSE 0 END) AS BIGINT) AS simhash_lo "
            "FROM bits GROUP BY doc_id",

        "dedup_ngram_jaccard":
            f"WITH {_SHINGLES}, "
            # rare-shingle universe: df-capped symmetrically (sizes AND
            # common counts), mirroring the Spark hot-shingle anti-join
            "rare AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN "
            " (SELECT shingle FROM sh GROUP BY shingle "
            "  HAVING count(*) <= 64) USING(shingle)), "
            "sizes AS (SELECT doc_id, count(*)::BIGINT AS sz FROM rare "
            " GROUP BY doc_id), "
            "common AS (SELECT a.doc_id AS d1, b.doc_id AS d2, "
            " count(*)::BIGINT AS common FROM rare a JOIN rare b "
            " ON a.shingle=b.shingle AND a.doc_id < b.doc_id "
            " GROUP BY a.doc_id, b.doc_id) "
            "SELECT d1, d2, CAST(ROUND((common / (s1.sz + s2.sz - common))"
            "*1e6) AS BIGINT) AS jaccard_micro FROM common "
            "JOIN sizes s1 ON s1.doc_id = d1 "
            "JOIN sizes s2 ON s2.doc_id = d2 "
            "ORDER BY jaccard_micro DESC, d1, d2 LIMIT 20",

        "quality_score":
            f"{_TF}, "
            "agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens, "
            " count(*)::BIGINT AS n_distinct, "
            " sum(CASE WHEN term IN ('the','a','of','and','to','in','is',"
            "'it') THEN tf ELSE 0 END)::BIGINT AS n_stop FROM tf "
            " GROUP BY doc_id) "
            "SELECT doc_id, n_tokens, n_distinct, n_stop, "
            "CAST(ROUND((least(n_tokens/100.0, 1.0)*0.4 + "
            "(n_distinct/n_tokens)*0.4 + (1.0 - n_stop/n_tokens)*0.2)"
            "*1e6) AS BIGINT) AS quality_micro FROM agg",

        "token_count":
            "SELECT source, "
            "sum(len(list_filter(string_split(text,' '), x -> x <> '')))"
            "::BIGINT AS ws_tokens, "
            "sum(len(regexp_extract_all(text, '[a-z0-9]+')))::BIGINT AS "
            "re_tokens, count(*)::BIGINT AS n_docs "
            "FROM documents GROUP BY source",

        "lang_guess":
            "SELECT CASE "
            "WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'cjk' "
            "WHEN regexp_matches(text, '[^\\x00-\\x7f]') THEN 'latin_ext' "
            "WHEN length(text) < 50 THEN 'short' ELSE 'ascii' END AS "
            "guess, lang, count(*)::BIGINT AS n FROM documents "
            "GROUP BY guess, lang",

        "doc_fingerprint":
            f"WITH toks AS ({_TOKS_POS}) "
            "SELECT doc_id, CAST(sum((CAST(('0x' || "
            "substring(md5(term),1,12)) AS BIGINT) % 2147483648) * pos) "
            "% 2147483648 AS BIGINT) AS fingerprint "
            "FROM toks GROUP BY doc_id",

        "knn_cosine":
            "WITH q AS (SELECT embedding AS qv FROM embeddings "
            "WHERE vec_id = 0) "
            "SELECT vec_id, CAST(ROUND(list_cosine_similarity(embedding, "
            "qv)*1e6) AS BIGINT) AS cos_micro FROM embeddings, q "
            "WHERE vec_id <> 0 ORDER BY cos_micro DESC, vec_id LIMIT 10",

        "ann_ivf":
            "WITH dims AS (SELECT vec_id, label, "
            " unnest(embedding)::DOUBLE AS v, "
            " generate_subscripts(embedding,1) AS dim FROM embeddings), "
            "cents AS (SELECT label, list(avg_v ORDER BY dim) AS centroid "
            " FROM (SELECT label, dim, avg(v) AS avg_v FROM dims "
            " GROUP BY label, dim) GROUP BY label), "
            "q AS (SELECT embedding AS qv FROM embeddings WHERE "
            " vec_id = 0), "
            "best AS (SELECT label FROM cents, q ORDER BY "
            " list_cosine_similarity(centroid, qv) DESC, label LIMIT 1) "
            "SELECT vec_id, CAST(ROUND(list_cosine_similarity(embedding, "
            "qv)*1e6) AS BIGINT) AS cos_micro FROM embeddings, q "
            "WHERE label = (SELECT label FROM best) AND vec_id <> 0 "
            "ORDER BY cos_micro DESC, vec_id LIMIT 10",

        "pool_mean":
            "WITH dims AS (SELECT label, unnest(embedding)::DOUBLE AS v, "
            "(generate_subscripts(embedding,1)-1)::INTEGER AS dim "
            "FROM embeddings) "
            "SELECT label, dim, CAST(ROUND(avg(v)*1e6) AS BIGINT) AS "
            "mean_micro, count(*)::BIGINT AS n FROM dims WHERE dim < 4 "
            "GROUP BY label, dim",

        "pool_cls_last":
            "WITH o AS (SELECT label, vec_id, embedding[1]::DOUBLE AS "
            "d0, row_number() OVER (PARTITION BY label ORDER BY vec_id)"
            " AS rf, row_number() OVER (PARTITION BY label ORDER BY "
            "vec_id DESC) AS rl FROM embeddings) "
            "SELECT label, "
            "CAST(ROUND(max(CASE WHEN rf = 1 THEN d0 END)*1e6) AS "
            "BIGINT) AS cls_dim0_micro, "
            "CAST(ROUND(max(CASE WHEN rl = 1 THEN d0 END)*1e6) AS "
            "BIGINT) AS last_dim0_micro, "
            "count(*)::BIGINT AS n FROM o GROUP BY label",

        "l2_normalize":
            "SELECT vec_id, CAST(ROUND((embedding[1]::DOUBLE / "
            "sqrt(list_sum(list_transform(embedding, "
            "x -> x::DOUBLE * x::DOUBLE))))*1e6) AS BIGINT) AS "
            "unit_dim0_micro FROM embeddings WHERE vec_id < 50",

        "static_embed":
            f"WITH toks AS ({_TOKS}), "
            "v AS (SELECT doc_id, (CAST(('0x' || "
            "substring(md5(term),1,12)) AS BIGINT) % 1000000) / 1000000 "
            "AS val FROM toks WHERE term <> '') "
            "SELECT doc_id, CAST(ROUND(avg(val)*1e6) AS BIGINT) AS "
            "embed_micro, count(*)::BIGINT AS n_tokens FROM v "
            "GROUP BY doc_id",

        "maxsim":
            "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE "
            "vec_id = 0) "
            "SELECT label, CAST(ROUND(max(list_cosine_similarity("
            "embedding, qv))*1e6) AS BIGINT) AS maxsim_micro "
            "FROM embeddings, q GROUP BY label",

        "maxsim_multi":
            "WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM "
            " embeddings WHERE vec_id < 3), "
            "s AS (SELECT e.label, q.qid, "
            " max(list_cosine_similarity(e.embedding, q.qv)) AS m "
            " FROM embeddings e, q GROUP BY e.label, q.qid) "
            "SELECT label, CAST(ROUND(sum(m)*1e6) AS BIGINT) AS "
            "maxsim_micro FROM s GROUP BY label",

        "agg_stats":
            "SELECT source, CAST(ROUND(quantile_cont(n_chars, 0.5)*1e6) "
            "AS BIGINT) AS median_micro, "
            "CAST(ROUND(stddev_samp(n_chars)*1e6) AS BIGINT) AS "
            "stddev_micro, count(*)::BIGINT AS n "
            "FROM documents GROUP BY source",

        "cumulative_tokens":
            f"WITH toks AS ({_TOKS}), "
            "c AS (SELECT d.doc_id, coalesce(x.cnt,0)::BIGINT AS doclen "
            " FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS cnt "
            " FROM toks WHERE term <> '' GROUP BY doc_id) x "
            " USING(doc_id)) "
            "SELECT d.source, c.doc_id, "
            "sum(c.doclen) OVER (PARTITION BY d.source ORDER BY c.doc_id "
            "ROWS UNBOUNDED PRECEDING)::BIGINT AS running_tokens "
            "FROM c JOIN documents d USING(doc_id)",

        "link_strip":
            "SELECT doc_id, length(regexp_replace(text, "
            "'\\[([^\\]]+)\\]\\([^\\)]+\\)', '\\1', 'g'))::BIGINT AS "
            "stripped_len FROM documents",

        "event_tumbling_window":
            "SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS hour_id, "
            "event_type, "
            "count(*)::BIGINT AS n, "
            "CAST(ROUND(avg(value)*1e6) AS BIGINT) AS avg_value_micro, "
            "CAST(ROUND(sum(value)*1e6) AS BIGINT) AS sum_value_micro "
            "FROM events GROUP BY hour_id, event_type",

        "event_sessionize":
            "WITH g AS (SELECT user_id, ts, event_id, "
            " epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            " ORDER BY ts, event_id) AS gap FROM events), "
            "m AS (SELECT user_id, ts, event_id, CASE WHEN gap IS NULL "
            " OR gap > 1800000000 THEN 1 ELSE 0 END AS new_sess FROM g), "
            "s AS (SELECT user_id, event_id, sum(new_sess) OVER "
            " (PARTITION BY user_id ORDER BY ts, event_id "
            " ROWS UNBOUNDED PRECEDING) AS sess_id FROM m), "
            "ps AS (SELECT user_id, sess_id, count(*)::BIGINT AS n_events "
            " FROM s GROUP BY user_id, sess_id) "
            "SELECT user_id, count(*)::BIGINT AS n_sessions, "
            "sum(n_events)::BIGINT AS n_events, "
            "CAST(ROUND(avg(n_events)*1e6) AS BIGINT) AS avg_events_micro "
            "FROM ps GROUP BY user_id",
    }
