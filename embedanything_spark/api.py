"""Reference-shaped Python API (the `embed_anything` module surface,
`python/python/embed_anything/_embed_anything.pyi`), backed by the
Spark engine — so a user of the reference's top-level calls can switch
with the same verbs:

  reference                                  here
  ---------                                  ----
  embed_file(path, embedder, config)      →  embed_file(spark, path)
  embed_directory_stream(dir, …, adapter) →  embed_directory(spark,
                                              dir, index_root)
  embed_query(queries, embedder)          →  embed_query(spark,
                                              index_root, queries, k)

"Embedding" here is the engine's exact-BM25 statistics path (the
SPLADE slot, SURVEY.md §2.3 E2): files are scanned + decoded + chunked
(sources.py), indexed (IndexWriter — the adapter/upsert slot S14), and
queried with block-max WAND + optional cross-encoder rerank (§3.3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from embedanything_spark.sources import (TEXT_EXTENSIONS,
                                         decode_documents,
                                         incremental_files, scan_files)

DEFAULT_CHUNK_CHARS = 1000  # TextEmbedConfig::default (config.rs:64-78)


def embed_file(spark: SparkSession, path: str,
               chunk_chars: int = DEFAULT_CHUNK_CHARS) -> DataFrame:
    """One file → decoded chunk rows (conv_id=path, turn_idx, text) —
    the `embed_file` ingest shape (lib.rs:255-296) minus the neural
    kernel (our representation is the index's term statistics)."""
    return decode_documents(scan_files(spark, path), chunk_chars)


def embed_directory(spark: SparkSession, directory: str,
                    index_root: str,
                    extensions: tuple[str, ...] = TEXT_EXTENSIONS,
                    chunk_chars: int = DEFAULT_CHUNK_CHARS,
                    incremental: bool = True) -> dict:
    """Scan → decode → chunk → index (the `embed_directory_stream`
    pipeline, lib.rs:833-962; the IndexWriter commit protocol is the
    adapter-upsert slot). ``incremental`` skips files already in the
    index's docmap (S5 anti-join), appending a new committed batch."""
    from embedanything_spark.index.build import (IndexWriter,
                                                 committed_lineage,
                                                 table_paths)
    files = scan_files(spark, directory, extensions)
    w = IndexWriter(index_root)
    offset = 0
    batch = "full"
    lineage = committed_lineage(index_root)
    if incremental and lineage:
        indexed = (spark.read
                   .parquet(*table_paths(index_root, "docmap"))
                   .selectExpr("conv_id AS path").distinct())
        files = incremental_files(files, indexed)
        offset = sum(ln["n_docs"] for ln in lineage)
        batch = f"incr-{len(lineage):04d}"
    if batch in {ln["batch_id"] for ln in lineage}:
        # a second non-incremental call on an existing index would
        # append a duplicate lineage line (doubled docs in every
        # reader) — refuse instead of silently corrupting
        raise ValueError(
            f"batch {batch!r} is already committed at {index_root!r}; "
            "pass incremental=True to append only new files, or use a "
            "fresh index_root")
    docs = decode_documents(files, chunk_chars)
    if docs.isEmpty():
        return {"batch_id": batch, "n_docs": 0, "skipped": True}
    return w.build(docs, batch_id=batch, doc_id_offset=offset)


def embed_url(spark: SparkSession, url: str,
              chunk_chars: int = DEFAULT_CHUNK_CHARS) -> DataFrame:
    """S7: fetch one URL (driver-side, processor.rs:23-57) → decoded
    chunk rows, same shape as embed_file."""
    from pathlib import Path

    from embedanything_spark.sources import fetch_url
    path = fetch_url(url)
    return decode_documents(
        scan_files(spark, str(Path(path).parent)), chunk_chars)


def embed_query(spark: SparkSession, index_root: str,
                queries: list[str], k: int = 10,
                transcripts: DataFrame | None = None) -> DataFrame:
    """Query the index: tokenize with the frozen analyzer → block-max
    WAND top-k → (optional) deterministic cross-encoder rerank — the
    reference's embed_query → ANN limit → rerank path (§3.3). Pass
    ``transcripts`` (the source table; docmap stores no text) to add
    the rerank stage."""
    from embedanything_spark.index.query import IndexReader
    qp = pd.DataFrame({"query_id": range(len(queries)),
                       "query_text": queries,
                       "k": [k] * len(queries)})
    res = IndexReader(spark, index_root).search(qp, prune=True)
    if transcripts is not None:
        from embedanything_spark.index.rerank import rerank
        res = rerank(res, qp, transcripts)
    return res
