"""Pluggable Adapter sink seam (SURVEY.md §2 S14).

The reference's extension point is the ``Adapter`` ABC —
``create_index / delete_index / convert / upsert``
(``python/python/embed_anything/_embed_anything.pyi:5-53``), with seven
shipped vector-store implementations (``examples/adapters/*.py``) and a
streaming path that flushes buffered batches through the adapter
(``rust/src/lib.rs:836-962``). Spark restatement: ``convert`` maps a
micro-batch DataFrame of pipeline output to the store's row shape,
``upsert`` lands it; ``foreach_batch_sink`` plugs ANY adapter into
Structured Streaming's ``foreachBatch`` slot.

The default implementation is the engine's own IndexWriter commit
protocol — a user porting from the reference swaps in their vector-DB
client by subclassing ``Adapter``, exactly as they would there.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, functions as F

from embedanything_spark.index.build import (DEFAULT_BLOCK_RANGE,
                                             IndexWriter,
                                             committed_lineage)


class Adapter(ABC):
    """create_index/delete_index/convert/upsert — the reference's
    vector-store contract (signature parity with
    ``_embed_anything.pyi:5-53``), with DataFrames in place of
    ``List[List[EmbedData]]`` / ``List[Dict]``."""

    @abstractmethod
    def create_index(self, dimension: int, metric: str,
                     index_name: str, **kwargs) -> None: ...

    @abstractmethod
    def delete_index(self, index_name: str) -> None: ...

    @abstractmethod
    def convert(self, embeddings: DataFrame) -> DataFrame: ...

    @abstractmethod
    def upsert(self, data: DataFrame) -> None: ...


class IndexWriterAdapter(Adapter):
    """Default adapter: the 'store' is the engine's parquet commit
    protocol. ``convert`` shapes arbitrary text rows to the transcript
    schema; each ``upsert`` appends one committed, incrementally
    finalized batch (searchable immediately via IndexReader).

    For streaming with exactly-once batch ids prefer
    ``streaming.ingest.StreamingIndexIngest`` (it keys commits on the
    foreachBatch batch_id); this adapter's auto ids suit batch/manual
    upserts — the reference's own ``adapter.upsert(data)`` shape.
    """

    def __init__(self, block_range: int = DEFAULT_BLOCK_RANGE,
                 num_partitions: int | None = None):
        self.block_range = block_range
        self.num_partitions = num_partitions
        self.writer: IndexWriter | None = None

    def create_index(self, dimension: int = 0, metric: str = "bm25",
                     index_name: str = "", **kwargs) -> None:
        """index_name = the index root path. ``dimension`` is
        vector-store vocabulary — the sparse BM25 store has no fixed
        dimension and ignores it; ``metric`` must be 'bm25'."""
        if metric != "bm25":
            raise ValueError(f"unsupported metric {metric!r}: the "
                             "IndexWriter store scores exact BM25")
        self.writer = IndexWriter(index_name,
                                  block_range=self.block_range,
                                  num_partitions=self.num_partitions)

    def delete_index(self, index_name: str) -> None:
        IndexWriter(index_name).clean()
        if self.writer is not None and \
                str(self.writer.root) == index_name:
            self.writer = None

    def convert(self, embeddings: DataFrame) -> DataFrame:
        """Accepts any frame with (conv_id, turn_idx, text) —
        role/ts/tool are defaulted if absent (the reference's convert
        normalizes EmbedData into the store's row dicts)."""
        cols = set(embeddings.columns)
        df = embeddings
        if "role" not in cols:
            df = df.withColumn("role", F.lit("doc"))
        if "ts" not in cols:
            df = df.withColumn("ts", F.lit(None).cast("timestamp"))
        if "tool" not in cols:
            df = df.withColumn("tool", F.lit(None).cast("string"))
        return df.select("conv_id",
                         F.col("turn_idx").cast("int").alias("turn_idx"),
                         "role", F.col("text").cast("string").alias("text"),
                         "tool", "ts")

    def upsert(self, data: DataFrame) -> None:
        if self.writer is None:
            raise RuntimeError("create_index first")
        lineage = committed_lineage(self.writer.root)
        bid = f"upsert-{len(lineage):06d}"
        offset = sum(ln["n_docs"] for ln in lineage)
        self.writer.build(data, batch_id=bid, doc_id_offset=offset,
                          finalize=False)
        self.writer.finalize(data.sparkSession, add_batches=[bid])


def foreach_batch_sink(adapter: Adapter):
    """Adapt ANY Adapter into a ``foreachBatch`` callable — the
    streaming flush slot (``rust/src/lib.rs:836-962``): every
    micro-batch is convert()ed then upsert()ed into the user's store."""
    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        adapter.upsert(adapter.convert(batch_df))
    return sink
