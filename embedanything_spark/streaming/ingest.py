"""Structured Streaming incremental ingest (SURVEY.md §2.10).

The reference's "vector streaming" is an intra-process bounded-buffer
pipeline: parse/chunk producer → MPSC channel → embed consumer →
adapter sink, flushing every ``buffer_size`` chunks
(``rust/src/lib.rs:836-962``, defaults ``config.rs:48,75``). The Spark
restatement is Structured Streaming micro-batches: ``readStream`` on a
transcripts directory → ``foreachBatch`` appending a committed batch to
the same index layout the batch builder writes — each micro-batch is a
lineage-committed segment, and ``finalize()`` re-merges the global
dictionary, so a streaming ingest and a batch build produce the same
searchable index.

doc_ids for streamed batches are offset-sequential (batch order), not
global dense rank — the same contract as the checkpointed builder's
batches; rank identity holds per the docmap that accompanies them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from embedanything_spark.index.build import IndexWriter, committed_lineage

TRANSCRIPT_SCHEMA = ("conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")


class StreamingIndexIngest:
    """foreachBatch sink: every micro-batch becomes one committed index
    batch (the streaming analogue of the reference's buffered adapter
    upsert, ``python/src/lib.rs:499-517``)."""

    def __init__(self, index_root: str, block_range: int = 4096,
                 num_partitions: int | None = None,
                 finalize_each_batch: bool = True):
        self.writer = IndexWriter(index_root, block_range=block_range,
                                  num_partitions=num_partitions)
        self.finalize_each_batch = finalize_each_batch

    def _offset(self) -> int:
        return sum(ln["n_docs"] for ln in
                   committed_lineage(self.writer.root))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        bid = f"stream-{batch_id:06d}"
        committed = {ln["batch_id"] for ln in
                     committed_lineage(self.writer.root)}
        if bid in committed:
            # foreachBatch is at-least-once: a replayed micro-batch
            # must NOT append a second lineage line (doubled docs) or
            # fold its df/cf into the dictionary twice. The batch data
            # is already committed; re-run only the (idempotent)
            # finalize in case the previous attempt crashed between
            # commit and fold.
            if self.finalize_each_batch:
                self.writer.finalize(batch_df.sparkSession,
                                     add_batches=[bid])
            return
        if batch_df.isEmpty():
            return
        self.writer.build(batch_df, batch_id=bid,
                          doc_id_offset=self._offset(), finalize=False)
        if self.finalize_each_batch:
            # INCREMENTAL dictionary maintenance: fold only this
            # micro-batch's block metadata into the dictionary —
            # O(batch), not O(corpus), per micro-batch; the fold state
            # rides inside the dictionary dir, so a crash between the
            # lineage commit above and this fold self-heals (the next
            # finalize detects the divergence and full-rebuilds)
            self.writer.finalize(batch_df.sparkSession,
                                 add_batches=[bid])

    def start(self, spark: SparkSession, source_dir: str,
              checkpoint_dir: str, trigger_once: bool = True):
        """Watch ``source_dir`` for new transcript parquet files and
        index them incrementally. ``trigger_once`` processes the
        backlog then stops (the batch-resume pattern); otherwise runs
        continuously with availableNow semantics."""
        stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
                  .parquet(source_dir))
        writer = (stream.writeStream
                  .foreachBatch(self.process_batch)
                  .option("checkpointLocation", checkpoint_dir)
                  .trigger(availableNow=True))
        return writer.start()
