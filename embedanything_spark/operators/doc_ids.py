"""Deterministic dense doc_id assignment, Arrow-native and cluster-size-invariant.

doc_id = dense rank over globally sorted (conv_id, turn_idx) — the stable
identity the north rule's rank-identity requirement needs (SURVEY.md §4
item 5). A naive ``row_number().over(Window.orderBy(...))`` collapses to a
single partition and dies at 10^12 rows; instead we do the classic
two-pass zipWithIndex WITHOUT the RDD/Python-serialization round-trip:

1. range-repartition + sort-within-partitions on the key (one shuffle,
   the same shuffle any global ordering needs),
2. count rows per partition (collects #partitions ints to the driver),
3. mapInPandas streams each partition in order, adding offset + local
   running index (Arrow batches end-to-end).

The sorted frame is persisted between the two passes so both see the
identical partitioning (range-partitioner sampling is not re-run).
"""

from __future__ import annotations

import numpy as np
from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F


def zip_with_index(df: DataFrame, order_cols: list[str],
                   id_col: str = "doc_id",
                   num_partitions: int | None = None,
                   return_parent: bool = False):
    """Append a dense 0-based int64 ``id_col`` following ``order_cols`` order.

    Returned frame is sorted by ``order_cols`` within partitions and
    range-partitioned across them; all other columns pass through.
    With ``return_parent=True`` also returns the persisted sorted
    parent so the caller can unpersist it once downstream results are
    materialized (the persist pins both passes to one partitioning).
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    sorted_df = (df.repartitionByRange(n_parts, *order_cols)
                   .sortWithinPartitions(*order_cols)
                   .withColumn("_pid", F.spark_partition_id())
                   .persist(StorageLevel.MEMORY_AND_DISK))
    counts = dict(sorted_df.groupBy("_pid").count().collect())
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    bc = spark.sparkContext.broadcast(offsets)
    out_schema = sorted_df.drop("_pid").schema.add(id_col, "long", False)

    def assign(batches):
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            start = bc.value[int(pdf["_pid"].iloc[0])] + local
            local += len(pdf)
            pdf = pdf.drop(columns=["_pid"])
            pdf[id_col] = np.arange(start, start + len(pdf), dtype=np.int64)
            yield pdf

    out = sorted_df.mapInPandas(assign, schema=out_schema)
    return (out, sorted_df) if return_parent else out
