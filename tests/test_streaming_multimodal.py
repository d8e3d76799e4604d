"""Streaming incremental ingest + multimodal plumbing tests."""

import numpy as np
import pandas as pd

from embedanything_spark.datagen import gen_query_set, gen_transcripts_df
from embedanything_spark.index.build import IndexWriter, committed_lineage
from embedanything_spark.index.query import IndexReader
from embedanything_spark.operators.multimodal import (extract_features,
                                                      near_dup_by_embedding,
                                                      synth_assets)


def test_streaming_ingest_matches_batch(spark, tmp_path, queries_pdf):
    """Two micro-batches through foreachBatch == one batch build,
    rank-identical query results."""
    from embedanything_spark.streaming.ingest import StreamingIndexIngest

    src = tmp_path / "stream_src"
    t1 = gen_transcripts_df(spark, 60).filter("conv_id < 'conv-00000030'")
    t2 = gen_transcripts_df(spark, 60).filter("conv_id >= 'conv-00000030'")
    t1.write.mode("overwrite").parquet(str(src / "f1"))

    ingest = StreamingIndexIngest(str(tmp_path / "sidx"),
                                  block_range=256, num_partitions=4)
    q = ingest.start(spark, str(src) + "/*", str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    t2.write.mode("append").parquet(str(src / "f2"))
    q2 = ingest.start(spark, str(src) + "/*", str(tmp_path / "ckpt"))
    q2.awaitTermination(120)

    assert len(committed_lineage(str(tmp_path / "sidx"))) == 2

    # batch build over the same corpus
    batch_root = str(tmp_path / "bidx")
    IndexWriter(batch_root, block_range=256, num_partitions=4).build(
        gen_transcripts_df(spark, 60))
    queries = queries_pdf.head(10)
    a = (IndexReader(spark, str(tmp_path / "sidx")).search(queries)
         .toPandas())
    b = IndexReader(spark, batch_root).search(queries).toPandas()
    # doc_ids may differ (batch-local offsets) but (conv, turn, score)
    # ranking must be identical
    cols = ["query_id", "rank", "conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(a[cols].reset_index(drop=True),
                                  b[cols].reset_index(drop=True))
    np.testing.assert_allclose(a["score"], b["score"], rtol=1e-9)


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-processing an already-
    committed micro-batch must not append a second lineage line or
    fold its df/cf into the dictionary twice."""
    from embedanything_spark.streaming.ingest import StreamingIndexIngest

    root = str(tmp_path / "ridx")
    t = gen_transcripts_df(spark, 20)
    ing = StreamingIndexIngest(root, block_range=256, num_partitions=4)
    ing.process_batch(t, 0)
    lin1 = committed_lineage(root)
    d1 = (spark.read.parquet(root + "/dictionary")
          .orderBy("term").toPandas())
    ing.process_batch(t, 0)  # at-least-once replay of batch 0
    assert len(committed_lineage(root)) == len(lin1) == 1
    d2 = (spark.read.parquet(root + "/dictionary")
          .orderBy("term").toPandas())
    pd.testing.assert_frame_equal(d1, d2)


def test_crash_between_commit_and_fold_heals(spark, tmp_path):
    """A batch committed but never folded (crash between the lineage
    append and the incremental finalize) diverges the dictionary's
    fold state; the NEXT incremental finalize detects it and
    self-heals with a full rebuild."""
    from embedanything_spark.index.build import dict_state

    root = str(tmp_path / "hidx")
    w = IndexWriter(root, block_range=256, num_partitions=4)
    t = gen_transcripts_df(spark, 30)

    def off():
        return sum(ln["n_docs"] for ln in committed_lineage(root))

    w.build(t.filter("conv_id < 'conv-00000010'"), batch_id="b0")
    assert dict_state(root) == {"b0"}
    # crash: b1 commits (lineage line) but the fold never runs
    w.build(t.filter("conv_id >= 'conv-00000010' AND "
                     "conv_id < 'conv-00000020'"),
            batch_id="b1", doc_id_offset=off(), finalize=False)
    # next micro-batch commits b2 and runs its incremental finalize:
    # state {b0} ∪ {b2} != lineage {b0,b1,b2} → full rebuild
    w.build(t.filter("conv_id >= 'conv-00000020'"),
            batch_id="b2", doc_id_offset=off(), finalize=False)
    w.finalize(spark, add_batches=["b2"])
    assert dict_state(root) == {"b0", "b1", "b2"}
    got = (spark.read.parquet(root + "/dictionary")
           .select("term", "df", "cf").orderBy("term").toPandas())
    # healed dictionary == a from-scratch build over the same corpus
    ref_root = str(tmp_path / "hidx_ref")
    IndexWriter(ref_root, block_range=256, num_partitions=4).build(t)
    want = (spark.read.parquet(ref_root + "/dictionary")
            .select("term", "df", "cf").orderBy("term").toPandas())
    pd.testing.assert_frame_equal(got, want)


def test_multimodal_features(spark):
    assets = synth_assets(spark, 30)
    feats = extract_features(assets, batch_partitions=4).toPandas()
    assert len(feats) == 30
    assert set(feats["modality"]) == {"image", "audio", "video"}
    emb = np.array(feats["embedding"].tolist())
    assert emb.shape == (30, 64)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0,
                               rtol=1e-5)
    # deterministic: same input → same features
    again = extract_features(synth_assets(spark, 30)).toPandas() \
        .sort_values("path").reset_index(drop=True)
    feats = feats.sort_values("path").reset_index(drop=True)
    pd.testing.assert_frame_equal(feats, again)
    # video frame-sampling metadata
    assert (feats[feats.modality == "video"]["n_frames"] >= 1).all()


def test_multimodal_near_dup(spark):
    from pyspark.sql import functions as F
    feats = extract_features(synth_assets(spark, 30))
    # plant 3 exact duplicates under new paths → must be found at cos≈1
    dups = (feats.orderBy("path").limit(3)
            .withColumn("path", F.concat(F.col("path"), F.lit("__copy"))))
    pairs = near_dup_by_embedding(feats.union(dups),
                                  threshold=0.99).toPandas()
    assert len(pairs) == 3
    assert all(p2 == p1 + "__copy" for p1, p2 in
               zip(pairs["p1"], pairs["p2"]))
    np.testing.assert_allclose(pairs["cos"], 1.0, rtol=1e-6)
