"""Posting-list index engine: build + query, rank-identity vs oracle,
WAND pruning property, parallelism invariance (FIXTURES.md §4-5)."""

import numpy as np
import pandas as pd
import pytest

from embedanything_spark.index.build import (CheckpointedIndexBuilder,
                                             IndexWriter, committed_lineage,
                                             table_paths)
from embedanything_spark.index.query import IndexReader
from tests.test_bm25_dataframe import assert_rank_identical


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory, transcripts_df):
    root = tmp_path_factory.mktemp("idx")
    # small block_range so the fixture corpus spans many blocks
    w = IndexWriter(str(root), block_range=256, num_partitions=8)
    lineage = w.build(transcripts_df)
    assert lineage["n_docs"] > 0
    return str(root)


@pytest.fixture(scope="module")
def reader(spark, index_dir):
    return IndexReader(spark, index_dir)


def test_meta_matches_oracle(reader, oracle):
    assert reader.meta["n_docs"] == oracle.n_docs
    assert reader.meta["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)


def test_dictionary_matches_oracle(spark, index_dir, oracle):
    d = spark.read.parquet(f"{index_dir}/dictionary").toPandas()
    assert dict(zip(d["term"], d["df"])) == oracle.df


def test_rank_identity_pruned(reader, queries_pdf, golden_topk):
    got = reader.search(queries_pdf, prune=True).toPandas()
    assert_rank_identical(got, golden_topk)


def test_pruned_equals_unpruned(reader, queries_pdf):
    """WAND property: pruning never changes the top-k."""
    a = reader.search(queries_pdf, prune=True).toPandas()
    b = reader.search(queries_pdf, prune=False).toPandas()
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True))


def test_search_local_rank_identity(reader, queries_pdf, golden_topk):
    """The serving path (driver-side pyarrow + the same kernel) is
    rank-identical to the distributed plan and the golden oracle,
    pruned and unpruned."""
    got = reader.search_local(queries_pdf, prune=True)
    assert_rank_identical(got, golden_topk)
    a = reader.search_local(queries_pdf, prune=True)
    b = reader.search_local(queries_pdf, prune=False)
    pd.testing.assert_frame_equal(a, b)
    dist = (reader.search(queries_pdf, prune=True).toPandas()
            .sort_values(["query_id", "rank"], ignore_index=True))
    pd.testing.assert_frame_equal(
        a[dist.columns].reset_index(drop=True), dist,
        check_dtype=False)


def test_search_local_edge_queries(reader):
    """Empty, unseen-term and whitespace queries return cleanly."""
    q = pd.DataFrame({"query_id": [0, 1, 2],
                      "query_text": ["", "zz_never_a_term", "   "],
                      "k": [5, 5, 5]})
    out = reader.search_local(q)
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "rank", "doc_id",
                                 "conv_id", "turn_idx", "score"]


def test_parallelism_invariance(spark, tmp_path, transcripts_df,
                                queries_pdf, index_dir, golden_topk):
    """Same build at different parallelism → identical dictionary,
    doc_stats and rank-identical results (N vs 4N scaling criterion)."""
    root2 = str(tmp_path / "idx2")
    IndexWriter(root2, block_range=256, num_partitions=2).build(
        transcripts_df)
    for table in ("dictionary", "docmap"):
        def load(root):
            paths = ([f"{root}/dictionary"] if table == "dictionary"
                     else table_paths(root, table))
            key = ["term"] if table == "dictionary" else ["doc_id"]
            return (spark.read.parquet(*paths).toPandas()
                    .sort_values(key).reset_index(drop=True))
        a, b = load(index_dir), load(root2)
        pd.testing.assert_frame_equal(a, b[a.columns])
    got = IndexReader(spark, root2).search(queries_pdf).toPandas()
    assert_rank_identical(got, golden_topk)


def test_query_unseen_and_empty(reader):
    q = pd.DataFrame({"query_id": [0, 1], "query_text": ["zz_nope", ""],
                      "k": [5, 5]})
    assert reader.search(q).count() == 0


def test_k_exceeds_corpus(reader, oracle):
    q = pd.DataFrame({"query_id": [0], "query_text": ["term00000"],
                      "k": [10**7]})
    n = reader.search(q).count()
    assert 0 < n <= oracle.n_docs


def test_checkpoint_resume(spark, tmp_path, transcripts_df, queries_pdf,
                           golden_topk):
    """Kill after 2 of 4 batches (+ one orphan dir) → resume → results
    identical to an uninterrupted build (FIXTURES.md §5)."""
    root = str(tmp_path / "ckpt")
    w = IndexWriter(root, block_range=256, num_partitions=4)
    b = CheckpointedIndexBuilder(w, n_batches=4)
    b.run(transcripts_df, stop_after=2)  # simulated crash, no finalize
    assert len(committed_lineage(root)) == 2
    # fake a half-written batch the crash left behind
    orphan = tmp_path / "ckpt" / "data" / "batch-0002"
    orphan.mkdir(parents=True)
    (orphan / "part-junk.parquet").write_bytes(b"corrupt")

    resumed = CheckpointedIndexBuilder(
        IndexWriter(root, block_range=256, num_partitions=4), n_batches=4)
    lineage = resumed.run(transcripts_df)
    assert len(lineage) == 4
    assert not (orphan / "part-junk.parquet").exists()
    got = IndexReader(spark, root).search(queries_pdf).toPandas()
    assert_rank_identical(got, golden_topk)
    # per-partition lineage carries throughput metrics
    for ln in committed_lineage(root):
        assert ln["turns_per_sec"] > 0 and ln["n_docs"] > 0


def test_compression_effective(spark, index_dir, oracle):
    """Posting payloads must be much smaller than raw int64 postings."""
    blocks = spark.read.parquet(
        *table_paths(index_dir, "postings")).select(
        "n", "doc_bytes", "tf_bytes").toPandas()
    n_postings = int(blocks["n"].sum())
    assert n_postings == sum(len(p[0]) for p in oracle.postings.values())
    payload = int(blocks["doc_bytes"].map(len).sum() +
                  blocks["tf_bytes"].map(len).sum())
    assert payload < n_postings * 8  # vs 16 bytes/posting uncompressed


def test_checkpoint_small_corpus(spark, tmp_path):
    """9 convs / 4 batches: ceil-division step yields only 2 bounds —
    must clamp to 3 effective batches, not IndexError (and resume to
    the same results as a single-shot build)."""
    from embedanything_spark.datagen import gen_transcripts_df

    t = gen_transcripts_df(spark, 9)
    root = str(tmp_path / "small")
    b = CheckpointedIndexBuilder(
        IndexWriter(root, block_range=256, num_partitions=2), n_batches=4)
    lineage = b.run(t)
    assert 0 < len(lineage) <= 4
    assert sum(ln["n_docs"] for ln in lineage) == t.count()
    single = str(tmp_path / "single")
    IndexWriter(single, block_range=256, num_partitions=2).build(t)
    q = pd.DataFrame({"query_id": [0], "query_text": ["term00000"],
                      "k": [5]})
    a = IndexReader(spark, root).search(q).toPandas()
    c = IndexReader(spark, single).search(q).toPandas()
    pd.testing.assert_frame_equal(a, c)


def test_compaction(spark, tmp_path, queries_pdf):
    """Segment merge: a 3-batch checkpointed build compacted into one
    batch gives byte-identical search results, a single committed
    batch, no duplicate (term, range_id) block rows, and per-partition
    lineage preserved. (Rank-identity vs the golden oracle is covered
    by the full-fixture engine tests; this one uses a small corpus so
    the 3 batch builds stay cheap.)"""
    from pyspark.sql import functions as F

    from embedanything_spark.datagen import gen_transcripts_df

    t = gen_transcripts_df(spark, 40)
    root = str(tmp_path / "cmp")
    w = IndexWriter(root, block_range=64, num_partitions=2)
    CheckpointedIndexBuilder(w, n_batches=3).run(t)
    q = queries_pdf.head(6)
    before = IndexReader(spark, root).search(q).toPandas()
    n_blocks_before = spark.read.parquet(
        *table_paths(root, "postings")).count()

    lineage = w.compact(spark)
    assert lineage["compacted_from"] == ["0000", "0001", "0002"]
    assert len(committed_lineage(root)) == 1
    after = IndexReader(spark, root).search(q).toPandas()
    pd.testing.assert_frame_equal(before.reset_index(drop=True),
                                  after.reset_index(drop=True))
    blocks = spark.read.parquet(*table_paths(root, "postings"))
    assert blocks.count() <= n_blocks_before
    dupes = (blocks.groupBy("term", "range_id").count()
             .filter(F.col("count") > 1).count())
    assert dupes == 0
    from embedanything_spark.index.build import partition_lineage
    assert partition_lineage(spark, root).count() > 0
    # incremental append AFTER compaction: offsets continue from the
    # compacted batch; results over the union corpus stay consistent
    extra = gen_transcripts_df(spark, 50).filter(
        "conv_id >= 'conv-00000040'")
    n_before = sum(ln["n_docs"] for ln in committed_lineage(root))
    w.build(extra, batch_id="post-compact", doc_id_offset=n_before)
    lns = committed_lineage(root)
    assert [ln["batch_id"] for ln in lns][-1] == "post-compact"
    res = IndexReader(spark, root).search(q).toPandas()
    assert len(res) >= len(after)


def test_hot_term_skew(spark, tmp_path):
    """North-rule skew criterion: a term present in EVERY doc (Zipf
    head extreme) must not concentrate — its postings stay spread
    across doc-range segments with bounded per-block counts, the
    dictionary merge still aggregates one metadata row per block, and
    top-k for the hot term is correct."""
    import pandas as pd
    from pyspark.sql import functions as F

    from embedanything_spark.datagen import gen_transcripts_df

    t = gen_transcripts_df(spark, 120).withColumn(
        "text", F.concat(F.lit("hotterm "), F.col("text")))
    root = str(tmp_path / "hot")
    IndexWriter(root, block_range=64, num_partitions=4).build(t)
    blocks = (spark.read.parquet(*table_paths(root, "postings"))
              .filter(F.col("term") == "hotterm")
              .select("range_id", "n").toPandas())
    n_docs = int(t.count())
    assert blocks["n"].sum() == n_docs          # df == corpus size
    assert len(blocks) >= n_docs // 64           # spread over ranges
    assert blocks["n"].max() <= 64               # bounded per block
    d = spark.read.parquet(f"{root}/dictionary") \
        .filter(F.col("term") == "hotterm").collect()[0]
    assert d["df"] == n_docs
    q = pd.DataFrame({"query_id": [0], "query_text": ["hotterm"],
                      "k": [5]})
    res = IndexReader(spark, root).search(q).toPandas()
    assert len(res) == 5 and (res["score"] > 0).all()


def test_index_docmap_text_roundtrip(spark, index_dir, transcripts_df):
    """input_hint per-row invariant through the ENGINE's build: the
    index docmap joins back to the source with per-turn text equality
    under stable (conv_id, turn_idx) ordering, doc_id is the exact
    dense rank, and doclen matches the frozen analyzer on the
    original text."""
    from embedanything_spark.analyzer import tokenize

    docmap = spark.read.parquet(*table_paths(index_dir, "docmap"))
    joined = (docmap.join(transcripts_df, ["conv_id", "turn_idx"])
              .orderBy("doc_id")
              .select("doc_id", "conv_id", "turn_idx", "doclen", "text")
              .toPandas())
    src = (transcripts_df.select("conv_id", "turn_idx", "text")
           .toPandas().sort_values(["conv_id", "turn_idx"])
           .reset_index(drop=True))
    assert len(joined) == len(src)                       # bijection
    assert (joined["doc_id"].to_numpy() ==
            np.arange(len(src))).all()                   # dense rank
    assert (joined["conv_id"].to_numpy() == src["conv_id"].to_numpy()).all()
    assert (joined["turn_idx"].to_numpy() == src["turn_idx"].to_numpy()).all()
    assert (joined["text"].to_numpy() == src["text"].to_numpy()).all()
    assert (joined["doclen"].to_numpy() ==
            src["text"].map(lambda t: len(tokenize(t))).to_numpy()).all()


def test_empty_input_raises(spark, tmp_path):
    t = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp")
    with pytest.raises(ValueError, match="empty transcripts"):
        IndexWriter(str(tmp_path / "e")).build(t)


def test_time_travel_read(spark, tmp_path, queries_pdf):
    """Snapshot-as-of semantics on the lineage manifest: querying a
    3-batch index AS OF batch 2 is rank- and score-identical to an
    index built from only the first two batches' data (df, n_docs and
    avgdl all recomputed for the snapshot)."""
    from embedanything_spark.datagen import gen_transcripts_df

    t = gen_transcripts_df(spark, 45)
    convs = sorted(r["conv_id"] for r in
                   t.select("conv_id").distinct().collect())
    root = str(tmp_path / "tt")
    CheckpointedIndexBuilder(
        IndexWriter(root, block_range=64, num_partitions=2),
        n_batches=3).run(t)
    lineage = committed_lineage(root)
    assert len(lineage) == 3
    cut = lineage[1]  # as of the second committed batch
    q = queries_pdf.head(8)
    asof = IndexReader(spark, root, asof=cut["batch_id"]).search(q) \
        .toPandas()

    # reference: index over only the first two batches' conv range
    bounds = __import__("json").loads(
        (tmp_path / "tt" / "_meta" / "plan.json").read_text())["bounds"]
    first_two = t.filter(f"conv_id < '{bounds[1]}'")
    root2 = str(tmp_path / "tt2")
    IndexWriter(root2, block_range=64, num_partitions=2).build(first_two)
    want = IndexReader(spark, root2).search(q).toPandas()
    pd.testing.assert_frame_equal(asof.reset_index(drop=True),
                                  want.reset_index(drop=True))
    assert convs  # sanity: corpus non-trivial
    with pytest.raises(ValueError, match="unknown snapshot"):
        IndexReader(spark, root, asof="nope")
    # the SERVING path honors the same snapshot (df from the included
    # batches' block metadata, pyarrow reads restricted to them)
    serving = IndexReader(spark, root, asof=cut["batch_id"]) \
        .search_local(q)
    pd.testing.assert_frame_equal(
        serving, asof.sort_values(["query_id", "rank"],
                                  ignore_index=True)[serving.columns],
        check_dtype=False)


def test_incremental_finalize(spark, tmp_path):
    """finalize(add_batches=[...]) folds only the new batches into the
    dictionary — result identical to a full re-aggregation (df/cf and
    meta n_docs/avgdl/total_tokens all match)."""
    from pyspark.sql import functions as F

    from embedanything_spark.datagen import gen_transcripts_df

    t = gen_transcripts_df(spark, 30)
    a = t.filter("conv_id < 'conv-00000015'")
    b = t.filter("conv_id >= 'conv-00000015'")
    root = str(tmp_path / "inc")
    w = IndexWriter(root, block_range=64, num_partitions=2)
    w.build(a, batch_id="a")                       # full finalize
    off = committed_lineage(root)[0]["n_docs"]
    w.build(b, batch_id="b", doc_id_offset=off, finalize=False)
    meta_inc = w.finalize(spark, add_batches=["b"])  # incremental
    d_inc = (spark.read.parquet(f"{root}/dictionary").toPandas()
             .sort_values("term").reset_index(drop=True))

    meta_full = w.finalize(spark)                   # full rebuild
    d_full = (spark.read.parquet(f"{root}/dictionary").toPandas()
              .sort_values("term").reset_index(drop=True))
    pd.testing.assert_frame_equal(d_inc, d_full)
    for k in ("n_docs", "avgdl", "total_tokens"):
        assert meta_inc[k] == meta_full[k]


def test_wand_pruning_skips_ranges(spark, tmp_path, transcripts_pdf):
    """Pruning EFFECTIVENESS (not just exactness), measured with a
    decode-count accumulator. The synthetic corpus has flat tf (Zipf
    vocab but 1-3 occurrences per doc) so block-max bounds barely
    separate; plant ONE high-tf doc — the realistic skew block-max
    exploits — and a k=1 query must score its range first and skip
    nearly everything else."""
    import pandas as pd

    skew = pd.DataFrame([{
        "conv_id": "conv-zz-skew", "turn_idx": 0, "role": "user",
        "text": " ".join(["term00000"] * 60), "tool": None,
        "ts": pd.Timestamp("2026-01-01")}])
    t = spark.createDataFrame(pd.concat([transcripts_pdf, skew],
                                        ignore_index=True))
    root = str(tmp_path / "wand_eff")
    IndexWriter(root, block_range=64, num_partitions=2).build(t)
    r = IndexReader(spark, root)
    q = pd.DataFrame({"query_id": [0], "query_text": ["term00000"],
                      "k": [1]})
    a1 = spark.sparkContext.accumulator(0)
    got = r.search(q, prune=True, decode_acc=a1, num_buckets=2) \
        .toPandas()
    assert got.iloc[0]["conv_id"] == "conv-zz-skew"  # skew doc wins
    a2 = spark.sparkContext.accumulator(0)
    r.search(q, prune=False, decode_acc=a2, num_buckets=2).collect()
    assert 0 < a1.value < a2.value
    skip_rate = 1 - a1.value / a2.value
    # ~1/3 of ranges skipped here: the (max_tf, min_dl) bound saturates
    # near idf*(k1+1) for ranges containing short docs, so single-term
    # pruning can never beat those ranges' bounds — the skip rate is
    # bounded by corpus shape, not implementation. Exactness is the
    # hard property (test_pruned_equals_unpruned); this asserts the
    # mechanism actually fires.
    assert skip_rate > 0.2, f"pruning skipped only {skip_rate:.1%}"


def test_partition_keys_route_one_bucket_per_partition(spark):
    """ADVICE r2 (build.py:428): hash-repartitioning dense bucket ids
    leaves ~1/e tasks empty and piles buckets onto stragglers. The
    _partition_keys remap must place bucket b in partition b exactly —
    zero collisions, zero empty partitions — for any parts."""
    from pyspark.sql import functions as F

    from embedanything_spark.index.build import _partition_keys

    for parts in (5, 32):
        keys = _partition_keys(spark, parts)
        assert len(set(keys)) == parts
        got = (spark.range(0, 1000)
               .withColumn("_bucket",
                           F.pmod(F.col("id"), F.lit(parts))
                           .cast("int"))
               .withColumn("_pkey",
                           F.get(F.array(*[F.lit(k) for k in keys])
                                 .cast("array<bigint>"),
                                 F.col("_bucket")))
               .repartition(parts, "_pkey")
               .withColumn("pid", F.spark_partition_id())
               .select("_bucket", "pid").distinct().collect())
        assert len(got) == parts  # every (bucket, partition) unique
        for r in got:
            assert r["pid"] == r["_bucket"]
