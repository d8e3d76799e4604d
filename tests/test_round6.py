"""Round-6 regression tests: ADVICE fixes (per-item codec fallback for
wave.Error / truncated containers, compact dirty-file detection under a
relative index root) and optimization-preserving invariants for the
operators whose internals changed this round.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest


def _float_wav() -> bytes:
    """RIFF/WAVE payload with format tag 3 (IEEE float) — the stdlib
    wave module raises wave.Error('unknown format: 3') on it."""
    samples = (np.sin(np.linspace(0, 20, 256)) * 0.5).astype("<f4")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_float_wav_raises_wave_error():
    """Precondition: the payload genuinely triggers wave.Error, so the
    fallback test below exercises the advertised failure class."""
    with pytest.raises(wave.Error):
        with wave.open(io.BytesIO(_float_wav()), "rb") as f:
            f.getnframes()


def test_non_pcm_wav_degrades_to_stub():
    """ADVICE (high): wave.Error must take the per-item stub path, not
    kill the stage — the docstring's 'non-PCM WAV degrades per-item'
    contract."""
    from embedanything_spark.operators import multimodal as mm

    w, h, n_frames, vec, real, reason = mm._decode_asset(_float_wav())
    assert real is False
    assert reason == "Error"  # wave.Error's class name
    assert vec.shape == (mm.EMBED_DIM,)


def test_truncated_container_degrades_to_stub():
    """IndexError from a truncated container payload is a payload
    problem, not a codec bug — per-item stub."""
    from embedanything_spark.operators import multimodal as mm

    # RIFF/WAVE magic but truncated before any chunk structure
    payload = b"RIFF\x04\x00\x00\x00WAVE"
    w, h, n_frames, vec, real, reason = mm._decode_asset(payload)
    assert real is False
    assert vec.shape == (mm.EMBED_DIM,)


def test_systemic_memoryerror_still_propagates(monkeypatch):
    """The widened _CODEC_ERRORS tuple must not absorb systemic
    failures."""
    from embedanything_spark import mediacodecs as mc
    from embedanything_spark.operators import multimodal as mm

    def boom(content):
        raise MemoryError("absurd frame buffer")

    monkeypatch.setattr(mm.mc, "decode_png", boom)
    with pytest.raises(MemoryError):
        mm._decode_asset(mc.PNG_SIG + b"\x00" * 40)


def test_selective_compact_relative_root(spark):
    """ADVICE (medium): with a RELATIVE index root (CLI --index myidx)
    the dirty-file detection used to compare unresolved relative paths
    against input_file_name()'s absolute URIs — nothing matched, every
    compact file silently passed through and lineage reported
    rewritten_files=0 forever. The (batch-dir, basename) key match
    must classify delta-touched files as rewrites regardless of how
    the root was spelled. The root is relative to the PROCESS cwd so
    the Python side and the JVM side resolve it identically, exactly
    as a CLI invocation does."""
    import shutil
    import uuid

    import pandas as pd

    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index.build import (IndexWriter,
                                                 committed_lineage)
    from embedanything_spark.index.query import IndexReader

    t = gen_transcripts_df(spark, 40)
    # same corpus slice appended again: every delta key collides with
    # a compact-layer key, so a correct classifier MUST rewrite files
    extra = gen_transcripts_df(spark, 30)
    root = f"relidx-{uuid.uuid4().hex[:8]}"
    try:
        w = IndexWriter(root, block_range=64, num_partitions=2)
        w.build(t)
        w.compact(spark)
        n1 = sum(ln["n_docs"] for ln in committed_lineage(root))
        w.build(extra, batch_id="delta", doc_id_offset=n1)
        lin = w.compact(spark)
        assert lin["scope"] == "merge"
        assert lin["rewritten_files"] > 0
        # and the merged index still answers (sanity)
        q = pd.DataFrame({"query_id": [0], "query_text": ["term00000"],
                          "k": [5]})
        assert len(IndexReader(None, root).search_local(q)) > 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_compact_prefix_reserved(spark, tmp_path):
    """ADVICE (low): a user batch_id must not be able to masquerade as
    an already-laid-out compact layer."""
    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index.build import IndexWriter

    w = IndexWriter(str(tmp_path / "idx"), num_partitions=2)
    with pytest.raises(ValueError, match="reserved"):
        w.build(gen_transcripts_df(spark, 3), batch_id="compact-evil")


def test_splice_merge_byte_identical_to_decode_merge(spark, tmp_path):
    """The compact splice-merge (pure byte splicing from fragment
    metadata) must produce EXACTLY the bytes the decode+re-encode path
    produces — canonical LEB128 and identical deltas make them equal
    by construction; this pins it."""
    import pandas as pd
    import pyarrow as pa

    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index.build import (
        CheckpointedIndexBuilder, IndexWriter, _splice_merge_table,
        table_paths)

    root = tmp_path / "idx"
    w = IndexWriter(str(root), block_range=64, num_partitions=2)
    # 4 batches → ≥4 fragments per hot (term, range_id)
    CheckpointedIndexBuilder(w, n_batches=4).run(
        gen_transcripts_df(spark, 60))
    blocks = (spark.read.parquet(*table_paths(root, "postings"))
              .toPandas()
              .sort_values(["term", "range_id", "min_doc"],
                           ignore_index=True))
    cols = ["term", "range_id", "n", "min_doc", "max_doc", "max_tf",
            "min_dl", "sum_tf", "doc_bytes", "tf_bytes", "dl_bytes",
            "max_impact"]
    blocks = blocks[cols]
    assert (blocks.groupby(["term", "range_id"]).size() > 1).any()
    tbl = pa.Table.from_pandas(blocks, preserve_index=False) \
        .combine_chunks()
    spliced, bad = _splice_merge_table(tbl)
    assert bad is None  # build fragments are always interval-ordered
    got = spliced.to_pandas().sort_values(
        ["term", "range_id"], ignore_index=True)

    # reference: full decode + re-encode of the same rows
    import numpy as np

    from embedanything_spark.index.build import _encode_batch
    from embedanything_spark.index.codec import varint_decode
    cnt = blocks["n"].to_numpy("int64")
    deltas = varint_decode(b"".join(blocks["doc_bytes"])).astype("int64")
    tf = varint_decode(b"".join(blocks["tf_bytes"])).astype("int64")
    dl = varint_decode(b"".join(blocks["dl_bytes"])).astype("int64")
    seg_start = cnt.cumsum() - cnt
    c = deltas.cumsum()
    base = np.repeat(c[seg_start] - deltas[seg_start]
                     - blocks["min_doc"].to_numpy("int64"), cnt)
    doc = c - base
    frame = pd.DataFrame({
        "term": np.repeat(blocks["term"].to_numpy(object), cnt),
        "range_id": np.repeat(blocks["range_id"].to_numpy("int64"),
                              cnt),
        "doc_id": doc, "tf": tf, "doclen": dl})
    order = np.lexsort((frame["doc_id"], frame["range_id"],
                        frame["term"]))
    want = _encode_batch(frame.iloc[order].reset_index(drop=True))
    want = want[cols].sort_values(["term", "range_id"],
                                  ignore_index=True)
    assert len(got) == len(want)
    for col in cols:
        if col == "max_impact":
            for a, b in zip(got[col], want[col]):
                assert np.allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
        else:
            assert got[col].tolist() == want[col].tolist(), col


def test_tok_dims_bit_identical_to_per_dim_conv(spark):
    """The chunker dim kernel now parses each PAIR of dims with one
    12-hex-char conv + shiftright/bitwiseAND; it must produce the
    exact doubles of the original four 6-hex-char convs."""
    from pyspark.sql import functions as F

    from embedanything_spark.operators.chunkers import DIMS, _tok_dims

    df = (spark.range(500)
          .select(F.md5(F.col("id").cast("string")).alias("h")))
    old = [(F.conv(F.substring(F.col("h"), 1 + 6 * d, 6), 16, 10)
            .cast("long") % F.lit(1_000_000)) / F.lit(1_000_000.0)
           for d in range(DIMS)]
    rows = df.select(
        *[d.alias(f"n{i}") for i, d in enumerate(_tok_dims())],
        *[d.alias(f"o{i}") for i, d in enumerate(old)]).collect()
    for r in rows:
        for i in range(DIMS):
            assert r[f"n{i}"] == r[f"o{i}"]


def test_spread_preserves_rows_and_noops_at_scale(spark):
    """spread() must never change the row multiset, must raise the
    partition count for a narrow scan, and must be a structural no-op
    when the input already has >= defaultParallelism partitions."""
    from embedanything_spark.operators.docops import spread

    small = spark.range(1000).coalesce(1).selectExpr("id", "id * 2 AS v")
    out = spread(small)
    assert out.rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out.collect()) == list(range(1000))

    p = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(p + 3)
    assert spread(wide) is wide


def test_merge_consolidates_cross_layer_duplicate_keys(spark, tmp_path):
    """ADVICE r5 (low): tiered layers can carry the same
    (term, range_id) on the block_range boundary straddled by a delta's
    doc offset. A merge-scope compact that only chases delta-touched
    keys would hardlink both layers' files into the one output batch,
    breaking the unique-keys invariant the selective pre-pass and the
    noop short-circuit rely on. After the fix, a full merge over tiered
    layers leaves every (term, range_id) in exactly one row, and
    results stay bit-identical to a never-compacted twin."""
    import pandas as pd
    from pyspark.sql import functions as F

    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index.build import (IndexWriter,
                                                 committed_lineage)
    from embedanything_spark.index.query import IndexReader

    t = gen_transcripts_df(spark, 30)
    q = pd.DataFrame({"query_id": [0, 1],
                      "query_text": ["term00000", "term00003 term00011"],
                      "k": [6, 6]})
    rootA, rootB = tmp_path / "m", tmp_path / "never"
    wA = IndexWriter(str(rootA), block_range=64, num_partitions=2)
    wB = IndexWriter(str(rootB), block_range=64, num_partitions=2)
    wA.build(t, batch_id="base")
    wB.build(t, batch_id="base")
    wA.compact(spark)
    off = committed_lineage(rootA)[-1]["n_docs"]
    for i, seed in enumerate((99, 7)):
        d = gen_transcripts_df(spark, 4, seed=seed)
        nd = d.count()
        wA.build(d, batch_id=f"d{i}", doc_id_offset=off)
        wB.build(d, batch_id=f"d{i}", doc_id_offset=off)
        lin = wA.compact(spark, scope="delta")
        assert lin["scope"] == "delta"
        off += nd
    # precondition: the tiers really do share at least one key
    # (delta offsets straddle a block_range boundary)
    dirs = [str(rootA / "data" / f"batch-{ln['batch_id']}" / "kind=block")
            for ln in committed_lineage(rootA)]
    pre = (spark.read.parquet(*dirs)
           .select("term", "range_id", F.input_file_name().alias("_f"))
           .groupBy("term", "range_id")
           .agg(F.countDistinct("_f").alias("nf")))
    assert pre.filter(F.col("nf") > 1).count() > 0
    lin = wA.compact(spark, scope="merge")
    assert lin["scope"] == "merge"
    bdir = str(rootA / "data" / f"batch-{lin['batch_id']}" / "kind=block")
    post = (spark.read.parquet(bdir)
            .groupBy("term", "range_id").agg(F.count("*").alias("c")))
    assert post.filter(F.col("c") > 1).count() == 0
    pd.testing.assert_frame_equal(
        IndexReader(None, str(rootA)).search_local(q),
        IndexReader(None, str(rootB)).search_local(q))
