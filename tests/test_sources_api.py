"""File sources (scan/decode/incremental) and the reference-shaped
API facade: scan a temp dir of txt/md/html files, decode, index,
query, and run an incremental second pass that skips indexed files."""

import shutil
import tempfile
from pathlib import Path

import pytest

from embedanything_spark import api, sources

HTML = """<html><head><style>p {color: red}</style>
<script>var x = 1 &amp;&amp; 2;</script></head>
<body><h1>Spark &amp; Search</h1>
<p>posting lists are [compressed](http://x.example) blocks</p>
</body></html>"""

TXT = "hello transcripts world " * 3
MD = "# title\nsee [the docs](http://d.example) for details"


@pytest.fixture(scope="module")
def file_dir():
    d = Path(tempfile.mkdtemp(prefix="ea_files_"))
    (d / "sub").mkdir()
    (d / "a.txt").write_text(TXT)
    (d / "sub" / "b.md").write_text(MD)
    (d / "c.html").write_text(HTML)
    (d / "skip.bin").write_bytes(b"\x00\x01")
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def test_scan_filters_extensions(spark, file_dir):
    got = sorted(r["path"].rsplit("/", 1)[-1] for r in
                 sources.scan_files(spark, file_dir).collect())
    assert got == ["a.txt", "b.md", "c.html"]


def test_decode_html_and_links(spark, file_dir):
    docs = sources.decode_documents(
        sources.scan_files(spark, file_dir), chunk_chars=1000).toPandas()
    by_ext = {r.conv_id.rsplit(".", 1)[-1]: r.text
              for r in docs.itertuples()}
    assert by_ext["txt"].startswith("hello transcripts world")
    # markdown link stripped, text kept
    assert "the docs" in by_ext["md"] and "http" not in by_ext["md"]
    # html: tags/script/style gone, entities decoded, link stripped
    assert "Spark & Search" in by_ext["html"]
    assert "compressed" in by_ext["html"]
    assert "<" not in by_ext["html"] and "var x" not in by_ext["html"]
    assert "http" not in by_ext["html"]


def test_decode_rejects_unknown_extensions(spark, file_dir):
    files = sources.scan_files(spark, file_dir, ("txt", "bin"))
    with pytest.raises(NotImplementedError, match="bin"):
        sources.decode_documents(files)


def test_chunking_covers_text(spark, file_dir):
    docs = sources.decode_documents(
        sources.scan_files(spark, file_dir, ("txt",)),
        chunk_chars=20).toPandas().sort_values("turn_idx")
    assert len(docs) > 1
    assert "".join(docs["text"]) == TXT  # no overlap → exact tiling


def test_fetch_url_file_scheme(spark, file_dir, tmp_path):
    """S7 URL fetch feeding the decode path (file:// stands in for
    http in the sandbox — same urllib code path)."""
    src = Path(file_dir) / "a.txt"
    rows = api.embed_url(spark, src.as_uri()).toPandas()
    assert len(rows) >= 1
    assert rows.iloc[0]["text"].startswith("hello transcripts world")


def test_adapter_abc_matches_reference_surface():
    """API parity with the reference Adapter ABC
    (_embed_anything.pyi:5-53): same four abstract methods."""
    from embedanything_spark.adapters import Adapter
    assert Adapter.__abstractmethods__ == {
        "create_index", "delete_index", "convert", "upsert"}


def test_foreach_batch_drives_user_adapter(spark, tmp_path):
    """A user adapter (test double) receives every micro-batch through
    the foreachBatch slot — the reference's streaming adapter flush
    (lib.rs:836-962)."""
    from embedanything_spark.adapters import Adapter, foreach_batch_sink
    from embedanything_spark.streaming.ingest import TRANSCRIPT_SCHEMA

    calls = {"created": [], "rows": 0}

    class Recording(Adapter):
        def create_index(self, dimension=0, metric="bm25",
                         index_name="", **kw):
            calls["created"].append(index_name)

        def delete_index(self, index_name):
            pass

        def convert(self, embeddings):
            return embeddings.selectExpr("conv_id", "text")

        def upsert(self, data):
            calls["rows"] += data.count()

    src = tmp_path / "adapter_src"
    from embedanything_spark.datagen import gen_transcripts_df
    gen_transcripts_df(spark, 10).write.mode("overwrite") \
        .parquet(str(src))
    ad = Recording()
    ad.create_index(index_name="mem://test")
    stream = (spark.readStream.schema(TRANSCRIPT_SCHEMA)
              .parquet(str(src)))
    q = (stream.writeStream.foreachBatch(foreach_batch_sink(ad))
         .option("checkpointLocation", str(tmp_path / "adapter_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert calls["created"] == ["mem://test"]
    assert calls["rows"] > 0


def test_index_writer_adapter_upsert_roundtrip(spark, tmp_path):
    """Default adapter: create_index → convert → upsert twice →
    queryable index with both batches; delete_index removes it."""
    from embedanything_spark.adapters import IndexWriterAdapter
    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index.build import committed_lineage
    from embedanything_spark.index.query import IndexReader
    import pandas as pd

    root = str(tmp_path / "adapter_idx")
    ad = IndexWriterAdapter(num_partitions=4)
    ad.create_index(index_name=root)
    t = gen_transcripts_df(spark, 40)
    ad.upsert(ad.convert(t.filter("conv_id < 'conv-00000020'")))
    ad.upsert(ad.convert(t.filter("conv_id >= 'conv-00000020'")))
    assert [ln["batch_id"] for ln in committed_lineage(root)] == \
        ["upsert-000000", "upsert-000001"]
    q = pd.DataFrame({"query_id": [0], "query_text": ["term00001"],
                      "k": [5]})
    assert len(IndexReader(spark, root).search(q).toPandas()) > 0
    ad.delete_index(root)
    assert not Path(root).exists()


def test_api_end_to_end(spark, file_dir, tmp_path):
    idx = str(tmp_path / "api_idx")
    lineage = api.embed_directory(spark, file_dir, idx)
    assert lineage["n_docs"] > 0
    res = api.embed_query(spark, idx, ["transcripts hello"], k=3) \
        .toPandas()
    assert len(res) >= 1
    assert res.iloc[0]["conv_id"].endswith("a.txt")
    # incremental second pass: everything already indexed → skipped
    again = api.embed_directory(spark, file_dir, idx)
    assert again.get("skipped") and again["n_docs"] == 0
    # add one new file → only it is ingested
    Path(file_dir, "new.txt").write_text("fresh transcripts arrive")
    third = api.embed_directory(spark, file_dir, idx)
    assert third["n_docs"] == 1
    res2 = api.embed_query(spark, idx, ["fresh"], k=2).toPandas()
    assert res2.iloc[0]["conv_id"].endswith("new.txt")
