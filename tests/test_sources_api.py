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
