"""File sources: directory scan + format decode (SURVEY.md §2.1).

Implements the reference's file-loading surface with Spark built-ins:

- ``scan_files``: recursive directory walk with an extension regex
  filter (``rust/src/file_loader.rs:27-53``) — a ``binaryFile`` read,
  so the same call works on s3a:// / abfs:// paths on a real cluster.
- ``decode_documents``: per-extension decode to text
  (``processors/src/*``): TXT/MD pass through UTF-8
  (``txt_processor.rs:17-21``, ``markdown_processor.rs:17-26``); HTML
  is tag-stripped, entity-decoded and markdown-link-stripped with pure
  Catalyst regex ops (``html_processor.rs:31-42`` — its link-strip
  regex is P5). DOCX (zip + document.xml walk, pure stdlib —
  ``docx_processor.rs:19-40``) and PDF (Flate-stream + Tj/TJ subset —
  ``pdf_processor.rs:43-100``) decode through an Arrow-batched pandas
  UDF over the binary column (``mediacodecs``); exotic PDFs
  (CID fonts, encryption, scans) still need a real lib — the kernel
  raises a clear error for non-PDF bytes rather than guessing.
- ``incremental_files``: anti-join against the already-indexed set
  (``file_loader.rs:118-126`` — S5 at file granularity).

Decoded output is transcript-shaped (conv_id = file path, turn_idx =
chunk index) so it feeds ``IndexWriter.build`` directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TEXT_EXTENSIONS = ("txt", "md", "html")
BINARY_EXTENSIONS = ("docx", "pdf")
_DECODABLE = set(TEXT_EXTENSIONS) | set(BINARY_EXTENSIONS)


def scan_files(spark: SparkSession, path: str,
               extensions: tuple[str, ...] = TEXT_EXTENSIONS) -> DataFrame:
    """Recursive scan of ``path`` filtered to ``extensions`` —
    (path, modificationTime, length, content) like the reference's
    FileParser walk (metadata projection P6 included for free)."""
    ext_re = "|".join(extensions)
    return (spark.read.format("binaryFile")
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*")
            .load(path)
            .filter(F.col("path").rlike(rf"\.({ext_re})$")))


def _html_to_text(col: F.Column) -> F.Column:
    """Pure-regex HTML → text: drop script/style blocks, strip tags,
    decode the common entities, strip markdown links (P5), squeeze
    whitespace. The reference delegates to an html→markdown crate;
    this covers the same test surface for simple documents."""
    c = F.regexp_replace(col, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", "\""), ("&#39;", "'"), ("&nbsp;", " ")):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"\[([^\]]+)\]\([^\)]+\)", "$1")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _decode_binary_docs(content_ser, ext_ser):
    """Arrow-batch kernel: DOCX/PDF bytes → text (mediacodecs).
    Non-binary extensions return None: pandas UDFs are evaluated
    eagerly on every row regardless of the surrounding F.when, so the
    kernel itself must skip rows the when() routes elsewhere."""
    from embedanything_spark import mediacodecs as mc
    out = []
    for content, ext in zip(content_ser, ext_ser):
        if ext == "docx":
            out.append(mc.docx_to_text(bytes(content)))
        elif ext == "pdf":
            out.append(mc.pdf_to_text(bytes(content)))
        else:
            out.append(None)
    import pandas as pd
    return pd.Series(out, dtype=object)


def decode_documents(files: DataFrame, chunk_chars: int = 1000,
                     overlap_chars: int = 0) -> DataFrame:
    """Decode scanned files to transcript-shaped chunk rows
    (conv_id = path, turn_idx = chunk index, text = chunk). Chunking
    mirrors TextEmbedConfig's char splitter (chunk_size=1000 default,
    config.rs:64-78). Unknown extensions raise at plan construction —
    the seam is explicit, not silent. TXT/MD/HTML decode stays pure
    Catalyst (JVM-side); DOCX/PDF rows go through ONE Arrow-batched
    pandas UDF (binary in, string out) — the only Python in the path,
    and only for rows that need it."""
    exts = [r["ext"] for r in
            files.select(F.regexp_extract("path", r"\.(\w+)$", 1)
                         .alias("ext")).distinct().collect()]
    bad = sorted({e.lower() for e in exts} - _DECODABLE)
    if bad:
        raise NotImplementedError(
            f"no decoder for extensions {bad}: known text formats are "
            f"{sorted(_DECODABLE)} — decode others upstream or extend "
            "mediacodecs with a real kernel")
    ext = F.lower(F.regexp_extract("path", r"\.(\w+)$", 1))
    raw = F.decode(F.col("content"), "UTF-8")
    text = F.when(ext == "html", _html_to_text(raw)).otherwise(
        F.regexp_replace(raw, r"\[([^\]]+)\]\([^\)]+\)", "$1"))
    if any(e.lower() in BINARY_EXTENSIONS for e in exts):
        from pyspark.sql.functions import pandas_udf
        binary_decode = pandas_udf(_decode_binary_docs, "string")
        text = F.when(ext.isin(*BINARY_EXTENSIONS),
                      binary_decode(F.col("content"), ext)) \
            .otherwise(text)
    step = max(1, chunk_chars - overlap_chars)
    chunks = F.expr(
        f"transform(sequence(0, greatest(length(full) - 1, 0), {step}),"
        f" s -> substring(full, s + 1, {chunk_chars}))")
    return (files
            .select(F.col("path").alias("conv_id"),
                    F.col("modificationTime").alias("ts"),
                    text.alias("full"))
            .select("conv_id", "ts",
                    F.posexplode(chunks).alias("turn_idx", "text"))
            .select("conv_id", F.col("turn_idx").cast("int"),
                    F.lit("doc").alias("role"), "text",
                    F.lit(None).cast("string").alias("tool"), "ts"))


def synth_binary_docs(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic DOCX/PDF files (binaryFile-shaped rows, payloads
    authored by ``mediacodecs.make_docx``/``make_pdf``): even ids are
    .docx with two paragraphs, odd ids .pdf with two text lines, each
    containing the id — so a SQL oracle reconstructs the decoded text
    from the path alone while the Spark side genuinely unzips/inflates
    the payload."""
    import pandas as pd

    def gen(batches):
        from embedanything_spark import mediacodecs as mc
        ts = pd.Timestamp("2026-01-01")
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                if i % 2 == 0:
                    payload = mc.make_docx(
                        [f"para one of {i}", f"para two of {i}"])
                    path = f"/docs/{i:06d}.docx"
                else:
                    payload = mc.make_pdf(
                        [f"line one of {i}", f"line two of {i}"])
                    path = f"/docs/{i:06d}.pdf"
                rows.append((path, ts, len(payload), payload))
            yield pd.DataFrame(rows, columns=["path", "modificationTime",
                                              "length", "content"])

    return spark.range(n).mapInPandas(
        gen, schema="path string, modificationTime timestamp, "
                    "length long, content binary")


def incremental_files(files: DataFrame, indexed: DataFrame) -> DataFrame:
    """S5: drop files whose path is already in the indexed set."""
    return files.join(indexed.select("path"), "path", "left_anti")


def fetch_url(url: str, dest_dir: str | None = None) -> str:
    """S7 URL fetch (``processors/src/processor.rs:23-57``): download
    one document into a local staging dir and return its path, ready
    for ``scan_files``/``decode_documents``. Driver-side by design —
    the reference's URL processor is an equally blocking reqwest GET:
    this is an ingest utility, not a distributed operator (bulk crawls
    belong in an upstream fetcher writing to object storage)."""
    import tempfile
    import urllib.parse
    import urllib.request

    from pathlib import Path
    dest = Path(dest_dir or tempfile.mkdtemp(prefix="ea_url_"))
    dest.mkdir(parents=True, exist_ok=True)
    name = Path(urllib.parse.urlparse(url).path).name or "index.html"
    if "." not in name:
        name += ".html"
    out = dest / name
    with urllib.request.urlopen(url) as r:
        out.write_bytes(r.read())
    return str(out)
