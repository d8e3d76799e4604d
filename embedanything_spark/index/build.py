"""Distributed inverted-index build (SURVEY.md §7.5-6).

Pipeline (exactly two shuffles end-to-end, regardless of scale):

  transcripts
    → [shuffle 1] repartitionByRange(conv_id, turn_idx) + sort
      → dense doc_id assignment (Arrow two-pass zipWithIndex)
    → mapInPandas: tokenize + per-doc term counting (tf is DOC-LOCAL —
      no groupBy(doc,term) shuffle; the Counter lives inside the same
      Arrow pass that tokenizes)
    → [shuffle 2] repartitionByRange(term, range_id) + sort(term,
      range_id, doc_id)
    → mapInPandas block encoder → postings parquet
    → dictionary = groupBy(term) over block METADATA only (bytes
      columns pruned by parquet) — the "segment merge into a global
      term dictionary" of the north rule.

Skew: ``range_id = doc_id // block_range`` participates in the
repartition key, so a hot Zipf head term's postings fan out across
many partitions (the salt of the north rule's "salted
repartitionByRange on term hash") while each (term, range_id) group
stays ≤ block_range postings. Doc-range-aligned blocks also make
block-max pruning exact at query time: sum of per-term block upper
bounds is a valid bound for every doc in the range.

Blocks store (max_tf, min_dl) rather than a precomputed impact so
upper bounds remain valid if avgdl drifts under incremental appends:
tf·(k1+1)/(tf + k1(1-b+b·dl/avgdl)) is increasing in tf and
decreasing in dl, hence f(max_tf, min_dl) bounds every posting.

The reference analogue: its sparse-embed stage emits per-term weights
per chunk (bert.rs:361-400) and streams batches to an index sink
(lib.rs:836-962); here the "sink" is a compressed, sorted, partitioned
parquet layout plus JSON meta/lineage manifests (Iceberg-shaped; swap
``writeTo(...).append()`` in when an Iceberg catalog is configured).
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from embedanything_spark import B, K1
from embedanything_spark.analyzer import ANALYZER_VERSION
from embedanything_spark.index.codec import delta_encode, varint_encode
from embedanything_spark.operators.doc_ids import zip_with_index

DEFAULT_BLOCK_RANGE = 4096

_TF_SCHEMA = "doc_id long, term string, tf int, doclen int"
_BLOCK_SCHEMA = ("term string, range_id long, n int, min_doc long, "
                 "max_doc long, max_tf int, min_dl int, sum_tf long, "
                 "doc_bytes binary, tf_bytes binary, dl_bytes binary")


def _count_terms(batches):
    """Per-doc tf extraction over pre-tokenized docs, one Arrow pass.

    tf is DOC-LOCAL so no shuffle is needed: flatten the token arrays
    with repeated doc ids and count (doc, term) pairs with a C-speed
    pandas groupby — no per-row Python in the hot path.
    """
    for pdf in batches:
        toks = pdf["tokens"]
        lens = toks.map(len).to_numpy(np.int64)
        nz = lens > 0
        if not nz.any():
            continue
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        flat = pd.DataFrame({
            "doc_id": np.repeat(doc_ids, lens),
            "term": np.concatenate([np.asarray(t, dtype=object)
                                    for t in toks[nz]]),
            "doclen": np.repeat(lens, lens),
        })
        out = (flat.groupby(["doc_id", "term", "doclen"], sort=False)
                   .size().rename("tf").reset_index())
        out["tf"] = out["tf"].astype(np.int32)
        out["doclen"] = out["doclen"].astype(np.int32)
        yield out[["doc_id", "term", "tf", "doclen"]]


def _encode_group(term: str, range_id: int, g: pd.DataFrame) -> tuple:
    doc = g["doc_id"].to_numpy(np.uint64)
    tf = g["tf"].to_numpy(np.uint64)
    dl = g["doclen"].to_numpy(np.uint64)
    return (term, int(range_id), len(doc), int(doc[0]), int(doc[-1]),
            int(tf.max()), int(dl.min()), int(tf.sum()),
            delta_encode(doc - doc[0]), varint_encode(tf),
            varint_encode(dl))


def _encode_blocks(batches):
    """Encode (term, range_id) groups; carries the trailing group
    across Arrow batch boundaries (groups never straddle partitions —
    range partitioning keeps equal keys together)."""
    cols = ["term", "range_id", "n", "min_doc", "max_doc", "max_tf",
            "min_dl", "sum_tf", "doc_bytes", "tf_bytes", "dl_bytes"]
    carry = None
    for pdf in batches:
        if carry is not None:
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if len(pdf) == 0:
            continue
        # boundary of the last (term, range_id) group → carry
        t = pdf["term"].to_numpy()
        r = pdf["range_id"].to_numpy()
        last_start = len(pdf) - 1
        while last_start > 0 and t[last_start - 1] == t[-1] \
                and r[last_start - 1] == r[-1]:
            last_start -= 1
        carry = pdf.iloc[last_start:].reset_index(drop=True)
        head = pdf.iloc[:last_start]
        if len(head):
            rows = [_encode_group(term, rid, g) for (term, rid), g
                    in head.groupby(["term", "range_id"], sort=False)]
            yield pd.DataFrame(rows, columns=cols)
    if carry is not None and len(carry):
        rows = [_encode_group(term, rid, g) for (term, rid), g
                in carry.groupby(["term", "range_id"], sort=False)]
        yield pd.DataFrame(rows, columns=cols)


TABLES = ("docmap", "doc_stats", "postings")


def committed_lineage(root: str | Path) -> list[dict]:
    """Committed batches, in commit order (the snapshot manifest)."""
    f = Path(root) / "_meta/lineage.jsonl"
    if not f.exists():
        return []
    return [json.loads(line) for line in f.read_text().splitlines() if line]


def table_paths(root: str | Path, table: str) -> list[str]:
    """Parquet dirs of COMMITTED batches only — a reader never sees a
    half-written batch (snapshot-read semantics; with an Iceberg catalog
    this is the table's current snapshot)."""
    return [str(Path(root) / table / f"batch-{ln['batch_id']}")
            for ln in committed_lineage(root)]


class IndexWriter:
    """Builds the index tables + meta/lineage manifests under a root dir.

    Layout (all parquet unless noted):
      root/docmap/batch-*/     doc_id, conv_id, turn_idx, role, ts
      root/doc_stats/batch-*/  doc_id, doclen
      root/postings/batch-*/   block rows (term-clustered files →
                               parquet row-group pruning on term)
      root/dictionary/         term, df, cf   (global, rebuilt at finalize)
      root/_meta/meta.json, lineage.jsonl, plan.json

    Commit protocol (Iceberg-snapshot-shaped, SURVEY.md §4 item 6):
    a batch's tables are written to fresh batch-<id> dirs first; the
    lineage line is appended ONLY after all three writes succeed — that
    append is the atomic commit point. Readers resolve paths through
    the lineage manifest, so a crash mid-batch leaves only invisible
    orphan dirs, which resume() deletes before re-running the batch.
    """

    def __init__(self, root: str, block_range: int = DEFAULT_BLOCK_RANGE,
                 num_partitions: int | None = None):
        self.root = Path(root)
        self.block_range = block_range
        self.num_partitions = num_partitions

    def _parts(self, spark: SparkSession) -> int:
        return self.num_partitions or spark.sparkContext.defaultParallelism

    def clean(self):
        import shutil
        if self.root.exists():
            shutil.rmtree(self.root)

    def build(self, transcripts: DataFrame, batch_id: str = "full",
              doc_id_offset: int = 0, finalize: bool = True) -> dict:
        """Build the index (or one committed batch of it)."""
        spark = transcripts.sparkSession
        t0 = time.time()
        parts = self._parts(spark)

        from embedanything_spark.analyzer import tokenize_udf
        docs = zip_with_index(
            transcripts.select("conv_id", "turn_idx", "role", "ts", "text"),
            ["conv_id", "turn_idx"], num_partitions=parts)
        if doc_id_offset:
            docs = docs.withColumn(
                "doc_id", F.col("doc_id") + F.lit(doc_id_offset))
        # tokenize exactly once; docs persist carries tokens, not text
        docs = docs.select(
            "doc_id", "conv_id", "turn_idx", "role", "ts",
            tokenize_udf("text").alias("tokens")).persist()

        sub = f"batch-{batch_id}"
        (docs.select("doc_id", "conv_id", "turn_idx", "role", "ts")
             .write.mode("overwrite")
             .parquet(str(self.root / "docmap" / sub)))

        (docs.select("doc_id", F.size("tokens").alias("doclen"))
             .write.mode("overwrite")
             .parquet(str(self.root / "doc_stats" / sub)))

        tf = docs.select("doc_id", "tokens").mapInPandas(
            _count_terms, schema=_TF_SCHEMA)

        blocks = (tf
                  .withColumn("range_id",
                              (F.col("doc_id") / F.lit(self.block_range))
                              .cast("long"))
                  .repartitionByRange(parts, "term", "range_id")
                  .sortWithinPartitions("term", "range_id", "doc_id")
                  .mapInPandas(_encode_blocks, schema=_BLOCK_SCHEMA))
        blocks.write.mode("overwrite").parquet(
            str(self.root / "postings" / sub))

        n_batch_docs = docs.count()
        docs.unpersist()
        elapsed = time.time() - t0
        lineage = {
            "batch_id": batch_id,
            "doc_id_offset": doc_id_offset,
            "n_docs": int(n_batch_docs),
            "wall_sec": round(elapsed, 3),
            "turns_per_sec": round(n_batch_docs / max(elapsed, 1e-9), 1),
            "num_partitions": parts,
            "snapshot_id": uuid.uuid4().hex,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
        }
        meta_dir = self.root / "_meta"
        meta_dir.mkdir(parents=True, exist_ok=True)
        with (meta_dir / "lineage.jsonl").open("a") as f:
            f.write(json.dumps(lineage) + "\n")  # ← atomic commit point
        if finalize:
            self.finalize(spark)
        return lineage

    def finalize(self, spark: SparkSession) -> dict:
        """Segment merge → global dictionary + corpus meta. Idempotent;
        re-run after resume. Reads block METADATA only (parquet column
        pruning skips the byte payloads). groupBy(term) gets map-side
        partial aggregation; range_id already salted the hot terms
        across input partitions, so no reducer sees a whole head term.
        """
        parts = self._parts(spark)
        postings = spark.read.parquet(*table_paths(self.root, "postings"))
        (postings.groupBy("term")
                 .agg(F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"))
                 .repartitionByRange(max(1, parts // 4), "term")
                 .sortWithinPartitions("term")
                 .write.mode("overwrite")
                 .parquet(str(self.root / "dictionary")))

        stats = spark.read.parquet(
            *table_paths(self.root, "doc_stats")).agg(
            F.count("*").alias("n"), F.avg("doclen").alias("avgdl"),
            F.sum("doclen").alias("total_tokens")).collect()[0]
        meta = {
            "format_version": 1,
            "analyzer_version": ANALYZER_VERSION,
            "k1": K1, "b": B,
            "block_range": self.block_range,
            "n_docs": int(stats["n"]),
            "avgdl": float(stats["avgdl"] or 0.0),
            "total_tokens": int(stats["total_tokens"] or 0),
            "snapshot_id": uuid.uuid4().hex,
        }
        (self.root / "_meta/meta.json").write_text(
            json.dumps(meta, indent=2))
        return meta


class CheckpointedIndexBuilder:
    """Resumable build: input split into conv_id RANGES so sequential
    per-batch doc_id offsets reproduce the exact global dense rank —
    a resumed build is bit-identical to an uninterrupted one
    (FIXTURES.md §5). The range plan is computed once and frozen in
    plan.json; resume skips committed batches, deletes orphan dirs from
    a crashed batch, and re-finalizes.
    """

    def __init__(self, writer: IndexWriter, n_batches: int):
        self.w = writer
        self.n_batches = n_batches

    def _plan_path(self) -> Path:
        return self.w.root / "_meta/plan.json"

    def plan(self, transcripts: DataFrame) -> list[str | None]:
        """conv_id boundaries [b1..b_{n-1}] splitting convs evenly."""
        if self._plan_path().exists():
            return json.loads(self._plan_path().read_text())["bounds"]
        convs = zip_with_index(
            transcripts.select("conv_id").distinct(), ["conv_id"],
            id_col="rank", num_partitions=self.w._parts(
                transcripts.sparkSession))
        n = convs.count()
        step = max(1, -(-n // self.n_batches))
        bounds = [r["conv_id"] for r in
                  convs.filter((F.col("rank") % step == 0) &
                               (F.col("rank") > 0))
                  .orderBy("rank").collect()]
        self._plan_path().parent.mkdir(parents=True, exist_ok=True)
        self._plan_path().write_text(json.dumps({"bounds": bounds}))
        return bounds

    def _cleanup_orphans(self):
        committed = {ln["batch_id"] for ln in committed_lineage(self.w.root)}
        import shutil
        for table in TABLES:
            tdir = self.w.root / table
            if not tdir.exists():
                continue
            for d in tdir.iterdir():
                if d.name.startswith("batch-") and \
                        d.name[len("batch-"):] not in committed:
                    shutil.rmtree(d)

    def run(self, transcripts: DataFrame,
            stop_after: int | None = None) -> list[dict]:
        """Run (or resume) the build. ``stop_after`` simulates a crash
        after N batch commits (test hook). Returns lineage rows."""
        bounds = self.plan(transcripts)
        self._cleanup_orphans()
        committed = {ln["batch_id"]: ln
                     for ln in committed_lineage(self.w.root)}
        offset = 0
        done = []
        for i in range(self.n_batches):
            bid = f"{i:04d}"
            lo = bounds[i - 1] if i > 0 else None
            hi = bounds[i] if i < len(bounds) else None
            if bid in committed:
                offset += committed[bid]["n_docs"]
                done.append(committed[bid])
                continue
            part = transcripts
            if lo is not None:
                part = part.filter(F.col("conv_id") >= lo)
            if hi is not None:
                part = part.filter(F.col("conv_id") < hi)
            ln = self.w.build(part, batch_id=bid, doc_id_offset=offset,
                              finalize=False)
            offset += ln["n_docs"]
            done.append(ln)
            if stop_after is not None and \
                    len([d for d in done if d]) >= stop_after:
                return done  # simulated crash: no finalize
        self.w.finalize(transcripts.sparkSession)
        return done
