"""Round-6 optimization measurement harness (guide §1) — SEPARATE from
the frozen bench.py. Isolates each headline query with the noop sink,
captures .explain("formatted") to plans/r06/, and times the
build/compact components individually so optimizations can be
attributed. Never used by the driver; numbers cited in
OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py queries [names...]   # noop-timed headline queries + plans
  python bench_extra.py build [n_convs]      # one timed build at all cores
  python bench_extra.py compact [n_convs]    # build + timed full compact
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PLANS = Path(__file__).parent / "plans" / "r06"

HEADLINE = ["bm25_topk", "term_dictionary", "dedup_minhash",
            "dedup_ngram_jaccard", "knn_cosine", "event_sessionize",
            "quality_score", "hybrid_rrf", "statistical_chunk"]


def _session():
    from embedanything_spark.session import get_spark
    return get_spark(app="bench-extra", master=f"local[{CPUS}]",
                     shuffle_partitions=max(CPUS, 8))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def _explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def run_queries(names=None, tag="", reps=3):
    import __spark_entry__ as entry_mod
    spark = _session()
    qs = entry_mod.queries()
    PLANS.mkdir(parents=True, exist_ok=True)
    out = {}
    for name in (names or HEADLINE):
        spark.sparkContext.setJobDescription(f"{name} warm")
        df = qs[name](spark, SF_DIR)
        plan = _explain_str(df)
        suffix = tag or "current"
        (PLANS / f"{name}_{suffix}.txt").write_text(plan)
        noop(df)  # warmup (captures python-worker/broadcast init)
        ts = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name} timed {i}")
            t0 = time.time()
            noop(qs[name](spark, SF_DIR))
            ts.append(round(time.time() - t0, 3))
        out[name] = ts
        print(f"{name}: min={min(ts)} all={ts}", flush=True)
    print({k: min(v) for k, v in out.items()})
    spark.stop()


def run_build(n_convs=250_000):
    import shutil
    import tempfile

    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index.build import IndexWriter
    spark = _session()
    work = Path(tempfile.mkdtemp(prefix="ea_x_"))
    try:
        src = str(work / "t")
        gen_transcripts_df(spark, n_convs, partitions=CPUS * 2) \
            .write.mode("overwrite").parquet(src)
        t = spark.read.parquet(src)
        n = t.count()
        # warm
        w = t.sample(False, 0.2, seed=1)
        IndexWriter(str(work / "w")).build(w)
        t0 = time.time()
        IndexWriter(str(work / "idx")).build(t)
        dt = time.time() - t0
        print(f"build: {n} turns in {dt:.2f}s = {n / dt:.0f} turns/s")
        from embedanything_spark.index.build import partition_lineage
        pl = partition_lineage(spark, str(work / "idx")).toPandas()
        print("part_sec: sum=%.1f max=%.2f med=%.2f n=%d" % (
            pl.part_sec.sum(), pl.part_sec.max(),
            pl.part_sec.median(), len(pl)))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


def run_compact(n_convs=250_000):
    import shutil
    import tempfile

    from embedanything_spark.datagen import gen_transcripts_df
    from embedanything_spark.index.build import IndexWriter
    spark = _session()
    work = Path(tempfile.mkdtemp(prefix="ea_xc_"))
    try:
        src = str(work / "t")
        gen_transcripts_df(spark, n_convs, partitions=CPUS * 2) \
            .write.mode("overwrite").parquet(src)
        t = spark.read.parquet(src)
        w = IndexWriter(str(work / "idx"))
        t0 = time.time()
        w.build(t)
        print(f"build: {time.time() - t0:.2f}s")
        t0 = time.time()
        w.compact(spark)
        print(f"compact: {time.time() - t0:.2f}s")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        run_queries(sys.argv[2:] or None,
                    tag=os.environ.get("PLAN_TAG", "before"))
    elif cmd == "build":
        run_build(int(sys.argv[2]) if len(sys.argv) > 2 else 250_000)
    elif cmd == "compact":
        run_compact(int(sys.argv[2]) if len(sys.argv) > 2 else 250_000)
