"""Benchmark harness (north rule, BASELINE.md).

Measures, in one run:
1. index-build throughput (turns/sec) for the SAME materialized
   transcripts table at two parallelism levels — local[8] vs local[32],
   the sandbox stand-in for N vs 4N executors — and the scaling
   efficiency throughput_32 / (4 · throughput_8)  (target ≥ 0.8).
2. BM25 query latency p50/p95 over the frozen 50-query set, block-max
   WAND pruning on, one Spark job per query.
3. headline operator queries at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "build": {...throughput + efficiency...}}
and writes the human table to BENCH/BASELINE.md.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_CONVS (default 25000 ≈ 200k turns).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "100000"))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
LOW_PAR = max(2, CPUS // 4)


def _session(cores: int):
    from embedanything_spark.session import get_spark
    return get_spark(app=f"bench-{cores}", master=f"local[{cores}]",
                     shuffle_partitions=max(cores, 8))


def bench_build_and_query(results: dict) -> None:
    from embedanything_spark.datagen import (gen_query_set,
                                             gen_transcripts_df)
    from embedanything_spark.index.build import IndexWriter
    from embedanything_spark.index.query import IndexReader

    work = Path(tempfile.mkdtemp(prefix="ea_bench_"))
    try:
        # materialize the input ONCE (not part of the timed build)
        spark = _session(CPUS)
        src = str(work / "transcripts")
        gen_transcripts_df(spark, N_CONVS, partitions=CPUS * 2) \
            .write.mode("overwrite").parquet(src)
        n_turns = spark.read.parquet(src).count()
        spark.stop()

        # best-of-k per level (interleaved) — the sandbox carries noisy
        # background load, so a single timing conflates neighbor noise
        # with scaling; min-of-k measures capability at each level
        build = {"n_turns": n_turns, "n_convs": N_CONVS,
                 "repeats": REPEATS}
        times: dict[int, list[float]] = {LOW_PAR: [], CPUS: []}
        spark = None
        for rep in range(REPEATS):
            for cores in (LOW_PAR, CPUS):
                if spark is not None:
                    spark.stop()
                spark = _session(cores)
                t = spark.read.parquet(src)
                # warm Python workers before timing
                t.limit(2000).mapInPandas(lambda it: it,
                                          schema=t.schema).count()
                root = str(work / f"idx{cores}")
                t0 = time.time()
                IndexWriter(root, num_partitions=cores).build(t)
                times[cores].append(time.time() - t0)
        for cores, tag in ((LOW_PAR, "low"), (CPUS, "high")):
            dt = min(times[cores])
            build[f"cores_{tag}"] = cores
            build[f"build_sec_{tag}"] = round(dt, 2)
            build[f"build_sec_{tag}_all"] = [round(x, 1)
                                             for x in times[cores]]
            build[f"turns_per_sec_{tag}"] = round(n_turns / dt, 1)
        # last session is local[CPUS] (query bench uses it)
        if spark.sparkContext.master != f"local[{CPUS}]":
            spark.stop()
            spark = _session(CPUS)
        ratio = CPUS / LOW_PAR
        build["scaling_efficiency"] = round(
            build["turns_per_sec_high"] /
            (ratio * build["turns_per_sec_low"]), 3)
        results["build"] = build

        # query latency: one job per query, pruning on (local[CPUS])
        reader = IndexReader(spark, str(work / f"idx{CPUS}"))
        queries = gen_query_set()
        lat = []
        for row in queries.itertuples():
            q = queries[queries.query_id == row.query_id]
            t0 = time.time()
            reader.search(q, prune=True).collect()
            lat.append(time.time() - t0)
        results["query"] = {
            "n_queries": len(lat),
            "p50_sec": round(statistics.median(lat), 3),
            "p95_sec": round(sorted(lat)[int(0.95 * len(lat)) - 1], 3),
            "mean_sec": round(statistics.mean(lat), 3),
        }
        spark.stop()
    finally:
        shutil.rmtree(work, ignore_errors=True)


HEADLINE = ["bm25_topk", "term_dictionary", "dedup_minhash",
            "dedup_ngram_jaccard", "knn_cosine", "event_sessionize",
            "quality_score"]


def bench_headline(results: dict) -> None:
    import __spark_entry__ as entry_mod
    spark = _session(CPUS)
    qs = entry_mod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, SF_DIR).collect()
        out[name] = round(time.time() - t0, 3)
    results["queries"] = out
    spark.stop()


def write_baseline_md(results: dict) -> None:
    b = results["build"]
    q = results["query"]
    md = f"""# BENCH/BASELINE — measured results

Input: synthetic transcripts, seed=42, {b['n_convs']} convs /
{b['n_turns']} turns, materialized to parquet before timing.
Headline operator queries at `{SF_DIR}`.

## Index build (north rule: N vs 4N parallelism)

| parallelism | build sec | turns/sec |
|---|---|---|
| local[{b['cores_low']}] (N) | {b['build_sec_low']} | {b['turns_per_sec_low']} |
| local[{b['cores_high']}] (4N) | {b['build_sec_high']} | {b['turns_per_sec_high']} |

**Scaling efficiency: {b['scaling_efficiency']}** (target ≥ 0.8;
= tput_4N / (4 × tput_N); single-box stand-in for multi-executor run).

## BM25 query latency (50-query frozen set, block-max WAND on)

| p50 | p95 | mean |
|---|---|---|
| {q['p50_sec']} s | {q['p95_sec']} s | {q['mean_sec']} s |

## Headline operator queries ({SF_DIR})

| query | sec |
|---|---|
""" + "\n".join(f"| {k} | {v} |" for k, v in results["queries"].items()) \
        + "\n"
    Path("BENCH").mkdir(exist_ok=True)
    Path("BENCH/BASELINE.md").write_text(md)


def main():
    t0 = time.time()
    results: dict = {"sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1]}
    bench_build_and_query(results)
    bench_headline(results)
    total = round(time.time() - t0, 2)
    line = {
        "metric": "index-build turns/sec @ N vs 4N + BM25 p50 + "
                  "headline operator latencies",
        "value": total,
        "unit": "sec",
        "queries": results["queries"],
        "sf": results["sf"],
        "build": results["build"],
        "query_latency": results["query"],
    }
    write_baseline_md(results)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
