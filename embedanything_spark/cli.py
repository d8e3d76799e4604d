"""Thin CLI — the spark-submit-able entry point (reference analogue:
the Python API surface + server endpoints, SURVEY.md §2 S16; here a
batch CLI instead of HTTP).

  python -m embedanything_spark.cli build --input <parquet> --index <dir>
  python -m embedanything_spark.cli query --index <dir> -q "..." [-k 10]
  python -m embedanything_spark.cli gen --convs 1000 --out <parquet>

Also works as `spark-submit --py-files $(package_zip) cli.py ...` on a
real cluster.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--master", default=None,
                        help="Spark master (default: env/local[*])")
    p = argparse.ArgumentParser(prog="embedanything-spark",
                                parents=[common])
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate synthetic transcripts",
                       parents=[common])
    g.add_argument("--convs", type=int, required=True)
    g.add_argument("--out", required=True)

    b = sub.add_parser("build", help="build the inverted index",
                       parents=[common])
    b.add_argument("--input", required=True,
                   help="transcripts parquet path")
    b.add_argument("--index", required=True, help="index root dir")
    b.add_argument("--batches", type=int, default=1,
                   help=">1 → checkpointed/resumable build")
    b.add_argument("--block-range", type=int, default=None)
    b.add_argument("--partitions", type=int, default=None)

    st = sub.add_parser("stats", help="index meta + per-batch and "
                        "per-partition lineage", parents=[common])
    st.add_argument("--index", required=True)

    c = sub.add_parser("compact", help="merge all committed batch "
                       "segments into one (Lucene-merge analogue)",
                       parents=[common])
    c.add_argument("--index", required=True)
    c.add_argument("--scope", default="merge",
                   choices=["merge", "delta", "auto"],
                   help="merge: fold everything into one layer; "
                        "delta: tiered — new layer for the appended "
                        "deltas only; auto: tiered until the layer "
                        "cap, then merge")

    q = sub.add_parser("query", help="BM25 top-k search",
                       parents=[common])
    q.add_argument("--index", required=True)
    q.add_argument("-q", "--query", action="append", required=True,
                   help="query text (repeatable)")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--no-prune", action="store_true",
                   help="disable block-max pruning (debug)")
    q.add_argument("--distributed", action="store_true",
                   help="run the query as a Spark job (default: the "
                        "driver-side serving path, rank-identical, ~0.1 s "
                        "instead of job-scheduling seconds)")
    q.add_argument("--rerank", metavar="TRANSCRIPTS",
                   help="cross-encoder rerank stage (reference query "
                        "path step 3); needs the transcripts parquet "
                        "for pair text")
    q.add_argument("--asof", metavar="BATCH_ID",
                   help="time-travel: query the index as of a "
                        "committed batch (snapshot read on the "
                        "lineage manifest)")

    s = sub.add_parser("serve", help="HTTP serving tier (no Spark/JVM "
                                     "in the process — search_local + "
                                     "OpenAI-shaped /v1/embeddings)")
    s.add_argument("--index", help="committed index root (omit to "
                                   "serve only /health + embeddings)")
    s.add_argument("--host", default="0.0.0.0")
    s.add_argument("--port", type=int, default=8080)

    args = p.parse_args(argv)
    if args.cmd == "serve":
        from embedanything_spark.server import serve
        serve(args.index, args.host, args.port)
        return
    from embedanything_spark.session import get_spark
    spark = get_spark(app=f"ea-cli-{args.cmd}", master=args.master)
    try:
        if args.cmd == "gen":
            from embedanything_spark.datagen import gen_transcripts_df
            gen_transcripts_df(spark, args.convs) \
                .write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out, "convs": args.convs}))
        elif args.cmd == "build":
            from embedanything_spark.index.build import (
                CheckpointedIndexBuilder, IndexWriter)
            kw = {}
            if args.block_range:
                kw["block_range"] = args.block_range
            w = IndexWriter(args.index, num_partitions=args.partitions,
                            **kw)
            t = spark.read.parquet(args.input)
            if args.batches > 1:
                lineage = CheckpointedIndexBuilder(
                    w, args.batches).run(t)
                print(json.dumps(lineage[-1]))
            else:
                print(json.dumps(w.build(t)))
        elif args.cmd == "compact":
            from embedanything_spark.index.build import IndexWriter
            print(json.dumps(IndexWriter(args.index)
                  .compact(spark, scope=args.scope)))
        elif args.cmd == "stats":
            from embedanything_spark.index.build import (
                committed_lineage, partition_lineage)
            meta = json.loads(
                (__import__("pathlib").Path(args.index) /
                 "_meta/meta.json").read_text())
            print(json.dumps({"meta": meta,
                              "batches": committed_lineage(args.index)}))
            for r in (partition_lineage(spark, args.index)
                      .orderBy("part_id").toPandas()
                      .itertuples(index=False)):
                print(json.dumps({k: (v if not hasattr(v, "item")
                                      else v.item())
                                  for k, v in r._asdict().items()}))
        elif args.cmd == "query":
            import pandas as pd

            from embedanything_spark.index.query import IndexReader
            qp = pd.DataFrame({
                "query_id": range(len(args.query)),
                "query_text": args.query,
                "k": [args.k] * len(args.query)})
            reader = IndexReader(spark, args.index, asof=args.asof)
            if args.rerank or args.distributed:
                res = reader.search(qp, prune=not args.no_prune)
                if args.rerank:
                    from embedanything_spark.index.rerank import rerank
                    res = rerank(res, qp,
                                 spark.read.parquet(args.rerank))
                out = res.toPandas()
            else:
                out = reader.search_local(qp, prune=not args.no_prune)
            for r in out.itertuples(index=False):
                rec = {"query_id": int(r.query_id),
                       "rank": int(r.rank),
                       "conv_id": r.conv_id,
                       "turn_idx": int(r.turn_idx),
                       "doc_id": int(r.doc_id),
                       "score": round(float(r.score), 6)}
                if args.rerank:
                    rec["rerank_score"] = round(
                        float(r.rerank_score), 6)
                print(json.dumps(rec))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
