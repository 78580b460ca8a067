"""spark-submit entrypoint for the index build + query engine.

Cluster usage (the north_rule's deployment shape):

    bash tools/package.sh                       # -> dist/tfidf_spark.zip
    spark-submit --py-files dist/tfidf_spark.zip tools/submit_build.py \\
        build --corpus s3://bucket/corpus --out s3://bucket/index \\
        --text-col content --n-shards 512 --snapshot <iceberg-snapshot-id> --resume

    spark-submit --py-files dist/tfidf_spark.zip tools/submit_build.py \\
        query --index s3://bucket/index --terms "block max wand" --k 10

Local smoke:

    python tools/submit_build.py build --corpus /root/testdata/sf0.001/documents.parquet \\
        --out /dev/shm/idx --text-col text
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(prog="tfidf_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--corpus", required=True, help="corpus parquet path or Iceberg table name")
    b.add_argument("--out", required=True, help="output index directory")
    b.add_argument("--format", default="auto", choices=["auto", "parquet", "iceberg"])
    b.add_argument("--text-col", default="content")
    b.add_argument("--id-col", default=None, help="existing doc id column; derived from repo/path/commit when absent")
    b.add_argument("--n-shards", type=int, default=16)
    b.add_argument("--code-aware", action="store_true")
    b.add_argument(
        "--snapshot",
        default=None,
        help="Iceberg snapshot id to pin; the resume fingerprint defaults "
        "to load_corpus's source fingerprint (table@snapshot or path)",
    )
    b.add_argument("--resume", action="store_true")
    b.add_argument(
        "--partition-filter",
        default=None,
        metavar="COL=V1[,V2...][;COL2=...]",
        help="Iceberg partition scope (collection scoping), keyed by "
        "SOURCE column: values are coerced to the column type and pushed "
        "through the spec's transforms (identity, bucket, truncate, "
        "time), pruning manifests and files before the scan, e.g. "
        "'lang=py,go;repo=torvalds/linux' — works unchanged on a "
        "bucket(N, repo)-partitioned table",
    )

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--terms", required=True, help="space-separated query terms")
    q.add_argument("--k", type=int, default=10)

    args = ap.parse_args()

    # Under spark-submit an application session already exists; standalone
    # we build one with the engine defaults.
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from tfidf_spark.session import get_spark

        spark = get_spark(app_name="tfidf_spark-cli")

    if args.cmd == "build":
        from pyspark.sql import functions as F

        from tfidf_spark.index.builder import build_index
        from tfidf_spark.sources.catalog import load_corpus

        snapshot_id = int(args.snapshot) if (
            args.snapshot is not None and str(args.snapshot).isdigit()
        ) else None
        pfilter = None
        if args.partition_filter:
            pfilter = {
                kv.split("=", 1)[0]: kv.split("=", 1)[1].split(",")
                for kv in args.partition_filter.split(";")
            }
        docs, fingerprint = load_corpus(
            spark, args.corpus, fmt=args.format, snapshot_id=snapshot_id,
            partition_filter=pfilter,
        )
        id_col = args.id_col
        if id_col is None:
            if "doc_id" in docs.columns:
                id_col = "doc_id"
            else:
                docs = docs.withColumn(
                    "doc_id", F.xxhash64("repo", "path", "commit")
                )
                id_col = "doc_id"
        manifest = build_index(
            docs,
            args.out,
            text_col=args.text_col,
            id_col=id_col,
            n_shards=args.n_shards,
            code_aware=args.code_aware,
            # explicit non-numeric --snapshot wins (external version tag);
            # a NUMERIC --snapshot is an Iceberg snapshot pin already encoded
            # in the table-qualified fingerprint — using the bare number here
            # would let two different tables pinned to the same snapshot id
            # share a resume key, so the fingerprint wins for those.
            source_snapshot=(
                args.snapshot
                if args.snapshot and not args.snapshot.isdigit()
                else fingerprint
            ),
            resume=args.resume,
        )
        manifest["source_fingerprint"] = fingerprint
        print(json.dumps(manifest))
    else:
        from tfidf_spark.index.builder import load_index
        from tfidf_spark.index.query import bm25_query_terms

        idx = load_index(spark, args.index)
        rows = bm25_query_terms(idx, args.terms.split(), k=args.k).collect()
        print(json.dumps([{"doc_id": r["doc_id"], "score": r["score"]} for r in rows]))


if __name__ == "__main__":
    main()
