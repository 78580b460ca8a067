"""Multi-segment query overhead bench (VERDICT r3 #6).

The segment-carrying incremental index is correctness-tested
(test_incremental.py) but its query cost was never measured. This tool
builds the SAME deterministic corpus two ways —

  single : one build_index over all docs (1 segment)
  chained: build_index over the first quarter + three compact_index
           merges (4 segments, the shape a daily-merge deployment
           reaches between major compactions)

— asserts rank-identity between them (pinned avgdl), then runs the
batch-50 BM25 query set over both in INTERLEAVED passes (single,
chained, single, chained, ...) and reports per-target medians plus the
chained/single overhead ratio into BENCH/SEGMENT_OVERHEAD.json.
Interleaving is mandatory on this host: sequential A/B absorbs up to 4x
weather into whichever target runs second (BENCH/BASELINE.md).

Usage: python -u tools/segment_bench.py [n_docs] [passes]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tfidf_spark.index.builder import build_index, load_index
from tfidf_spark.index.incremental import compact_index
from tfidf_spark.index.query import bm25_query_index
from tfidf_spark.session import get_spark
from tfidf_spark.sources.corpus import reference_queries, synth_corpus, with_doc_id


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark(
        app_name="segment-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(4, cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="segbench_", dir=fast)
    try:
        corpus = with_doc_id(
            synth_corpus(spark, n_docs, partitions=cpus * 2)
        ).cache()
        corpus.count()

        single_dir = f"{work}/single"
        build_index(corpus, single_dir, n_shards=max(4, cpus // 2))
        single = load_index(spark, single_dir)

        # chained: quarter 0 is the base; quarters 1-3 merge in, with
        # avgdl pinned to the base (force past the drift guard — the
        # quarters share one distribution, drift is noise-level)
        base_avgdl = None
        prev_dir = None
        for q in range(4):
            # pmod, not %: doc_ids are xxhash64 (often negative) and
            # Spark's % keeps the dividend's sign — % 4 == q would drop
            # every negative id for q in 1..3
            part = corpus.filter(F.pmod(F.col("doc_id"), F.lit(4)) == q)
            out = f"{work}/chain_{q}"
            if q == 0:
                build_index(part, out, n_shards=max(4, cpus // 2))
                base_avgdl = load_index(spark, out).avgdl
            else:
                compact_index(
                    load_index(spark, prev_dir), part, out, force=True
                )
            prev_dir = out
        chained = load_index(spark, prev_dir)
        n_segs = len(chained.segment_paths("term_postings"))
        assert n_segs == 4, n_segs

        # rank-identity sanity: a chained index with pinned-avgdl weights
        # differs from the single build only by avgdl; rebuild single
        # with the pin for an apples-to-apples identity check
        pinned_dir = f"{work}/single_pinned"
        build_index(
            corpus, pinned_dir, n_shards=max(4, cpus // 2),
            avgdl_override=base_avgdl,
        )
        pinned = load_index(spark, pinned_dir)
        qset = reference_queries(50)
        qdf = spark.createDataFrame(
            qset, "query_id long, terms array<string>, k int"
        ).cache()
        qdf.count()

        def results(idx):
            return sorted(
                (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
                for r in bm25_query_index(idx, qdf).collect()
            )

        assert results(chained) == results(pinned), "chained != single ranks"

        samples = {"single": [], "chained": []}
        # warm both paths once before timing
        bm25_query_index(single, qdf).count()
        bm25_query_index(chained, qdf).count()
        for _ in range(passes):
            for name, idx in (("single", single), ("chained", chained)):
                t0 = time.perf_counter()
                bm25_query_index(idx, qdf).count()
                samples[name].append(time.perf_counter() - t0)

        med = {k: round(statistics.median(v), 3) for k, v in samples.items()}
        out = {
            "n_docs": n_docs,
            "cpus": cpus,
            "passes": passes,
            "segments_chained": n_segs,
            "batch50_sec": med,
            "samples": {k: [round(x, 3) for x in v] for k, v in samples.items()},
            "overhead_ratio": round(med["chained"] / med["single"], 3),
            "protocol": "interleaved medians, warmed, rank-identity asserted",
        }
        print(json.dumps(out))
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/SEGMENT_OVERHEAD.json", "w") as f:
            json.dump(out, f, indent=2)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
