"""Per-query median benchmarking (round-2 verdict: single bench samples
on this 4x-weather host cannot distinguish a regression from noise).

Runs each headline query R times INTERLEAVED (q1..qn, repeated R times)
so host-weather minutes spread across queries rather than biasing one,
and reports median/min/max per query. Also times the LEGACY exploded
SimHash shape (60 bit-rows per posting through two shuffles) against the
current single-shuffle form, settling the round-2 "+72%?" question with
medians instead of one sample.

Writes BENCH/QUERY_MEDIANS.json and refreshes the marker-delimited
section in BENCH/BASELINE.md.

EXCLUSIVE: never run while another Spark job is benchmarking.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tfidf_spark import entrypoints

QUERIES = [
    "bm25_topk", "tfidf_topk", "collection_stats", "minhash_lsh_pairs",
    "simhash", "ann_cosine_topk", "revenue_topk",
    "clicks_asof_purchase", "events_range_join", "kmv_distinct_terms",
    "ann_ivf_topk",
]


def simhash_exploded(postings, bits: int = 60):
    """LEGACY shape kept ONLY for adjudication: explode one row per
    (posting, bit) -> groupBy (doc_id, bit) -> second groupBy doc_id.
    60x the postings through the first shuffle."""
    p = postings.withColumn(
        "h", F.expr("cast(conv(substring(md5(term), 1, 15), 16, 10) as bigint)")
    )
    bit = p.select(
        "doc_id", "cnt", "h", F.explode(F.array(*[F.lit(i) for i in range(bits)])).alias("b")
    )
    per_bit = bit.groupBy("doc_id", "b").agg(
        F.sum(
            F.when(F.expr("(shiftright(h, b) & 1) = 1"), F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias("s")
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), b)")).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def main():
    from tfidf_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("MEDIAN_ROUNDS", "5"))

    spark = get_spark(
        app_name="query-medians", master=f"local[{cpus}]",
        shuffle_partitions=max(4, cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def _postings():
        return entrypoints._doc_postings(spark, sf_dir).select("doc_id", "term", "cnt")

    runners = {name: (lambda n=name: entrypoints.QUERIES[n](spark, sf_dir)) for name in QUERIES}
    runners["simhash_exploded_LEGACY"] = lambda: simhash_exploded(_postings())

    # warmup
    entrypoints.QUERIES["term_df"](spark, sf_dir).collect()
    samples: dict[str, list[float]] = {k: [] for k in runners}
    for r in range(rounds):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            fn().collect()
            samples[name].append(round(time.perf_counter() - t0, 3))
        print(f"round {r}: " + json.dumps({k: v[-1] for k, v in samples.items()}), flush=True)

    stats = {
        k: {
            "median": round(statistics.median(v), 3),
            "min": min(v),
            "max": max(v),
            "samples": v,
        }
        for k, v in samples.items()
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {
        "sf_dir": sf_dir, "cpus": cpus, "rounds": rounds, "queries": stats,
    }
    os.makedirs(os.path.join(root, "BENCH"), exist_ok=True)
    with open(os.path.join(root, "BENCH", "QUERY_MEDIANS.json"), "w") as f:
        json.dump(out, f, indent=2)

    # refresh the marker-delimited section in BENCH/BASELINE.md
    begin, end = "<!-- QUERY_MEDIANS -->", "<!-- /QUERY_MEDIANS -->"
    lines = [
        begin,
        "",
        f"## Per-query medians ({rounds} interleaved rounds, local[{cpus}], {sf_dir})",
        "",
        "Single bench samples on this host are weather (swings up to 4x);",
        "per-query regressions are adjudicated on interleaved-round medians.",
        "`simhash_exploded_LEGACY` is the rejected 60x-explode shape, timed",
        "here head-to-head against the current single-shuffle `simhash`.",
        "",
        "| query | median (s) | min | max |",
        "|---|---|---|---|",
    ]
    for k in sorted(stats):
        s = stats[k]
        lines.append(f"| {k} | {s['median']} | {s['min']} | {s['max']} |")
    lines += ["", end]
    block = "\n".join(lines)
    bl_path = os.path.join(root, "BENCH", "BASELINE.md")
    text = open(bl_path).read() if os.path.exists(bl_path) else ""
    if begin in text and end in text:
        pre = text[: text.index(begin)]
        post = text[text.index(end) + len(end):]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(bl_path, "w") as f:
        f.write(text)
    print(json.dumps({k: v["median"] for k, v in stats.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
