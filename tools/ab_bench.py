"""A/B adjudication of the r5 bench regression (VERDICT r5, task #2).

Round 5's single bench sample showed index_build +32% / batch50 +44% vs
round 4, coinciding with the ``stage_encode`` extraction in
tfidf_spark/index/builder.py. A multiset diff of c9b0a17..HEAD shows that
change is a PURE code move (identical plan: same tkey radix-sort key,
same repartition, same Arrow batch conf — the tkey comment block exists
verbatim in both versions), so the prior is "weather" — but per the
verdict the call must be made by same-session interleaved medians, not
argument.

Protocol (the only A/B that works on this 4x-weather host, see
BENCH/QUERY_MEDIANS.json history): ONE Spark session, the r4-commit
builder module loaded side-by-side with HEAD's, R interleaved rounds
with side order alternating per round; per-round per-side timings for
index_build / batch50 / batch200_join on identical fresh /dev/shm dirs,
plus the shared-code ``bm25_topk`` DataFrame scorer as a weather
control. Also verifies the two builders' term_postings output is
byte-identical (sorted-row sha256), which pins "same plan, same bytes".

Writes BENCH/AB_R4_R5.json and refreshes the AB_R4_R5 marker block in
BENCH/BASELINE.md. EXCLUSIVE: never run concurrently with other Spark
jobs.
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R4_COMMIT = os.environ.get("AB_COMMIT", "c9b0a17")
AB_TAG = os.environ.get("AB_TAG", "AB_R4_R5")


def load_r4_builder(repo_root: str, workdir: str, spark):
    src = subprocess.run(
        ["git", "-C", repo_root, "show", f"{R4_COMMIT}:tfidf_spark/index/builder.py"],
        check=True, capture_output=True, text=True,
    ).stdout
    path = os.path.join(workdir, "builder_r4.py")
    with open(path, "w") as f:
        f.write(src)
    # the mapInPandas kernels are module-level functions of builder_r4;
    # workers unpickle them by reference, so the module must be
    # importable executor-side too
    spark.sparkContext.addPyFile(path)
    spec = importlib.util.spec_from_file_location("builder_r4", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["builder_r4"] = mod
    spec.loader.exec_module(mod)
    return mod


def index_digest(idx_dir: str) -> str:
    """Order-independent sha256 of the encoded posting runs."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(idx_dir, "term_postings"))
    df = tbl.to_pandas().sort_values(["term", "shard"], kind="mergesort")
    h = hashlib.sha256()
    for _, row in df.iterrows():
        h.update(str(row["term"]).encode())
        h.update(int(row["shard"]).to_bytes(4, "little", signed=True))
        for col in df.columns:
            v = row[col]
            if isinstance(v, (bytes, bytearray)):
                h.update(hashlib.sha256(v).digest())
    return h.hexdigest()


def main():
    from tfidf_spark import entrypoints
    from tfidf_spark.index import builder as builder_head
    from tfidf_spark.index.query import bm25_query_index
    from tfidf_spark.session import get_spark
    from tfidf_spark.sources.corpus import reference_queries, synth_corpus, with_doc_id

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("AB_ROUNDS", "5"))
    n_corpus = int(os.environ.get("SPARK_GRAFT_CORPUS_DOCS", "20000"))

    fast = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="tfidf_ab_", dir=fast)

    spark = get_spark(
        app_name="ab-r4-r5", master=f"local[{cpus}]",
        shuffle_partitions=max(4, cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    builder_r4 = load_r4_builder(root, workdir, spark)

    sides = {"r4": builder_r4, "head": builder_head}
    metrics = ["index_build", "batch50", "batch200_join", "bm25_topk_control"]
    samples = {s: {m: [] for m in metrics} for s in sides}

    try:
        corpus = with_doc_id(synth_corpus(spark, n_corpus, partitions=cpus * 2))
        qdf = spark.createDataFrame(
            reference_queries(50), "query_id long, terms array<string>, k int"
        )
        bigdf = spark.createDataFrame(
            reference_queries(200), "query_id long, terms array<string>, k int"
        )

        # warmup (discarded): one full build+query on HEAD
        wdir = f"{workdir}/warm"
        builder_head.build_index(corpus, wdir, n_shards=max(4, cpus // 2))
        bm25_query_index(builder_head.load_index(spark, wdir), qdf).count()
        shutil.rmtree(wdir, ignore_errors=True)

        digests = {}
        for r in range(rounds):
            order = ["r4", "head"] if r % 2 == 0 else ["head", "r4"]
            for side in order:
                mod = sides[side]
                idx_dir = f"{workdir}/{side}_{r}/idx"
                t0 = time.perf_counter()
                mod.build_index(corpus, idx_dir, n_shards=max(4, cpus // 2))
                samples[side]["index_build"].append(time.perf_counter() - t0)

                idx = mod.load_index(spark, idx_dir)
                t0 = time.perf_counter()
                bm25_query_index(idx, qdf).count()
                samples[side]["batch50"].append(time.perf_counter() - t0)

                t0 = time.perf_counter()
                bm25_query_index(idx, bigdf, prune_by_collect=False).count()
                samples[side]["batch200_join"].append(time.perf_counter() - t0)

                t0 = time.perf_counter()
                entrypoints.QUERIES["bm25_topk"](spark, sf_dir).collect()
                samples[side]["bm25_topk_control"].append(time.perf_counter() - t0)

                if r == rounds - 1:
                    digests[side] = index_digest(idx_dir)
                shutil.rmtree(f"{workdir}/{side}_{r}", ignore_errors=True)
            done = {s: {m: round(samples[s][m][-1], 2) for m in metrics} for s in order}
            print(f"round {r}: {json.dumps(done)}", flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()

    stats = {
        s: {
            m: {
                "median": round(statistics.median(v), 3),
                "min": round(min(v), 3),
                "max": round(max(v), 3),
                "samples": [round(x, 3) for x in v],
            }
            for m, v in per.items()
        }
        for s, per in samples.items()
    }
    ratios = {
        m: round(stats["head"][m]["median"] / stats["r4"][m]["median"], 3)
        for m in metrics
    }
    out = {
        "r4_commit": R4_COMMIT,
        "cpus": cpus,
        "rounds": rounds,
        "corpus_docs": n_corpus,
        "sides": stats,
        "head_over_r4_median_ratio": ratios,
        "index_bytes_identical": digests.get("r4") == digests.get("head"),
        "index_digests": digests,
    }
    os.makedirs(os.path.join(root, "BENCH"), exist_ok=True)
    with open(os.path.join(root, "BENCH", AB_TAG + ".json"), "w") as f:
        json.dump(out, f, indent=2)

    begin, end = f"<!-- {AB_TAG} -->", f"<!-- /{AB_TAG} -->"
    lines = [
        begin, "",
        f"## {AB_TAG}: builder A/B vs {R4_COMMIT} ({rounds} interleaved rounds, local[{cpus}], "
        f"{n_corpus} docs, alternating order, one session)",
        "",
        "Adjudicates VERDICT r5's +32% index_build / +44% batch50 sample drift.",
        "The r5 builder diff is a pure `stage_encode` extraction (multiset-",
        "identical statements; the tkey radix-sort predates r5). Evidence:",
        "",
        "| metric | r4 median (s) | head median (s) | head/r4 |",
        "|---|---|---|---|",
    ]
    for m in metrics:
        lines.append(
            f"| {m} | {stats['r4'][m]['median']} | {stats['head'][m]['median']} "
            f"| {ratios[m]} |"
        )
    lines += [
        "",
        f"term_postings bytes identical across builders: "
        f"**{out['index_bytes_identical']}**",
        "", end,
    ]
    block = "\n".join(lines)
    bl_path = os.path.join(root, "BENCH", "BASELINE.md")
    text = open(bl_path).read() if os.path.exists(bl_path) else ""
    if begin in text and end in text:
        text = text[: text.index(begin)] + block + text[text.index(end) + len(end):]
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(bl_path, "w") as f:
        f.write(text)
    print(json.dumps({"ratios": ratios, "identical": out["index_bytes_identical"]}))


if __name__ == "__main__":
    main()
