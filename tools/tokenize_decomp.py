"""Per-phase decomposition of the tokenize stage's N->4N scaling
(VERDICT r6 task #1, the "committed decomposition" arm).

Seven runs of tools/stage_scaling.py put the FULL tokenize stage
(builder.stage_postings: parquet scan -> Arrow tokenize-count kernel ->
marker-concat explode -> partitioned parquet write) at 0.47-0.78 2->8
pinned-core efficiency while the kernel ALONE measured 0.865 — so the
loss sits in the stage's non-kernel phases, or in the host. This tool
attributes it: the same corpus runs four CUMULATIVE plans at both
parallelism levels, inside one adjacent-ratio round so both levels see
the same minute of host weather:

  scan         docs.agg(sum(length(content)))      parquet scan only
                 (forces full text-column IO, no Python)
  kernel       scan + tokenize-count Arrow UDF, result reduced to
                 sum(size(term_counts)) — no explode, no write
  explode      kernel + marker-concat explode, reduced to count(1)
  write(=full) builder.stage_postings verbatim (adds the partitionBy
                 ("sec") parquet write)

Phase walls are consecutive differences; per-phase efficiency uses the
adjacent-ratio estimator (wall_2c / (4 * wall_8c), median over rounds).
Steady-state sampling per tools/stage_scaling.py r5: tiny warm + one
discarded cold full pass + best of 2 timed.

ALU + bandwidth ceilings are probed per round with the same instruments
as stage_scaling; the report states, per phase, whether its efficiency
clears the round's tightest ceiling — the "residual is host" criterion.

Usage: python -u tools/tokenize_decomp.py          (~12-18 min, EXCLUSIVE
       — never run other Spark jobs concurrently)
  DECOMP_DOCS=400000 DECOMP_ROUNDS=3 to override.

Writes BENCH/TOKENIZE_DECOMP.json (run history, never overwritten).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("DECOMP_DOCS", "400000"))
ROUNDS = int(os.environ.get("DECOMP_ROUNDS", "3"))
LEVELS = (2, 8)
PLANS = ("scan", "kernel", "explode", "write")
_FAST_TMP = "/dev/shm" if os.path.isdir("/dev/shm") else None


def child(cpus: int, corpus_dir: str) -> None:
    from pyspark.sql import functions as F

    from tfidf_spark.index.builder import stage_postings
    from tfidf_spark.operators.postings import with_term_counts
    from tools.stage_scaling import _dir_bytes, _session

    spark = _session(cpus, _dir_bytes(corpus_dir), f"decomp-{cpus}")
    out = tempfile.mkdtemp(prefix=f"decomp{cpus}_", dir=_FAST_TMP)
    docs = spark.read.parquet(corpus_dir)

    def plan_scan():
        docs.agg(F.sum(F.length("content"))).collect()

    def plan_kernel():
        with_term_counts(docs, "content", False).agg(
            F.sum(F.size("term_counts"))
        ).collect()

    def plan_explode():
        counted = with_term_counts(docs, "content", False)
        marker = F.array(
            F.struct(
                F.lit(None).cast("string").alias("key"),
                F.size("term_counts").alias("value"),
            )
        )
        entries = F.concat(marker, F.map_entries("term_counts"))
        counted.select(
            F.col("doc_id"),
            F.explode(entries).alias("e"),
            F.col("dl"),
            F.spark_partition_id().alias("part_id"),
        ).select(
            "doc_id",
            F.col("e.key").alias("term"),
            F.col("e.value").alias("cnt"),
            "dl",
            "part_id",
        ).agg(F.count(F.lit(1))).collect()

    def plan_write():
        stage_postings(docs, out)

    plans = {
        "scan": plan_scan,
        "kernel": plan_kernel,
        "explode": plan_explode,
        "write": plan_write,
    }
    try:
        # warm every task slot's Python worker + codegen
        stage_postings(docs.limit(400 * cpus).repartition(cpus * 2), out)
        walls: dict[str, float] = {}
        colds: dict[str, float] = {}
        for name in PLANS:
            run = plans[name]
            t0 = time.perf_counter()
            run()  # cold pass: JIT/heap growth, discarded but recorded
            colds[name] = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            walls[name] = best
        print(
            "CHILD_RESULT "
            + json.dumps(
                {
                    "cpus": cpus,
                    "walls": {k: round(v, 3) for k, v in walls.items()},
                    "cold_walls": {k: round(v, 3) for k, v in colds.items()},
                }
            )
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def _run_child(cpus: int, corpus_dir: str) -> dict:
    proc = subprocess.Popen(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, __file__,
         "--child", str(cpus), corpus_dir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    out, err = proc.communicate(timeout=3600)
    lines = [l for l in out.splitlines() if l.startswith("CHILD_RESULT ")]
    if not lines:
        print(out[-2000:], err[-2000:])
        raise RuntimeError(f"decomp child @{cpus} failed")
    return json.loads(lines[-1][len("CHILD_RESULT "):])


def orchestrate() -> None:
    from tfidf_spark.session import get_spark
    from tfidf_spark.sources.corpus import synth_corpus, with_doc_id
    from tools.scaling_bench import calibrate_paired
    from tools.stage_scaling import calibrate_bandwidth

    corpus_dir = tempfile.mkdtemp(prefix="decompcorpus_", dir=_FAST_TMP)
    spark = get_spark(app_name="decomp-prep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    with_doc_id(synth_corpus(spark, N_DOCS, partitions=256)).write.mode(
        "overwrite"
    ).parquet(corpus_dir)
    spark.stop()

    rounds = []
    try:
        for rnd in range(ROUNDS):
            alu = calibrate_paired("0-1", LEVELS[0], "8-15", LEVELS[1])
            bw = calibrate_bandwidth("0-1", LEVELS[0], "8-15", LEVELS[1])
            print(f"round {rnd} ALU ceiling {alu:.3f} BW ceiling {bw:.3f}",
                  flush=True)
            order = LEVELS if rnd % 2 == 0 else tuple(reversed(LEVELS))
            res = {}
            for cpus in order:
                res[cpus] = _run_child(cpus, corpus_dir)
            # cumulative walls -> per-phase deltas (floor at 0: adjacent
            # plans can reorder within noise on tiny phases)
            deltas = {c: {} for c in LEVELS}
            for c in LEVELS:
                w = res[c]["walls"]
                prev = 0.0
                for name in PLANS:
                    deltas[c][name] = max(0.0, w[name] - prev)
                    prev = w[name]
            eff = {}
            for name in PLANS:
                lo, hi = deltas[LEVELS[0]][name], deltas[LEVELS[1]][name]
                eff[name] = round(lo / (4 * hi), 4) if hi > 0.05 else None
            cum_eff = {
                name: round(
                    res[LEVELS[0]]["walls"][name]
                    / (4 * res[LEVELS[1]]["walls"][name]),
                    4,
                )
                for name in PLANS
            }
            rounds.append(
                {
                    "alu_ceiling": round(alu, 4),
                    "bw_ceiling": round(bw, 4),
                    "walls": {c: res[c]["walls"] for c in LEVELS},
                    "cold_walls": {c: res[c]["cold_walls"] for c in LEVELS},
                    "phase_deltas": deltas,
                    "phase_eff": eff,
                    "cumulative_eff": cum_eff,
                }
            )
            print(f"round {rnd} cumulative eff: {cum_eff}  phase eff: {eff}",
                  flush=True)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        if _FAST_TMP:
            for d in os.listdir(_FAST_TMP):
                if d.startswith("spark-local-st"):
                    shutil.rmtree(os.path.join(_FAST_TMP, d),
                                  ignore_errors=True)

    def med(key, name):
        vals = [r[key][name] for r in rounds if r[key].get(name) is not None]
        return round(statistics.median(vals), 4) if vals else None

    run = {
        "n_docs": N_DOCS,
        "rounds": ROUNDS,
        "levels": LEVELS,
        "plans": list(PLANS),
        "round_data": rounds,
        "median_phase_eff": {n: med("phase_eff", n) for n in PLANS},
        "median_cumulative_eff": {n: med("cumulative_eff", n) for n in PLANS},
        "median_alu_ceiling": round(
            statistics.median([r["alu_ceiling"] for r in rounds]), 4
        ),
        "median_bw_ceiling": round(
            statistics.median([r["bw_ceiling"] for r in rounds]), 4
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    try:
        with open("BENCH/TOKENIZE_DECOMP.json") as f:
            doc = json.load(f)
        runs = doc.get("runs", [])
    except (OSError, json.JSONDecodeError):
        runs = []
    runs.append(run)
    with open("BENCH/TOKENIZE_DECOMP.json", "w") as f:
        json.dump({"runs": runs}, f, indent=2)
    print(json.dumps({k: run[k] for k in (
        "median_phase_eff", "median_cumulative_eff",
        "median_alu_ceiling", "median_bw_ceiling")}, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), sys.argv[3])
    else:
        orchestrate()
