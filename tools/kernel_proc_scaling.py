"""Pure-kernel 2->8 process scaling — the Spark-free control arm of the
tokenize decomposition (VERDICT r6 task #1).

tools/tokenize_decomp.py attributes the tokenize stage's scaling loss
to phases INSIDE Spark (parquet scan 0.65-0.72, in-stage Arrow kernel
0.75-0.90 even under nominal ALU ceilings ~1.01). This tool closes the
attribution by running the SAME production kernel with no Spark at all:
``_tokenize_series`` + ``Counter`` (the exact body of
``tokenize_counts_udf``, functions/tokenize.py:96) over the same
synthetic corpus, as N taskset-pinned CONCURRENT worker processes with
a start barrier, strong scaling (fixed corpus split N ways), at N=2 and
N=8, adjacent rounds with the same ALU + memory-bandwidth ceiling
instruments as tools/stage_scaling.py.

If this number clears the ceiling while the in-Spark phases do not, the
residual stage loss lives in the Spark integration path (JVM parquet
scan + Arrow IPC + Python worker pipe) and the shared memory hierarchy
those components stress — not in the engine's kernel. Measured
2026-08-18 session: 0.89-0.97 across rounds.

Usage: python -u tools/kernel_proc_scaling.py        (~4-6 min, EXCLUSIVE)
  KPS_DOCS=400000 KPS_ROUNDS=3 to override.
Writes BENCH/KERNEL_PROC_SCALING.json (run history, appended).
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
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("KPS_DOCS", "400000"))
ROUNDS = int(os.environ.get("KPS_ROUNDS", "3"))
LEVELS = (2, 8)
N_FILES = 16  # lcm-friendly: 8 files/proc at N=2, 2 files/proc at N=8
BATCH = 4096  # mimic the Arrow batch shape the UDF iterator sees
_FAST_TMP = "/dev/shm" if os.path.isdir("/dev/shm") else None


def child(files_csv: str) -> None:
    import pandas as pd
    import pyarrow.parquet as pq

    from tfidf_spark.functions.tokenize import _tokenize_series

    frames = [
        pq.read_table(p, columns=["content"]).to_pandas()
        for p in files_csv.split(",")
    ]
    content = pd.concat(frames, ignore_index=True)["content"]

    def one_pass(s: pd.Series) -> int:
        total = 0
        for i in range(0, len(s), BATCH):
            chunk = s.iloc[i : i + BATCH]
            toks = _tokenize_series(chunk, False)
            counts = toks.map(lambda ts: dict(Counter(ts)))
            total += int(counts.map(len).sum())
        return total

    one_pass(content.iloc[: 4 * BATCH])  # warm: regex cache, allocator
    print("READY", flush=True)
    sys.stdin.readline()  # barrier: all siblings warmed before anyone times
    best, total = float("inf"), 0
    for _ in range(2):
        t0 = time.perf_counter()
        total = one_pass(content)
        best = min(best, time.perf_counter() - t0)
    print(f"CHILD_RESULT {json.dumps({'wall': round(best, 3), 'terms': total})}",
          flush=True)


def _run_level(nproc: int, files: list[str]) -> dict:
    per = len(files) // nproc
    procs = []
    for k in range(nproc):
        mine = ",".join(files[k * per : (k + 1) * per])
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(k), sys.executable, __file__,
                 "--child", mine],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
            )
        )
    for p in procs:  # wait for every READY, then release the barrier
        if p.stdout.readline().strip() != "READY":
            raise RuntimeError("kernel child failed before barrier")
    for p in procs:
        p.stdin.write("GO\n")
        p.stdin.flush()
    walls, terms = [], 0
    for p in procs:
        out, err = p.communicate(timeout=1200)
        lines = [l for l in out.splitlines() if l.startswith("CHILD_RESULT ")]
        if not lines:
            print(out[-1000:], err[-1000:])
            raise RuntimeError(f"kernel child @{nproc} failed")
        r = json.loads(lines[-1][len("CHILD_RESULT "):])
        walls.append(r["wall"])
        terms += r["terms"]
    return {"wall": max(walls), "walls": walls, "terms": terms}


def orchestrate() -> None:
    from tfidf_spark.session import get_spark
    from tfidf_spark.sources.corpus import synth_corpus, with_doc_id
    from tools.scaling_bench import calibrate_paired
    from tools.stage_scaling import calibrate_bandwidth

    corpus_dir = tempfile.mkdtemp(prefix="kpscorpus_", dir=_FAST_TMP)
    spark = get_spark(app_name="kps-prep", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    with_doc_id(synth_corpus(spark, N_DOCS, partitions=256)).repartition(
        N_FILES
    ).write.mode("overwrite").parquet(corpus_dir)
    spark.stop()
    files = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir)
        if f.endswith(".parquet")
    )

    rounds = []
    try:
        for rnd in range(ROUNDS):
            alu = calibrate_paired("0-1", LEVELS[0], "8-15", LEVELS[1])
            bw = calibrate_bandwidth("0-1", LEVELS[0], "8-15", LEVELS[1])
            order = LEVELS if rnd % 2 == 0 else tuple(reversed(LEVELS))
            res = {c: _run_level(c, files) for c in order}
            lo, hi = res[LEVELS[0]], res[LEVELS[1]]
            assert lo["terms"] == hi["terms"], "levels disagree on output"
            eff = round(lo["wall"] / (4 * hi["wall"]), 4)
            rounds.append(
                {
                    "alu_ceiling": round(alu, 4),
                    "bw_ceiling": round(bw, 4),
                    "wall_2": lo["wall"],
                    "wall_8": hi["wall"],
                    "per_proc_walls": {c: res[c]["walls"] for c in LEVELS},
                    "eff": eff,
                }
            )
            print(
                f"round {rnd} ALU {alu:.3f} BW {bw:.3f} "
                f"wall2 {lo['wall']:.2f} wall8 {hi['wall']:.2f} eff {eff}",
                flush=True,
            )
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)

    run = {
        "n_docs": N_DOCS,
        "rounds": ROUNDS,
        "levels": LEVELS,
        "kernel": "_tokenize_series + Counter (tokenize_counts_udf body)",
        "round_data": rounds,
        "median_eff": round(statistics.median(r["eff"] for r in rounds), 4),
        "median_alu_ceiling": round(
            statistics.median(r["alu_ceiling"] for r in rounds), 4
        ),
        "median_bw_ceiling": round(
            statistics.median(r["bw_ceiling"] for r in rounds), 4
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    try:
        with open("BENCH/KERNEL_PROC_SCALING.json") as f:
            runs = json.load(f).get("runs", [])
    except (OSError, json.JSONDecodeError):
        runs = []
    runs.append(run)
    with open("BENCH/KERNEL_PROC_SCALING.json", "w") as f:
        json.dump({"runs": runs}, f, indent=2)
    print(json.dumps({k: run[k] for k in (
        "median_eff", "median_alu_ceiling", "median_bw_ceiling")}, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2])
    else:
        orchestrate()
