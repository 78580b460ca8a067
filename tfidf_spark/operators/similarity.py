"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k against one query vector —
  JVM-side zip_with/aggregate arithmetic, broadcast query, ends in
  TakeOrderedAndProject. O(N) per query; the correctness oracle.
- ``lsh_bucket``: random-hyperplane LSH signatures from DETERMINISTIC
  seeded planes (reproducible across runs/partitionings).
- ``ann_topk_lsh``: the scale path — probe only the query's bucket(s),
  then exact-score within candidates. Work per query drops from O(N) to
  O(N / 2^n_planes) expected.
- ``knn_join_lsh``: all-pairs kNN candidates via bucket join, for
  embedding-cosine near-dup detection.

All cosines are computed in float64 after casting the float32 inputs, in
array order — deterministic and engine-comparable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k (id, cos_r) vs a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = _dot(vec_col, q) / (_norm(vec_col) * _norm(q))
    return (
        emb.select(F.col(id_col), F.round(cos, 6).alias("cos_r"))
        .orderBy(F.desc("cos_r"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket(
    emb: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 13,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``bucket`` column: sign pattern of dot products with seeded
    random hyperplanes. Deterministic: planes derive only from (seed,
    n_planes, dim)."""
    rng = np.random.default_rng([seed, n_planes, dim])
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec_col, p) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit
    return emb.withColumn("bucket", bucket)


def ann_topk_lsh(
    emb_bucketed: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is within
    ``multiprobe_hamming`` bits of the query's bucket (multi-probe LSH
    recovers recall near hyperplane boundaries)."""
    rng = np.random.default_rng([seed, n_planes, dim])
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = sum(1 << i for i, p in enumerate(planes) if float(p @ q) >= 0)
    probes = [qbucket]
    if multiprobe_hamming >= 1:
        probes += [qbucket ^ (1 << i) for i in range(n_planes)]
    cand = emb_bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF "training": the ``n_centroids`` data vectors
    with the smallest md5(seed:vec_id) become the centroids (a seeded
    uniform sample — no iterative k-means, so the partition layout is
    reproducible across engines/runs; a Lloyd refinement would drop the
    determinism the hash gate needs without changing the plan shape).
    Returns [(centroid_id, vector)] for the driver to broadcast; size is
    n_centroids * dim floats — trivially broadcastable."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    rows = (
        emb.select(F.col(id_col), F.col(vec_col))
        .orderBy(h, F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    return [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(rows)]


def ivf_refine_centroids(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_iter: int = 3,
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic spherical-Lloyd refinement of ``ivf_centroids``'s
    seeded sample: a FIXED number of iterations (no data-dependent stop),
    cosine assignment with the same rounded-cosine / larger-cid
    tie-break as ``ivf_assign``, and per-cluster means of L2-normalized
    members re-normalized to unit length (spherical k-means — the right
    Lloyd step under the cosine metric). Empty clusters keep their
    previous centroid. Centroid ids and count are preserved, so the
    output drops into ``ivf_assign``/``ann_topk_ivf`` unchanged, and
    ``nprobe = n_centroids`` remains exactly brute force — the oracle
    anchor is untouched while recall at small nprobe improves (measured
    in test_similarity.py; the sampled-vs-refined recall@20 numbers live
    in BENCH/IVF_RECALL.json).

    Each iteration is one zero-shuffle assignment pass plus one
    groupBy(cid) mean — O(n_centroids * dim) rows out, nothing
    collected but the centroid matrix itself.
    """
    import pandas as pd

    cents = [(int(c), [float(x) for x in v]) for c, v in centroids]
    dim = len(cents[0][1])

    def _mean_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        vm = np.array(pdf[vec_col].to_list(), dtype=np.float64)
        norms = np.sqrt((vm * vm).sum(axis=1))
        norms[norms == 0] = 1.0
        mean = (vm / norms[:, None]).mean(axis=0)
        return pd.DataFrame(
            {"cid": [int(pdf["cid"].iloc[0])], "centroid": [mean.tolist()]}
        )

    for _ in range(n_iter):
        assigned = ivf_assign(emb, cents, vec_col=vec_col)
        rows = (
            assigned.select("cid", vec_col)
            .groupBy("cid")
            .applyInPandas(_mean_kernel, "cid long, centroid array<double>")
            .collect()
        )
        means = {int(r["cid"]): np.asarray(r["centroid"], dtype=np.float64) for r in rows}
        new_cents = []
        for cid, old in cents:
            m = means.get(cid)
            if m is None:
                new_cents.append((cid, old))
                continue
            n = float(np.sqrt((m * m).sum()))
            if n == 0.0:
                new_cents.append((cid, old))
                continue
            new_cents.append((cid, (m / n).tolist()))
        cents = new_cents
    assert all(len(v) == dim for _, v in cents)
    return cents


def ivf_assign(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cid`` column: the centroid with the highest cosine
    (rounded to 6) to each vector; ties -> larger cid (an explicit total
    order). Zero shuffle: a mapInPandas kernel carries the tiny centroid
    matrix in its closure and scores each Arrow batch with ONE BLAS
    matmul — an earlier form built 16 nested zip_with/aggregate literal
    expressions per row, which spent seconds in codegen and evaluated
    k folds per row instead of one (n x dim) @ (dim x k).
    At scale this is the IVF partitioning step: writing the output
    partitioned by cid gives each posting list its own files, so a query
    probing nprobe centroids prunes the scan to nprobe directories."""
    cids = np.array([int(c) for c, _ in centroids], dtype=np.int64)
    cmat = np.array([v for _, v in centroids], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cnorm[cnorm == 0] = 1.0

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf[vec_col].to_list(), dtype=np.float64)
            vnorm = np.sqrt((vm * vm).sum(axis=1))
            vnorm[vnorm == 0] = 1.0
            cos = np.round((vm @ cmat.T) / (vnorm[:, None] * cnorm[None, :]), 6)
            # argmax with larger-cid tie-break: scan reversed cid order
            order = np.argsort(-cids)  # high cid first
            best = order[np.argmax(cos[:, order], axis=1)]
            pdf = pdf.copy()
            pdf["cid"] = cids[best]
            yield pdf

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(list(emb.schema.fields) + [StructField("cid", LongType())])
    return emb.mapInPandas(kernel, out_schema)


def ann_topk_ivf(
    emb_assigned: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: rank centroids by cosine to the query on the driver
    (n_centroids tiny), exact-score only vectors assigned to the nprobe
    nearest centroids. Work per query is O(N * nprobe / n_centroids)
    expected; with cid-partitioned storage the scan itself prunes.
    ``nprobe >= len(centroids)`` degenerates to exact brute force — the
    correctness anchor the oracle checks; recall at small nprobe is the
    approximation knob (tested in test_similarity.py)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum())) or 1.0

    def cos(vec: list[float]) -> float:
        v = np.asarray(vec, dtype=np.float64)
        nv = float(np.sqrt((v * v).sum())) or 1.0
        return float(v @ q) / (nv * qn)

    ranked = sorted(centroids, key=lambda c: (-cos(c[1]), c[0]))
    probes = [cid for cid, _ in ranked[: max(1, nprobe)]]
    cand = emb_assigned.filter(F.col("cid").isin(probes))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def knn_join_lsh(
    emb_bucketed: DataFrame,
    k: int = 1,
    min_cos: float = -1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """(a, b, cos_r): per-vector top-k neighbors among same-bucket
    candidates — embedding-cosine near-dup at bucket-join cost.

    ``max_bucket`` guards hot buckets (e.g. the all-zeros embedding, or a
    hyperplane set that collapses a dense cluster): the self-join is
    quadratic in bucket size, so buckets above the cap are dropped whole
    (their members get no neighbors this pass — route them to exact dedup
    or re-bucket with more planes). The size window partitions on the
    same key as the join, so the exchange is reused."""
    if max_bucket is not None:
        wb = Window.partitionBy("bucket")
        emb_bucketed = emb_bucketed.withColumn(
            "bsz", F.count(F.lit(1)).over(wb)
        ).filter(F.col("bsz") <= max_bucket).drop("bsz")
    a = emb_bucketed.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket"
    )
    b = emb_bucketed.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket"
    )
    pairs = a.join(b, ["bucket"]).filter(F.col("a") != F.col("b"))
    cos = _dot("va", "vb") / (_norm("va") * _norm("vb"))
    scored = pairs.select("a", "b", F.round(cos, 6).alias("cos_r")).filter(
        F.col("cos_r") >= min_cos
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos_r"), F.asc("b"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
