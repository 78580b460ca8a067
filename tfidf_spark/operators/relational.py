"""Relational operators Spark lacks natively, re-expressed as scale-safe
DataFrame compositions (driver brief: "when the reference has an operator
Spark lacks (e.g., as-of join, range join), implement it as a composition
of existing DataFrame ops").

- ``asof_join``: most-recent-match join (each left row picks the right
  row with the greatest timestamp <= its own). The naive form is a
  non-equi theta join — BroadcastNestedLoopJoin, quadratic per key. This
  form is the classic union + window carry-forward: tag both sides, sort
  each key's timeline once, and carry the latest right payload forward.
  ONE shuffle of |L|+|R| rows, linear work, no nested loop.

- ``range_join_buckets``: point-in-interval join. The naive form is a
  theta join again; this form buckets the number line: each point lands
  in exactly one bucket of width ``bucket_width``; each interval explodes
  to the few buckets it overlaps. An equi shuffle join on (keys, bucket)
  then exact-filters the range predicate. Every qualifying (point,
  interval) pair meets in exactly ONE bucket — the point's — so no
  dedup is needed. Work scales with overlap density, not |L|x|R|.

Both are deterministic: ties are broken by an explicit tie-break column,
so results are hash-comparable against an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tie_break: str,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``on`` key
    (backward as-of, inclusive). Among right rows tied on ``right_ts``,
    the greatest ``tie_break`` wins — an explicit total order, because
    an as-of join without one is nondeterministic under ties.

    Returns all left columns plus the right payload columns (null when
    no right row precedes the left row — left-outer as-of semantics;
    filter payload non-null for inner).

    Plan: unionByName -> ONE Window shuffle on ``on`` -> filter. The
    window's sort is per-key within a hash partition, so skewed keys cost
    what a skewed window costs — salting the window key is the standard
    escape, not a different algorithm.
    """
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.col(tie_break).alias("_tb"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_p"),
        F.lit(0).alias("_src"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.lit(1).alias("_src"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    u = r.withColumn("_lrow", F.lit(None).cast(l.schema["_lrow"].dataType)).unionByName(l)
    # right rows sort BEFORE left rows at the same timestamp (_src 0 < 1),
    # so an equal-timestamp right row is visible to the left row
    # (inclusive <=); ties among right rows resolve by _tb asc, making
    # last() the max-tie-break row.
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_src").asc(), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_asof", F.last("_p", ignorenulls=True).over(w))
    out = carried.filter(F.col("_src") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_asof")[c].alias(f"asof_{c}") for c in right_payload],
    )
    return out


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    equi_keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of point rows to interval rows where
    ``lo <= point < hi`` (half-open), optionally also matching on
    ``equi_keys``. ``point_col``/``lo_col``/``hi_col`` must be numeric
    (cast timestamps to epoch seconds first).

    Each interval explodes to ceil(len/bucket_width)+1 bucket rows; pick
    ``bucket_width`` near the typical interval length so the explode
    factor stays ~2. The join itself is a plain equi shuffle join on
    (equi_keys, bucket) — broadcastable when one side is small, AQE-skew-
    splittable when a bucket is hot — and the exact range predicate runs
    as a post-join filter.
    """
    keys = list(equi_keys or [])
    w = int(bucket_width)
    p = points.withColumn(
        "_bucket", F.floor(F.col(point_col) / F.lit(w)).cast("long")
    )
    # empty intervals (hi <= lo) match nothing; dropping them up front
    # also keeps sequence() ascending (start > stop would silently
    # generate a DESCENDING bucket sequence)
    iv = intervals.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
                # last bucket holding any point < hi is ceil(hi/w) - 1:
                # exact for integer AND fractional coordinates (a
                # floor((hi-1)/w) form would drop e.g. point 10.4 in
                # [0, 10.5) at width 5), and never below the lo bucket
                # for a non-empty interval, so the sequence is ascending
                (F.ceil(F.col(hi_col) / F.lit(w)) - F.lit(1)).cast("long"),
            )
        ),
    )
    joined = p.join(iv, keys + ["_bucket"]).filter(
        (F.col(lo_col) <= F.col(point_col)) & (F.col(point_col) < F.col(hi_col))
    )
    return joined.drop("_bucket")
