"""Distinct-count sketching (driver brief: "a novel sketch" as a custom
operator; SURVEY.md §2.4's counting aggregates at cardinalities where
exact COUNT(DISTINCT) is a full shuffle of the key universe).

KMV (K-Minimum-Values) estimator: hash every value to a uniform fraction
in [0,1); keep the k smallest DISTINCT fractions; if the k-th smallest is
m, the estimate is (k-1)/m (Beyer et al., "On Synopses for Distinct-Value
Estimation Under Multiset Operations", SIGMOD'07). Standard error is
~1/sqrt(k-2) — k=256 gives ~6%.

Why KMV here instead of Spark's built-in HLL (approx_count_distinct):

- DETERMINISTIC and engine-portable: the hash is md5, the fraction is a
  division by 2^60 (exact binary scaling), and the sketch is an order
  statistic — every engine computes the identical estimate, so the
  driver's value-hash gate can check it against DuckDB exactly. HLL
  register layouts are engine-private.
- MERGEABLE: union of sketches = k smallest of the union of fractions.
  Spark's TakeOrderedAndProject computes exactly that — each partition
  emits its local k smallest, the merge keeps the global k smallest —
  i.e. the distributed plan IS the sketch merge, nothing custom to ship.

Scale note: the distinct() below shuffles one row per DISTINCT value
(bounded by the key universe — the term vocabulary here, not the corpus).
At cardinalities where even that is too big, drop distinct() and keep
per-partition k-minima of raw values: duplicates can then displace true
minima only within one partition's local top-k, a bias bounded by the
duplicate rate; the exact form is kept because the hash gate needs a
reproducible number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 2^60: the fraction's denominator. 15 hex chars = 60 bits, fits a signed
# int64; dividing by a power of two is exact in binary floating point, so
# Spark and DuckDB produce bit-identical fractions.
_TWO_60 = float(1 << 60)


def hash_fraction(col) -> F.Column:
    """Uniform [0,1) fraction from md5 of the (string) column — the same
    expression DuckDB evaluates as
    ``('0x' || substr(md5(x),1,15))::BIGINT / 2^60``.

    Built with Column functions (not f-string SQL) so arbitrary column
    names — including ones containing backticks/dots — cannot inject
    into the expression.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c), 1, 15), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(_TWO_60)
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame: ``(k, n_kept, kth_frac_r, est_distinct_r)``.

    ``n_kept`` < k means the universe is smaller than the sketch — the
    estimate is then the exact count ``n_kept`` (the standard KMV small-
    cardinality case). ``kth_frac_r``/``est_distinct_r`` are rounded to
    6/2 decimals for engine-portable hashing.
    """
    kept = (
        # NULLs must not enter the sketch: NULL md5 -> NULL fraction,
        # which Spark's ascending orderBy sorts FIRST (consuming top-k
        # slots) while DuckDB sorts it LAST — engines would diverge.
        df.where(F.col(col).isNotNull() if isinstance(col, str) else col.isNotNull())
        .select(hash_fraction(col).alias("hf"))
        .distinct()
        .orderBy("hf")  # TakeOrderedAndProject: per-partition k-minima, merged
        .limit(k)
    )
    return kept.agg(
        F.lit(k).cast("long").alias("k"),
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.max("hf"), 6).alias("kth_frac_r"),
        F.round(
            F.when(
                F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
            ).otherwise((F.lit(k) - F.lit(1)).cast("double") / F.max("hf")),
            2,
        ).alias("est_distinct_r"),
    )
