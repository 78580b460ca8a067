"""Corpus source abstraction: parquet paths now, Iceberg tables when a
catalog is configured.

The engine targets an Iceberg table ``(repo, path, commit, lang,
content)`` (BASELINE.json input_hint). This container ships no Iceberg
runtime jar, so the sandbox path is parquet; the loader keeps call sites
format-agnostic and adds the Iceberg behaviors that matter to the build
(snapshot pinning for resume fingerprints, predicate-pruned scans) at the
one place they belong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an iceberg-spark-runtime jar is actually loadable.

    NOTE: ``spark._jvm.org.apache.iceberg.Table`` is NOT a valid probe —
    py4j resolves unknown dotted names to lazy JavaPackage objects and
    never raises. Ask the driver's context classloader (which includes
    --jars / spark.jars.packages) to load the class for real."""
    try:
        loader = spark._jvm.java.lang.Thread.currentThread().getContextClassLoader()
        loader.loadClass("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def load_corpus(
    spark: SparkSession,
    source: str,
    fmt: str = "auto",
    snapshot_id: int | None = None,
) -> tuple[DataFrame, str]:
    """Load the corpus; returns (df, fingerprint).

    fmt: 'parquet' | 'iceberg' | 'auto' (iceberg when `source` has no
    path separator and a catalog resolves it). The fingerprint feeds
    build_index(source_snapshot=...): Iceberg's snapshot id when pinned,
    else the source string (parquet dirs are assumed immutable-per-path —
    version the path, as every lakehouse layout does).
    """
    if fmt == "auto":
        fmt = "iceberg" if ("/" not in source and iceberg_available(spark)) else "parquet"
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg requested but no iceberg-spark-runtime jar is on "
                "the session classpath (pass --jars / spark.jars.packages "
                "org.apache.iceberg:iceberg-spark-runtime-*). This sandbox "
                "ships no such jar; use fmt='parquet' with versioned paths."
            )
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(source)
        fp = f"iceberg:{source}@{snapshot_id if snapshot_id is not None else 'current'}"
        return df, fp
    return spark.read.parquet(source), f"parquet:{source}"


def write_table(df: DataFrame, target: str, fmt: str = "parquet") -> None:
    """Append-free overwrite write; Iceberg when requested and available."""
    if fmt == "iceberg":
        df.writeTo(target).createOrReplace()
    else:
        df.write.mode("overwrite").parquet(target)
