"""Corpus source abstraction: parquet paths now, Iceberg tables when a
catalog is configured.

The engine targets an Iceberg table ``(repo, path, commit, lang,
content)`` (BASELINE.json input_hint). Two Iceberg paths exist:

- a real ``iceberg-spark-runtime`` jar on the classpath -> the DSv2
  reader/writer (catalog table names, engine-side split planning);
- no jar (this sandbox: no network, fetch attempt recorded in
  FIXTURES.md) -> the pure-Python table-format implementation in
  ``sources/iceberg_meta.py`` resolves version-hint -> metadata.json ->
  snapshot -> manifest list -> manifests -> live parquet files per the
  public spec, and Spark scans those files directly. Snapshot pinning
  and resume fingerprints behave identically on both paths.
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
    from tfidf_spark.sources import iceberg_meta

    if fmt == "auto":
        if "/" not in source and iceberg_available(spark):
            fmt = "iceberg"
        elif iceberg_meta.is_iceberg_table(source):
            fmt = "iceberg"
        else:
            fmt = "parquet"
    if fmt == "iceberg":
        if not iceberg_meta.is_iceberg_table(source):
            # not a filesystem table dir: a catalog table name, which
            # only the DSv2 reader (runtime jar) can resolve
            if not iceberg_available(spark):
                raise RuntimeError(
                    f"{source!r} is not a filesystem Iceberg table "
                    "(no metadata/ tree) and no iceberg-spark-runtime jar "
                    "is on the session classpath to resolve it as a "
                    "catalog name (pass --jars / spark.jars.packages "
                    "org.apache.iceberg:iceberg-spark-runtime-*)."
                )
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            df = reader.load(source)
            fp = (
                f"iceberg:{source}@"
                f"{snapshot_id if snapshot_id is not None else 'current'}"
            )
            return df, fp
        # pure-Python table-format path (sources/iceberg_meta.py): walk the
        # spec's metadata tree to the snapshot's live parquet files and
        # scan those directly — pushdown/pruning intact per file. The
        # fingerprint is the RESOLVED snapshot id, so "current" that moved
        # between runs changes the resume fingerprint, exactly as the
        # checkpoint contract needs.
        files, resolved = iceberg_meta.live_data_files(
            source, snapshot_id=snapshot_id
        )
        if not files:
            raise ValueError(f"Iceberg snapshot {resolved} lists no data files")
        return spark.read.parquet(*files), f"iceberg:{source}@{resolved}"
    return spark.read.parquet(source), f"parquet:{source}"


def write_table(df: DataFrame, target: str, fmt: str = "parquet") -> None:
    """Overwrite write for parquet; for Iceberg, a DSv2 createOrReplace
    when a runtime jar is present, else an append snapshot through the
    pure-Python metadata writer (sources/iceberg_meta.py)."""
    if fmt == "iceberg":
        if iceberg_available(df.sparkSession):
            df.writeTo(target).createOrReplace()
        else:
            from tfidf_spark.sources import iceberg_meta

            iceberg_meta.write_table(df, target)
    else:
        df.write.mode("overwrite").parquet(target)
