"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — at 100 TB you run them in this order and
each tier prunes the next one's input:

1. exact       — sha256 hash-groupBy (one shuffle of 32-byte keys)
2. MinHash+LSH — shingle -> minhash signature -> band buckets ->
                 candidate pairs via bucket join (never all-pairs)
3. SimHash     — 60-bit weighted fingerprint; near-dups differ in few bits
4. n-gram Jaccard — exact verify step for the candidates LSH surfaced

The exact tier is the scalable form of the reference's unique-hash upload
check (reference app/controllers/document.py:147-156 and the unique
indexed hash column, app/db/models.py:78), with sha2(content,256) per the
input_hint invariant.

Hashes are md5-based and engine-portable (see functions/hashing.py), so
every operator here is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tfidf_spark.functions.tokenize import shingles_udf


def exact_duplicates(
    docs: DataFrame, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(id, content_sha256, keeper_id): keeper = min id per identical hash.
    Rows with id != keeper_id are droppable duplicates."""
    h = docs.select(
        F.col(id_col).alias("doc_id"), F.sha2(text_col, 256).alias("content_sha256")
    )
    w = Window.partitionBy("content_sha256")
    return h.withColumn("keeper_id", F.min("doc_id").over(w))


def doc_shingles(
    docs: DataFrame, n: int = 3, text_col: str = "content", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, s): DISTINCT word n-gram shingles, deduped in the kernel."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_udf(n)(F.col(text_col))).alias("s"),
    )


def minhash_signatures(shingles: DataFrame, n_seeds: int = 8) -> DataFrame:
    """(doc_id, seed, minhash): md5-hex MinHash, portable across engines."""
    spark = shingles.sparkSession
    seeds = spark.range(n_seeds).select(F.col("id").cast("int").alias("seed"))
    return (
        shingles.crossJoin(F.broadcast(seeds))
        .groupBy("doc_id", "seed")
        .agg(
            F.min(
                F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("s")))
            ).alias("minhash")
        )
    )


def lsh_candidate_pairs(signatures: DataFrame, band_size: int = 1) -> DataFrame:
    """(a, b, n_bands): pairs colliding in >= 1 band. The join is on
    (band, bucket-key) — work is proportional to collisions, never to
    n^2. band_size=1 maximizes recall; raise it to tighten precision."""
    banded = signatures.withColumn("band", (F.col("seed") / band_size).cast("int"))
    keys = banded.groupBy("doc_id", "band").agg(
        F.concat_ws("|", F.collect_list("minhash")).alias("bucket")
    ) if band_size > 1 else banded.select(
        "doc_id", "band", F.col("minhash").alias("bucket")
    )
    a, b = keys.alias("a"), keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_bands"))
    )


def jaccard_pairs(
    shingles: DataFrame, min_jaccard: float = 0.0, top: int | None = None
) -> DataFrame:
    """(a, b, jac_r): exact n-gram Jaccard via the shingle inverted index.
    Use as the verify step on LSH candidates; standalone it is quadratic
    in co-shingled docs."""
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = shingles.alias("a"), shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n_sh", "nb"), "b")
        .select(
            "a", "b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jac_r"),
        )
        .filter(F.col("jac_r") >= min_jaccard)
    )
    if top:
        jac = jac.orderBy(F.desc("jac_r"), F.asc("a"), F.asc("b")).limit(top)
    return jac


def simhash(postings: DataFrame, bits: int = 60) -> DataFrame:
    """(doc_id, simhash): count-weighted SimHash over md5 term hashes.
    Input: (doc_id, term, cnt) posting rows."""
    p = postings.withColumn(
        "h", F.expr("cast(conv(substring(md5(term), 1, 15), 16, 10) as bigint)")
    )
    b = p.select(
        "doc_id", "cnt", "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    )
    contrib = F.when(F.expr("(shiftright(h, b) & 1) = 1"), F.col("cnt")).otherwise(
        -F.col("cnt")
    )
    per_bit = b.groupBy("doc_id", "b").agg(F.sum(contrib).alias("s"))
    bitval = F.when(
        F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), b)")
    ).otherwise(F.lit(0).cast("long"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(bitval).cast("long").alias("simhash")
    )


def simhash_near_pairs(
    sim: DataFrame, max_hamming: int = 3, bands: int | None = None, bits: int = 60
) -> DataFrame:
    """(a, b, hamming): near-dup pairs by SimHash. Band trick: split the
    ``bits`` into ``bands`` chunks covering every bit; a pair with
    hamming < bands MUST collide on >= 1 exact chunk (pigeonhole), so the
    join is bucketed — never a cross join. bands defaults to
    max_hamming + 1, the smallest value with guaranteed recall."""
    if bands is None:
        bands = max_hamming + 1
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) "
            "or recall is not guaranteed"
        )
    bands = min(bands, bits)
    # equal-as-possible chunk widths covering all `bits` (off_i = i*bits//bands)
    chunks = sim.select(
        "doc_id", "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "chunk",
        # floor() explicitly: double->int CAST truncates in Spark but
        # ROUNDS in DuckDB — floor is the engine-portable spelling.
        F.expr(
            f"(simhash >> cast(floor(band * {bits} / {bands}) as int)) & "
            f"(shiftleft(cast(1 as bigint), "
            f"  cast(floor((band + 1) * {bits} / {bands}) as int)"
            f"  - cast(floor(band * {bits} / {bands}) as int)) - 1)"
        ),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a"),
            F.col("b.doc_id").alias("b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return cand.select(
        "a", "b", F.bit_count(F.expr("sa ^ sb")).alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
