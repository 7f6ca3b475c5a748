"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k neighbors — the baseline.
  Dot products via zip_with/aggregate (JVM higher-order functions, no
  UDF); k-selection via window row_number.
- ``srp_lsh_topk``: the scale path — signed-random-projection LSH.
  Each vector gets an n_bits bucket key (sign of ⟨v, s_j⟩ with
  deterministic ±1 planes derived from md5(j:d)); candidates join
  within buckets only; exact cosine re-ranks candidates. Recall trades
  with n_bits/n_tables; planes are md5-derived so the DuckDB oracle
  reproduces buckets exactly.

At 10^12 scale the brute-force path is for per-bucket re-rank only;
the LSH bucketing (or an IVF coarse quantizer trained offline) bounds
the join fanout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(col):
    # element-order fold in double precision: bit-reproducible and
    # replicable by the DuckDB oracle (no shuffle-order float sums)
    return F.sqrt(
        F.aggregate(
            col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_topk(
    emb: DataFrame, k: int = 5, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per vector:
    (vec_id, neighbor_id, cosine, rank)."""
    a = with_norm(emb, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("va"),
        F.col("_norm").alias("na"),
    )
    b = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vb"),
        F.col("_norm").alias("nb"),
    )
    pairs = a.join(b, F.col("vec_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "vec_id",
        "neighbor_id",
        (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def srp_plane_sign(j, d):
    """Deterministic ±1 plane entry: low bit of md5('{j}:{d}')."""
    digit = F.conv(
        F.substring(F.md5(F.concat_ws(":", j.cast("string"), d.cast("string"))), 1, 1),
        16, 10,
    ).cast("int")
    return (digit % 2) * 2 - 1


def srp_bucket_keys(
    emb: DataFrame, n_bits: int = 8, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, bucket): signed-random-projection bucket string of
    n_bits sign bits.

    The projection folds over the array *in element order*
    (transform-with-index + aggregate), never through a shuffle-order
    groupBy sum — bit signs are bit-reproducible across engines/runs.
    """
    def bit(j: int):
        prod = F.transform(
            vec_col,
            lambda x, d: x.cast("double") * srp_plane_sign(F.lit(j), d),
        )
        p = F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(p > 0, F.lit("1")).otherwise(F.lit("0"))

    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.concat(*[bit(j) for j in range(n_bits)]).alias("bucket"),
    )


def srp_lsh_topk(
    emb: DataFrame, k: int = 5, n_bits: int = 8,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: exact cosine within SRP buckets only.
    (vec_id, neighbor_id, cosine, rank)."""
    buckets = srp_bucket_keys(emb, n_bits, vec_col, id_col).withColumnRenamed(
        "vec_id", "_bid"
    )
    e = with_norm(emb, vec_col).join(
        buckets, F.col(id_col) == F.col("_bid")
    ).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.col("_norm").alias("n"), "bucket",
    )
    a = e.select(
        F.col("id").alias("vec_id"), F.col("v").alias("va"),
        F.col("n").alias("na"), "bucket",
    )
    b = e.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("vb"),
        F.col("n").alias("nb"), F.col("bucket").alias("_bk"),
    )
    pairs = a.join(
        b, (a["bucket"] == b["_bk"]) & (F.col("vec_id") != F.col("neighbor_id"))
    )
    scored = pairs.select(
        "vec_id", "neighbor_id",
        (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
