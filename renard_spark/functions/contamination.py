"""Train/eval decontamination operators.

A training pipeline that also hosts benchmark/eval sets must answer
two questions before anything ships: (1) do any corpus slices share
EXACT documents (a test split leaking into train), and (2) how much
n-gram-level overlap does each training document have with the
benchmark set (the GPT-3/PaLM-style 13-gram decontamination signal —
near-verbatim leakage that exact hashing misses).

Both are pure equi-join shapes: fingerprints or shingles join on their
own value, so cost is linear in corpus size + collision volume — never
pairwise in documents. Shingling reuses ``dedup.shingles`` (distinct
w-token shingles per doc, whole-text fallback under w tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from renard_spark.functions.dedup import shingles, with_shingle_array


def cross_source_overlap(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Exact-duplicate contamination between corpus slices →
    (grp_a, grp_b, n_shared): the number of distinct document texts
    (md5 fingerprints) present in BOTH slices, one row per unordered
    slice pair with any overlap. One distinct + one self-equi-join on
    the fingerprint."""
    fp = docs.select(
        F.col(group_col).alias("grp"), F.md5(F.col(text_col)).alias("fp")
    ).distinct()
    a = fp.select(F.col("grp").alias("grp_a"), "fp")
    b = fp.select(F.col("grp").alias("grp_b"), F.col("fp").alias("_fp2"))
    return (
        a.join(
            b,
            (F.col("fp") == F.col("_fp2"))
            & (F.col("grp_a") < F.col("grp_b")),
        )
        .groupBy("grp_a", "grp_b")
        .agg(F.countDistinct("fp").cast("long").alias("n_shared"))
    )


def ngram_contamination(
    docs: DataFrame, bench: DataFrame, w: int = 13,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-training-document benchmark overlap →
    (doc_id, n_shingles, n_shared, frac): of the doc's distinct
    w-token shingles, how many appear in ANY benchmark document.
    ``frac`` near 1 ⇒ the doc is (near-)verbatim benchmark material
    and should be dropped. The benchmark shingle SET is typically tiny
    next to the corpus — Spark broadcasts the join side on its own
    when it fits; the shape stays an equi-join either way."""
    # the per-doc shingle ARRAY is built once (narrow) and checkpointed;
    # the total count is size() of it — NO corpus-wide groupBy shuffle —
    # and only the exploded rows that survive the benchmark join are
    # ever shuffled by key
    d_arr = with_shingle_array(
        docs.select(F.col(id_col).alias("doc_id"), text_col), w, text_col
    ).localCheckpoint(eager=False)
    bset = shingles(
        bench.select(F.col(id_col).alias("doc_id"), text_col), w, text_col
    ).select("shingle").distinct()
    tot = d_arr.select(
        "doc_id", F.size("_shs").cast("long").alias("n_shingles")
    )
    hit = (
        d_arr.select("doc_id", F.explode("_shs").alias("shingle"))
        .join(bset, "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        tot.join(hit, "doc_id", "left")
        .fillna(0, subset=["n_shared"])
        .withColumn(
            "frac", F.col("n_shared") / F.greatest("n_shingles", F.lit(1))
        )
    )
