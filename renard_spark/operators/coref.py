"""Rule-based coreference — the deterministic test-path resolver.

The reference's coref steps are neural (corefs/corefs.py:13-322); the
engine ships a pronoun→nearest-preceding-PER-mention resolver with the
same output shape so unification's coref features (gender vote, chain
assignment, link_corefs rule) are exercised deterministically. A
model-backed resolver plugs in behind the same schema.

Chains: all entity mentions sharing a surface form in a doc form one
chain; each pronoun within `max_dist` tokens after a mention joins the
chain of the nearest preceding mention. Implemented with one running
"last non-null" window over the merged (mention ∪ pronoun) stream —
JVM-side, no UDF.

Output: corefs(doc_id, chain_id, start_idx, end_idx, mention_str)
(the reference's List[List[Mention]], core.py:187-188, exploded).
Contiguous spans only, mirroring the contiguity filter
(corefs/corefs.py:290-299).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from renard_spark.resources.gazetteers import FEMALE_PRONOUNS, MALE_PRONOUNS


def rule_corefs(
    tokens_df: DataFrame,
    entities_df: DataFrame,
    character_tag: str = "PER",
    max_dist: int = 30,
    lang: str = "eng",
) -> DataFrame:
    pronouns = sorted(MALE_PRONOUNS[lang] | FEMALE_PRONOUNS[lang])

    ents = entities_df.filter(F.col("tag") == character_tag)
    # chain id = dense rank of surface form within doc (canonical order)
    wchain = Window.partitionBy("doc_id").orderBy("mention_str")
    chain_ids = (
        ents.select("doc_id", "mention_str")
        .distinct()
        .withColumn("chain_id", F.dense_rank().over(wchain) - 1)
    )
    ment = ents.join(chain_ids, ["doc_id", "mention_str"]).select(
        "doc_id", "chain_id", "start_idx", "end_idx", "mention_str"
    )

    pron = tokens_df.filter(F.lower(F.col("token")).isin(pronouns)).select(
        "doc_id",
        F.col("tok_idx").alias("start_idx"),
        (F.col("tok_idx") + 1).alias("end_idx"),
        F.col("token").alias("mention_str"),
    )

    stream = ment.select(
        "doc_id", "start_idx", "end_idx", "mention_str",
        F.col("chain_id").alias("_chain"),
        F.lit(1).alias("_is_mention"),
    ).unionByName(
        pron.select(
            "doc_id", "start_idx", "end_idx", "mention_str",
            F.lit(None).cast("int").alias("_chain"),
            F.lit(0).alias("_is_mention"),
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("start_idx", F.col("_is_mention").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    resolved = (
        stream.withColumn("_last_chain", F.last("_chain", ignorenulls=True).over(w))
        .withColumn(
            "_last_end",
            F.last(
                F.when(F.col("_is_mention") == 1, F.col("end_idx")),
                ignorenulls=True,
            ).over(w),
        )
    )
    keep = resolved.filter(
        (F.col("_is_mention") == 1)
        | (
            F.col("_last_chain").isNotNull()
            & (F.col("start_idx") - F.col("_last_end") <= max_dist)
        )
    )
    return keep.select(
        "doc_id",
        F.col("_last_chain").alias("chain_id"),
        "start_idx",
        "end_idx",
        "mention_str",
    ).filter(F.col("chain_id").isNotNull())
