"""Scale-path character unification: distributed pair rules + CC.

The parity path (unify.graph_rules_unify) runs the whole alias graph
per document inside applyInPandas — exact reference semantics, perfect
for 10^12 modest documents. This module is the *scale path* for the two
shapes that break per-doc execution:
  * pathological documents with huge distinct-name sets;
  * a global (cross-document) entity table.

Pipeline: distinct names → per-scope name-pair self-join (names are
few per scope; AQE skew-join guards hot scopes) → vectorized rule
evaluation in an Arrow pandas UDF → contradiction cut on *direct*
edges → distributed connected components (operators.cc).

Documented divergence from the reference: contradiction removal only
cuts direct edges, not first-edges of longer shortest paths (that step
is inherently sequential, character_unification.py:293-327); in
practice conflicting pairs were linked directly by the shared-last-name
rule, so direct-edge cutting covers the overwhelming majority — the
P/R≥0.95 budget absorbs the rest. Gender is inferred per name
(title-gazetteer only in this path; pronoun votes need chains, which
can be joined in upstream).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from renard_spark.functions.names import parse_name
from renard_spark.operators.cc import connected_components
from renard_spark.operators.unify_core import infer_gender
from renard_spark.resources.gazetteers import hypocorism_related


@F.pandas_udf(T.BooleanType())
def _alias_rule_udf(n1: pd.Series, n2: pd.Series) -> pd.Series:
    """Vectorized alias rules (a)-(d): hypocorism/equal, related after
    title removal, same last name, same first name."""
    out = []
    for a, b in zip(n1, n2):
        p1, p2 = parse_name(a), parse_name(b)
        ok = (
            hypocorism_related(a, b)
            or (
                p1.without_title != ""
                and p2.without_title != ""
                and (
                    p1.without_title.lower() == p2.without_title.lower()
                    or hypocorism_related(p1.without_title, p2.without_title)
                )
            )
            or (p1.last != "" and p1.last.lower() == p2.last.lower())
            or (p1.first != "" and p1.first.lower() == p2.first.lower())
        )
        out.append(ok)
    return pd.Series(out)


@F.pandas_udf(T.BooleanType())
def _contradiction_udf(n1: pd.Series, n2: pd.Series,
                       g1: pd.Series, g2: pd.Series) -> pd.Series:
    out = []
    for a, b, ga, gb in zip(n1, n2, g1, g2):
        p1, p2 = parse_name(a), parse_name(b)
        name_conflict = (
            p1.last != "" and p2.last != ""
            and p1.first != "" and p2.first != ""
            and p1.last == p2.last
            and p1.first != p2.first
        )
        gender_conflict = (
            ga != gb and ga != "UNKNOWN" and gb != "UNKNOWN"
        )
        out.append(bool(name_conflict or gender_conflict))
    return pd.Series(out)


@F.pandas_udf(T.StringType())
def _gender_udf(names: pd.Series) -> pd.Series:
    return pd.Series([infer_gender(n, None, "eng") for n in names])


def unify_distributed(
    entities_df: DataFrame,
    character_tag: str = "PER",
    scope_col: str = "doc_id",
    min_appearances: int = 0,
) -> DataFrame:
    """→ unified mentions (scope, char_id, names, gender, mention_str,
    start_idx, end_idx), same shape as unify.graph_rules_unify."""
    per = entities_df.filter(F.col("tag") == character_tag)
    names = (
        per.select(scope_col, "mention_str")
        .distinct()
        .withColumn("gender", _gender_udf("mention_str"))
    )

    a = names.select(
        F.col(scope_col).alias("_s"),
        F.col("mention_str").alias("n1"),
        F.col("gender").alias("g1"),
    )
    b = names.select(
        F.col(scope_col).alias("_s2"),
        F.col("mention_str").alias("n2"),
        F.col("gender").alias("g2"),
    )
    pairs = a.join(
        b, (a["_s"] == b["_s2"]) & (a["n1"] < b["n2"])
    ).drop("_s2")
    linked = pairs.withColumn("linked", _alias_rule_udf("n1", "n2")).filter(
        "linked"
    )
    kept = linked.withColumn(
        "cut", _contradiction_udf("n1", "n2", "g1", "g2")
    ).filter(~F.col("cut"))

    # vertex ids: scope \x00 name (scopes the CC per document/global key)
    SEP = "\x00"
    edges = kept.select(
        F.concat_ws(SEP, "_s", "n1").alias("src"),
        F.concat_ws(SEP, "_s", "n2").alias("dst"),
    )
    singles = names.select(
        F.concat_ws(SEP, scope_col, "mention_str").alias("src")
    ).withColumn("dst", F.col("src"))
    comp = connected_components(edges.unionByName(singles))

    membership = comp.select(
        F.split_part("vertex", F.lit(SEP), F.lit(1)).alias(scope_col),
        F.split_part("vertex", F.lit(SEP), F.lit(2)).alias("mention_str"),
        F.split_part("component", F.lit(SEP), F.lit(2)).alias("char_id"),
    )
    labeled = membership.join(names, [scope_col, "mention_str"])
    chars = labeled.groupBy(scope_col, "char_id").agg(
        F.array_sort(F.collect_set("mention_str")).alias("names")
    )
    # majority gender vote, ties toward the first gender in sorted order
    from pyspark.sql import Window

    votes = labeled.groupBy(scope_col, "char_id", "gender").agg(
        F.count(F.lit(1)).alias("n")
    )
    wv = Window.partitionBy(scope_col, "char_id").orderBy(
        F.col("n").desc(), F.col("gender").asc()
    )
    gvote = (
        votes.withColumn("_r", F.row_number().over(wv))
        .filter("_r = 1")
        .select(scope_col, "char_id", "gender")
    )
    chars = chars.join(gvote, [scope_col, "char_id"])

    unified = (
        per.join(membership, [scope_col, "mention_str"])
        .join(chars, [scope_col, "char_id"])
        .select(
            scope_col, "char_id", "names", "gender",
            "mention_str", "start_idx", "end_idx",
        )
    )
    if min_appearances > 0:
        from pyspark.sql import Window

        cnt = Window.partitionBy(scope_col, "char_id")
        unified = (
            unified.withColumn("_n", F.count(F.lit(1)).over(cnt))
            .filter(F.col("_n") >= min_appearances)
            .drop("_n")
        )
    return unified
