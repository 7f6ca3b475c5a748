"""Scale-path character unification: distributed pair rules + CC.

The parity path (unify.graph_rules_unify) runs the whole alias graph
per document inside applyInPandas — exact reference semantics, perfect
for 10^12 modest documents. This module is the *scale path* for the two
shapes that break per-doc execution:
  * pathological documents with huge distinct-name sets;
  * a global (cross-document) entity table.

Pipeline: distinct names → per-scope name-pair self-join (names are
few per scope; AQE skew-join guards hot scopes) → vectorized rule
evaluation in an Arrow pandas UDF → distributed connected components
over the UNCUT alias graph (operators.cc) → **exact contradiction pass
per initial component** (cogrouped applyInPandas): cuts never merge
components and cross-component contradiction pairs are no-ops, so the
reference's sequential whole-graph pass (character_unification.py:
293-327) decomposes exactly into independent per-component passes in
canonical order. Property-tested EQUAL to the per-doc parity path.
Gender is inferred per name (title gazetteer; pronoun votes need
chains, joinable upstream).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from renard_spark.functions.names import parse_name
from renard_spark.operators.cc import (
    ConvergenceError,
    connected_components,
    connected_components_star,
)
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


def _chain_gender_votes(
    names: DataFrame, corefs_df: DataFrame, scope_col: str
) -> DataFrame:
    """Fold coref-chain pronoun votes into per-name gender — the exact
    ``infer_gender`` semantics (unify_core.py:75-96) as DataFrame ops:
    title gender (already in ``names.gender``) wins when known; else,
    over chains CONTAINING the name, count each chain's distinct male/
    female pronoun SURFACES (set semantics: 'He' and 'he' are two
    surfaces, a repeated 'he' is one) and majority-vote, ties UNKNOWN.
    """
    from renard_spark.resources.gazetteers import (
        FEMALE_PRONOUNS,
        MALE_PRONOUNS,
    )

    male = sorted(MALE_PRONOUNS["eng"])
    female = sorted(FEMALE_PRONOUNS["eng"])
    surf = corefs_df.select(scope_col, "chain_id", "mention_str").distinct()
    counts = surf.groupBy(scope_col, "chain_id").agg(
        F.sum(
            F.when(F.lower("mention_str").isin(male), 1).otherwise(0)
        ).alias("_mc"),
        F.sum(
            F.when(F.lower("mention_str").isin(female), 1).otherwise(0)
        ).alias("_fc"),
    )
    votes = (
        surf.join(counts, [scope_col, "chain_id"])
        .groupBy(scope_col, "mention_str")
        .agg(F.sum("_mc").alias("_m"), F.sum("_fc").alias("_f"))
        .select(
            scope_col,
            "mention_str",
            F.when(F.col("_m") > F.col("_f"), F.lit("MALE"))
            .when(F.col("_f") > F.col("_m"), F.lit("FEMALE"))
            .otherwise(F.lit("UNKNOWN"))
            .alias("_vote"),
        )
    )
    return names.join(votes, [scope_col, "mention_str"], "left").select(
        scope_col,
        "mention_str",
        F.when(F.col("gender") != "UNKNOWN", F.col("gender"))
        .otherwise(F.coalesce("_vote", F.lit("UNKNOWN")))
        .alias("gender"),
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def _block_keys_udf(names: pd.Series) -> pd.Series:
    """Entity-resolution blocking keys for a name. SOUND for the alias
    rules: every rule — hypocorism (single-gazetteer-name strings),
    equal-after-title-removal, shared last token, shared first token —
    requires the two names to share a lowercase token OR a hypocorism
    family hub of one of their tokens, so candidate generation on
    these keys loses NO true pair (over-generation is fine: the rule
    UDF re-checks each candidate)."""
    from renard_spark.resources.gazetteers import names_of_nickname

    out = []
    for n in names:
        keys: set[str] = set()
        for tok in str(n).lower().split():
            keys.add(tok)
            keys.update(names_of_nickname(tok))
        out.append(sorted(keys))
    return pd.Series(out)


def unify_distributed(
    entities_df: DataFrame,
    character_tag: str = "PER",
    scope_col: str = "doc_id",
    min_appearances: int = 0,
    corefs_df: DataFrame | None = None,
    pair_blocking: str = "scope",
) -> DataFrame:
    """→ unified mentions (scope, char_id, names, gender, mention_str,
    start_idx, end_idx), same shape as unify.graph_rules_unify.

    ``corefs_df`` (scope, chain_id, mention_str, ...) joins chain
    pronoun votes into the gender inference, closing the one semantic
    gap vs the parity path's ``infer_gender(chains=...)``; the informed
    gender then feeds the contradiction refinement exactly as there.
    (Chain-mention assignment and the link_corefs_mentions rule remain
    parity-path features.)

    ``pair_blocking``: 'scope' (default) self-joins all names within a
    scope — exact and cheap when scopes are documents (names are few
    per doc). 'token' generates candidates via token/hypocorism-family
    blocking keys instead — the CORPUS-scope path, where one scope
    holds every distinct surface in the table and a full self-join
    would be quadratic; provably recall-lossless for the rule set
    (see ``_block_keys_udf``) and property-tested equal to 'scope'."""
    # the mention table feeds TWO consumers (the distinct-surface names
    # build and the final labeling join) — without a checkpoint the
    # upstream lineage (tokenize + NER over the whole corpus) executes
    # once per consumer; mentions are mention-scale, so truncating here
    # saves a full corpus scan per call. Lazy: materialized by the
    # names checkpoint below, reused by the final join.
    per = entities_df.filter(F.col("tag") == character_tag).localCheckpoint(
        eager=False
    )
    # names and linked pairs feed several consumers each (pair sides,
    # node/edge sides, labeling) and carry Arrow-UDF stages —
    # checkpoint once instead of recomputing the UDFs per consumer
    names = (
        per.select(scope_col, "mention_str")
        .distinct()
        .withColumn("gender", _gender_udf("mention_str"))
    )
    if corefs_df is not None:
        names = _chain_gender_votes(names, corefs_df, scope_col)
    names = names.localCheckpoint(eager=True)

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
    if pair_blocking == "token":
        keyed = names.select(
            F.col(scope_col).alias("_ks"),
            F.col("mention_str").alias("_kn"),
            F.explode(_block_keys_udf("mention_str")).alias("_key"),
        )
        cand = (
            keyed.alias("x")
            .join(
                keyed.alias("y"),
                (F.col("x._ks") == F.col("y._ks"))
                & (F.col("x._key") == F.col("y._key"))
                & (F.col("x._kn") < F.col("y._kn")),
            )
            .select(
                F.col("x._ks").alias("_cs"),
                F.col("x._kn").alias("_c1"),
                F.col("y._kn").alias("_c2"),
            )
            .distinct()
        )
        pairs = (
            cand.join(
                a, (F.col("_cs") == F.col("_s")) & (F.col("_c1") == F.col("n1"))
            )
            .join(
                b,
                (F.col("_cs") == F.col("_s2")) & (F.col("_c2") == F.col("n2")),
            )
            .select("_s", "n1", "g1", "n2", "g2")
        )
    else:
        pairs = a.join(
            b, (a["_s"] == b["_s2"]) & (a["n1"] < b["n2"])
        ).drop("_s2")
    linked = (
        pairs.withColumn("linked", _alias_rule_udf("n1", "n2"))
        .filter("linked")
        .localCheckpoint(eager=True)
    )

    # Stage 1 — distributed CC over the UNCUT alias graph. Cuts never
    # merge components, and cross-component contradiction pairs are
    # no-ops, so the sequential contradiction pass decomposes exactly
    # per initial component.
    SEP = "\x00"
    edges = linked.select(
        F.concat_ws(SEP, "_s", "n1").alias("src"),
        F.concat_ws(SEP, "_s", "n2").alias("dst"),
    )
    singles = names.select(
        F.concat_ws(SEP, scope_col, "mention_str").alias("src")
    ).withColumn("dst", F.col("src"))
    all_edges = edges.unionByName(singles)
    try:
        # alias graphs are star-ish (tiny diameter) — hash-to-min wins
        comp0 = connected_components(all_edges)
    except ConvergenceError:
        # pathological long-chain alias graph: O(log n)-round variant
        comp0 = connected_components_star(all_edges)

    membership0 = comp0.select(
        F.split_part("vertex", F.lit(SEP), F.lit(1)).alias(scope_col),
        F.split_part("vertex", F.lit(SEP), F.lit(2)).alias("mention_str"),
        F.col("component").alias("comp0"),
    )

    # Stage 2 — exact contradiction pass per initial component
    # (canonical sorted-pair order; component graphs are tiny), inside
    # one cogrouped applyInPandas keyed by (scope, comp0).
    #
    # Singleton components (the vast majority: any name with no alias
    # link) CANNOT contradict — they bypass the cogroup entirely
    # (char_id = the name itself), so the Python-per-group cost is paid
    # only for true multi-name components.
    sizes = membership0.groupBy(scope_col, "comp0").agg(
        F.count(F.lit(1)).alias("_n")
    )
    multi_keys = sizes.filter("_n > 1").select(scope_col, "comp0")
    single_membership = membership0.join(
        multi_keys, [scope_col, "comp0"], "left_anti"
    ).select(
        scope_col, "mention_str", F.col("mention_str").alias("char_id")
    )
    membership0 = membership0.join(multi_keys, [scope_col, "comp0"], "left_semi")
    node_side = membership0.join(names, [scope_col, "mention_str"]).select(
        scope_col, "comp0", "mention_str", "gender"
    )
    m0 = comp0.select(
        F.split_part("vertex", F.lit(SEP), F.lit(1)).alias("_es"),
        F.split_part("vertex", F.lit(SEP), F.lit(2)).alias("_n1"),
        F.col("component").alias("_c0"),
    )
    edge_side = (
        linked.join(
            m0, (F.col("_s") == F.col("_es")) & (F.col("n1") == F.col("_n1"))
        )
        .select(
            F.col("_s").alias(scope_col),
            F.col("_c0").alias("comp0"),
            "n1",
            "n2",
        )
    )

    import pandas as pd

    from renard_spark.operators.unify_core import (
        _bfs_dist,
        _remove_shortest_path_first_edges,
    )
    from renard_spark.functions.names import parse_name as _parse

    def refine(nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        if nodes_pdf.empty:
            return pd.DataFrame(columns=[scope_col, "mention_str", "char_id"])
        scope = nodes_pdf[scope_col].iloc[0]
        node_names = sorted(nodes_pdf["mention_str"])
        genders = dict(zip(nodes_pdf["mention_str"], nodes_pdf["gender"]))
        adj = {n: set() for n in node_names}
        if edges_pdf is not None and not edges_pdf.empty:
            for a, b in zip(edges_pdf["n1"], edges_pdf["n2"]):
                adj[a].add(b)
                adj[b].add(a)
        parsed = {n: _parse(n) for n in node_names}
        from itertools import combinations

        for n1, n2 in combinations(node_names, 2):
            p1, p2 = parsed[n1], parsed[n2]
            if (
                p1.last != "" and p2.last != ""
                and p1.first != "" and p2.first != ""
                and p1.last == p2.last
                and p1.first != p2.first
            ):
                _remove_shortest_path_first_edges(adj, n1, n2)
                continue
            g1, g2 = genders[n1], genders[n2]
            if g1 != g2 and g1 != "UNKNOWN" and g2 != "UNKNOWN":
                _remove_shortest_path_first_edges(adj, n1, n2)
        rows = []
        seen: set[str] = set()
        for start in node_names:
            if start in seen:
                continue
            comp = sorted(_bfs_dist(adj, start).keys())
            seen.update(comp)
            for n in comp:
                rows.append((scope, n, comp[0]))
        return pd.DataFrame(rows, columns=[scope_col, "mention_str", "char_id"])

    membership = (
        node_side.groupBy(scope_col, "comp0")
        .cogroup(edge_side.groupBy(scope_col, "comp0"))
        .applyInPandas(
            refine,
            schema=f"{scope_col} string, mention_str string, char_id string",
        )
        .unionByName(single_membership)
    )
    labeled = membership.join(names, [scope_col, "mention_str"])
    chars = labeled.groupBy(scope_col, "char_id").agg(
        F.array_sort(F.collect_set("mention_str")).alias("names")
    )
    # majority gender vote; ties break toward the gender of the FIRST
    # name in sorted-component order — same canonical rule as the
    # parity path (unify_core.unify_doc), so both paths stay
    # property-equal even on 1-1 MALE/FEMALE components.
    from pyspark.sql import Window

    votes = labeled.groupBy(scope_col, "char_id", "gender").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("mention_str").alias("_first_name"),
    )
    wv = Window.partitionBy(scope_col, "char_id").orderBy(
        F.col("n").desc(), F.col("_first_name").asc()
    )
    gvote = (
        votes.withColumn("_r", F.row_number().over(wv))
        .filter("_r = 1")
        .select(scope_col, "char_id", "gender")
    )
    chars = chars.join(gvote, [scope_col, "char_id"])

    # passthrough: any extra entity columns survive (e.g. doc_id when
    # unifying at corpus scope — cross-document canonicalization keeps
    # per-document provenance)
    core = [scope_col, "char_id", "names", "gender",
            "mention_str", "start_idx", "end_idx"]
    extra = [c for c in per.columns if c not in core and c != "tag"]
    unified = (
        per.join(membership, [scope_col, "mention_str"])
        .join(chars, [scope_col, "char_id"])
        .select(*core, *extra)
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
