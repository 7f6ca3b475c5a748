"""KB entity linking — alias candidate generation + disambiguation.

The reference resolves generated triple arguments to characters by
unique-name ownership (relation_extraction.py:227-237,
``identify_character``): a name links only when exactly one character
owns it. This operator generalizes that contract to linking mentions
against an explicit knowledge base — the "entity linking" stage of the
KG-construction pipeline — with three standard ingredients:

1. candidate generation: an alias index (one row per lowered alias)
   equi-joined to the mention surface;
2. disambiguation: score = prior_weight * popularity prior +
   (1 - prior_weight) * context overlap, where context overlap is the
   fraction of the entity's profile tokens present in the mention's
   document;
3. NIL on ambiguity: when the top two candidate scores are within
   ``min_margin``, the mention links to NULL — the same abstain-on-
   ambiguity semantics as ``identify_character``.

Scale shapes (100 TB): the KB is a dimension table — both the alias
index and the exploded context profile are broadcast. Corpus-scale
tables (mentions, per-doc token profile) meet dimension tables only in
equi-joins keyed by (alias), (doc_id, token) and (doc_id, entity_id);
there is no cross join, no UDF, and the per-mention argmax window is
keyed by the mention itself, so nothing funnels through one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def alias_index(kb: DataFrame) -> DataFrame:
    """(entity_id, aliases, ..., prior) → one row per lowered alias.

    The KB is a dimension table; callers broadcast the result.
    """
    return kb.select(
        "entity_id", "prior", F.explode("aliases").alias("alias")
    ).withColumn("alias", F.lower("alias"))


def entity_context(kb: DataFrame) -> DataFrame:
    """(entity_id, context array<string>) → one row per lowered context
    token, carrying the profile size for the overlap denominator."""
    return kb.select(
        "entity_id",
        F.size("context").alias("n_ctx"),
        F.explode("context").alias("ctx_token"),
    ).withColumn("ctx_token", F.lower("ctx_token"))


def link_entities(
    tokens_df: DataFrame,
    kb: DataFrame,
    prior_weight: float = 0.4,
    min_margin: float = 1e-9,
    broadcast_kb: bool = True,
) -> DataFrame:
    """Link every alias-matching token to its best KB entity.

    ``tokens_df``: (doc_id, tok_idx, token). ``kb``: (entity_id,
    aliases array<string>, context array<string>, prior double).

    → (doc_id, tok_idx, surface, entity_id, score, n_cands) with one
    row per candidate mention; ``entity_id`` is NULL (NIL) when the
    top two scores are within ``min_margin``. ``score`` is the winning
    score either way, rounded to 6 for stable comparison.

    ``broadcast_kb=False`` drops the broadcast hints for KBs too big
    to ship to every executor (a 100M-entity KB is itself a corpus):
    the alias/context joins are already equi-keyed, so they degrade to
    shuffle hash joins — same results, no driver OOM.
    """
    bc = F.broadcast if broadcast_kb else (lambda df: df)
    ali = bc(alias_index(kb))
    mentions = tokens_df.select(
        "doc_id",
        "tok_idx",
        F.col("token").alias("surface"),
        F.lower("token").alias("_al"),
    )
    cands = mentions.join(ali, mentions["_al"] == ali["alias"]).drop(
        "alias", "_al"
    )

    # context overlap at (doc_id, entity_id) granularity — one row per
    # (candidate doc, entity), NOT per mention: mentions of the same
    # entity in one doc share the doc profile.
    ctx = bc(entity_context(kb))
    doc_profile = tokens_df.select(
        "doc_id", F.lower("token").alias("ctx_token")
    ).distinct()
    overlap = (
        cands.select("doc_id", "entity_id")
        .distinct()
        .join(ctx, "entity_id")
        .join(doc_profile, ["doc_id", "ctx_token"])
        .groupBy("doc_id", "entity_id")
        .agg(
            (
                F.count(F.lit(1))
                / F.greatest(F.max("n_ctx"), F.lit(1))
            ).alias("ctx_score")
        )
    )

    scored = cands.join(overlap, ["doc_id", "entity_id"], "left").withColumn(
        "score",
        F.lit(prior_weight) * F.col("prior")
        + F.lit(1.0 - prior_weight)
        * F.coalesce(F.col("ctx_score"), F.lit(0.0)),
    )

    w = Window.partitionBy("doc_id", "tok_idx").orderBy(
        F.col("score").desc(), F.col("entity_id").asc()
    )
    wall = Window.partitionBy("doc_id", "tok_idx")
    ranked = (
        scored.withColumn("_rn", F.row_number().over(w))
        .withColumn("_nxt", F.lead("score").over(w))
        .withColumn("n_cands", F.count(F.lit(1)).over(wall))
    )
    return ranked.filter(F.col("_rn") == 1).select(
        "doc_id",
        "tok_idx",
        "surface",
        F.when(
            F.col("_nxt").isNotNull()
            & (F.col("score") - F.col("_nxt") < F.lit(min_margin)),
            F.lit(None).cast("string"),
        )
        .otherwise(F.col("entity_id"))
        .alias("entity_id"),
        F.round("score", 6).alias("score"),
        F.col("n_cands").cast("long").alias("n_cands"),
    )


def canonicalize_links(
    member_links: DataFrame,
    group_col: str = "char_id",
    entity_col: str = "entity_id",
    nil: str = "NIL",
) -> DataFrame:
    """Lift mention-level KB links to canonical entities: one row per
    mention instance (``group_col``, ``entity_col`` nullable for
    NIL-abstained links) → one row per group with the majority-vote
    entity (ties → lexicographically smallest), ``nil`` when no
    member linked.

    This is the canonicalization step between entity linking and graph
    materialization: unified characters (alias-graph components) vote
    with their mentions' links, so one noisy link cannot relabel a
    well-attested character. Two map-side-combined aggregations + one
    group-keyed argmax window — no driver state, no UDF.
    """
    votes = (
        member_links.filter(F.col(entity_col).isNotNull())
        .groupBy(group_col, entity_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col(entity_col).asc()
    )
    best = votes.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    tot = member_links.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_mentions")
    )
    return tot.join(best, group_col, "left").select(
        group_col,
        F.coalesce(entity_col, F.lit(nil)).alias(entity_col),
        F.coalesce("n", F.lit(0)).cast("long").alias("n_linked"),
        F.col("n_mentions").cast("long").alias("n_mentions"),
    )


def link_media_to_mentions(
    media_df: DataFrame, mentions_df: DataFrame
) -> DataFrame:
    """Ground each media span in the nearest entity mention — the
    interleaved-payload KG edge (character)-[appears_near]->(media_ref).

    ``media_df``: (doc_id, media_ref, kind, offset) — char-addressed
    media spans (sources/ingest.media_spans). ``mentions_df``:
    (doc_id, char_start, character). Nearest = min |offset −
    char_start|; an exact-distance tie links the PRECEDING mention.
    Media in docs with no mentions drop out (inner semantics).

    Scale shape: the AS-OF pattern (tag + union + one window pass per
    direction), NOT a media×mention join — |media| + |mentions| rows
    through ONE shuffle keyed by doc_id; a long document costs one
    sort, never a quadratic candidate set.
    """
    null_s = F.lit(None).cast("string")
    m = mentions_df.select(
        "doc_id",
        F.col("char_start").cast("int").alias("pos"),
        "character",
        null_s.alias("media_ref"),
        null_s.alias("kind"),
        F.lit(1).alias("_is_m"),
    )
    x = media_df.select(
        "doc_id",
        F.col("offset").cast("int").alias("pos"),
        null_s.alias("character"),
        "media_ref",
        "kind",
        F.lit(0).alias("_is_m"),
    )
    # mentions sort before media at equal pos in BOTH directions, so a
    # mention exactly at the media offset is visible to each side with
    # distance 0 (and the prev-preferred rule then links it).
    wp = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("pos").asc(), F.col("_is_m").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("pos").desc(), F.col("_is_m").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    mc = F.when(F.col("_is_m") == 1, F.col("character"))
    mp = F.when(F.col("_is_m") == 1, F.col("pos"))
    ann = (
        m.unionByName(x)
        .withColumn("_pc", F.last(mc, ignorenulls=True).over(wp))
        .withColumn("_pp", F.last(mp, ignorenulls=True).over(wp))
        .withColumn("_nc", F.last(mc, ignorenulls=True).over(wn))
        .withColumn("_np", F.last(mp, ignorenulls=True).over(wn))
    )
    prev_d = F.col("pos") - F.col("_pp")
    next_d = F.col("_np") - F.col("pos")
    use_prev = F.col("_pc").isNotNull() & (
        F.col("_nc").isNull() | (prev_d <= next_d)
    )
    return (
        ann.filter(F.col("_is_m") == 0)
        .select(
            "doc_id",
            "media_ref",
            "kind",
            F.when(use_prev, F.col("_pc"))
            .otherwise(F.col("_nc"))
            .alias("character"),
            F.when(use_prev, prev_d).otherwise(next_d).alias("dist"),
        )
        .filter(F.col("character").isNotNull())
    )


def alias_priors(links_df: DataFrame) -> DataFrame:
    """Distill a surface-form prior table from mention-level link
    decisions — the Wikipedia-anchor-style P(entity | alias) dictionary
    a KB bootstraps its NEXT linking round's ``prior`` column from
    (engine addition; generalizes the static per-entity prior the
    reference's identify_character has no learned analog of).

    ``links_df``: (surface, entity_id nullable, ...) — the output of
    ``link_entities`` (NIL abstentions are NULL). → one row per
    (alias, entity_id) with entity_id non-null: mention count ``n``,
    ``prior`` = n / Σ n over the alias's linked mentions (round 6),
    and the alias's abstention count ``n_nil``.

    Two map-side-combined aggregations + one alias-keyed window — the
    same shape as ``canonicalize_links``; no driver state, no UDF.
    """
    per = links_df.groupBy(
        F.lower(F.col("surface")).alias("alias"), "entity_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("alias")
    linked = F.sum(
        F.when(F.col("entity_id").isNotNull(), F.col("n")).otherwise(F.lit(0))
    ).over(w)
    nil = F.sum(
        F.when(F.col("entity_id").isNull(), F.col("n")).otherwise(F.lit(0))
    ).over(w)
    return (
        per.withColumn("_linked", linked)
        .withColumn("n_nil", nil.cast("long"))
        .filter(F.col("entity_id").isNotNull())
        .select(
            "alias",
            "entity_id",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / F.col("_linked"), 6).alias("prior"),
            "n_nil",
        )
    )


def caption_pairs(interleaved_df: DataFrame, snippet_len: int = 48) -> DataFrame:
    """Media→caption pair extraction over the interleaved span table —
    the (image, text) / (audio, text) training-pair builder for
    multimodal corpora: each non-text span is paired with the nearest
    text span BEFORE and AFTER it in document order.

    ``interleaved_df``: the BASELINE input shape (doc_id,
    spans:array<struct<kind,text,media_ref,offset>>). Returns
    (doc_id, pos, kind, media_ref, caption_before, caption_after)
    where the captions are ``snippet_len``-char prefixes of the
    neighboring text spans (NULL when no text span exists on that
    side — e.g. a leading cover image).

    Scale shape: posexplode + ONE doc_id-keyed window pass (running
    last/first text over array order) — spans arrays are per-document,
    so the window sorts a handful of rows per key; no media×text join,
    no UDF. At 10^12 docs this is one shuffle of the span table keyed
    by doc_id, the same key the catalog tables are bucketed by."""
    sp = interleaved_df.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        "pos",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )
    snip = F.when(
        F.col("kind") == "text", F.substring("text", 1, snippet_len)
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    before = F.last(snip, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    after = F.first(snip, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        sp.select(
            "doc_id",
            "pos",
            "kind",
            "media_ref",
            before.alias("caption_before"),
            after.alias("caption_after"),
        )
        .filter(F.col("kind") != "text")
    )
