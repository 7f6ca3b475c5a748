"""Conversational character networks — band joins over quotes.

Reimplements ConversationalGraphExtractor
(/root/reference/renard/pipeline/graph_extraction.py:475-713):

- 'conversation': undirected edges between speakers of quotes within
  `conversation_dist` (tokens or sentences) of each other. The
  reference does a forward scan with early break over start-sorted,
  non-overlapping quotes (the only shape QuoteDetector can emit), which
  is exactly a band predicate → expressed as a banded self-join.
- 'mention': directed speaker→character edges when the character is
  mentioned inside the quote (≥1 mention counts once per quote,
  :601-632) → containment join + distinct + groupBy.

Divergence note: the reference's dynamic-window bounds for
conversational graphs (:652-668) compute each window's bounds as the
*first quote's own span*, which can never contain any quote under
quotes_for_blocks' strict end check — every dynamic window comes out
empty. The engine instead windows quotes by rank (same semantics as
mention windows); documented as a deliberate fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_sent(df: DataFrame, tokens_df: DataFrame, tok_col: str, out_col: str,
               clamp: bool = True) -> DataFrame:
    """Attach the sentence index of token `tok_col` (clamped to the last
    token — the reference would crash on an index past the end)."""
    t = tokens_df.select(
        F.col("doc_id").alias("_d"),
        F.col("tok_idx").alias("_t"),
        F.col("sent_idx").alias(out_col),
    )
    n = tokens_df.groupBy("doc_id").agg((F.max("tok_idx")).alias("_maxt"))
    df = df.join(n.withColumnRenamed("doc_id", "_dn"), df["doc_id"] == F.col("_dn")).drop("_dn")
    key = F.least(F.col(tok_col), F.col("_maxt")) if clamp else F.col(tok_col)
    return (
        df.withColumn("_key", key)
        .join(t, (df["doc_id"] == t["_d"]) & (F.col("_key") == t["_t"]))
        .drop("_d", "_t", "_key", "_maxt")
    )


def quote_windows(
    speakers_df: DataFrame, window: int, overlap: int = 0
) -> DataFrame:
    """Explode quotes to dynamic-window ids (window of N quotes, step
    N−overlap) — the sane semantics for dynamic conversational
    networks. (The reference's own window-bounds computation,
    graph_extraction.py:659-668, derives each window's bounds from the
    first quote's span, which can never contain a whole quote under
    quotes_for_blocks' strict end check — every reference dynamic
    window comes out empty. Deliberate fix, documented.)"""
    from pyspark.sql import Window as W

    assert window > overlap >= 0
    step = window - overlap
    w = W.partitionBy("doc_id").orderBy("start", "end", "quote_id")
    n = W.partitionBy("doc_id")
    ranked = (
        speakers_df.withColumn("_r", F.row_number().over(w) - 1)
        .withColumn("_n", F.count(F.lit(1)).over(n))
        .withColumn(
            "_nwin",
            F.greatest(
                F.ceil((F.col("_n") - window) / step) + 1, F.lit(1)
            ).cast("int"),
        )
    )
    lo = F.greatest(F.ceil((F.col("_r") - window + 1) / step).cast("int"), F.lit(0))
    hi = F.least(F.floor(F.col("_r") / step).cast("int"), F.col("_nwin") - 1)
    return ranked.withColumn(
        "window_id", F.explode(F.sequence(lo, hi))
    ).drop("_r", "_n", "_nwin")


def conversation_edges(
    speakers_df: DataFrame,
    dist: int = 1,
    unit: str = "tokens",
    tokens_df: DataFrame | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """speakers_df: (doc_id, quote_id, start, end, speaker_char_id).
    → edges(doc_id[, group], src, dst, weight) undirected (src<dst)."""
    keys = ["doc_id"] + ([group_col] if group_col else [])
    q = speakers_df.filter(F.col("speaker_char_id").isNotNull())
    if unit == "sentences":
        assert tokens_df is not None
        q = _with_sent(q, tokens_df, "end", "sent_end")
        q = _with_sent(q, tokens_df, "start", "sent_start")
    a = q.select(
        *keys,
        F.col("quote_id").alias("q1"),
        F.col("start").alias("s1"),
        F.col("end").alias("e1"),
        F.col("speaker_char_id").alias("sp1"),
        *( [F.col("sent_end").alias("se1"), F.col("sent_start").alias("ss1")]
           if unit == "sentences" else [] ),
    )
    b = q.select(
        *[F.col(k).alias(f"_{k}") for k in keys],
        F.col("quote_id").alias("q2"),
        F.col("start").alias("s2"),
        F.col("end").alias("e2"),
        F.col("speaker_char_id").alias("sp2"),
        *( [F.col("sent_end").alias("se2"), F.col("sent_start").alias("ss2")]
           if unit == "sentences" else [] ),
    )
    cond = a["q1"] < b["q2"]
    for k in keys:
        cond = cond & (a[k] == b[f"_{k}"])
    j = a.join(b, cond)
    ordered = F.col("s2") >= F.col("e1")
    if unit == "tokens":
        gap = F.when(ordered, F.col("s2") - F.col("e1")).otherwise(
            F.col("s1") - F.col("e2")
        )
        interact = F.abs(gap) <= dist
    else:
        gap = F.when(ordered, F.col("ss2") - F.col("se1")).otherwise(
            F.col("ss1") - F.col("se2")
        )
        interact = F.abs(gap) <= dist
    pairs = j.filter(interact & (F.col("sp1") != F.col("sp2")))
    return pairs.groupBy(
        *keys,
        F.least("sp1", "sp2").alias("src"),
        F.greatest("sp1", "sp2").alias("dst"),
    ).agg(F.count(F.lit(1)).alias("weight"))


def mention_graph_edges(
    speakers_df: DataFrame,
    unified_mentions: DataFrame,
    ignore_self_mention: bool = True,
) -> DataFrame:
    """Directed speaker→mentioned-character edges
    (graph_extraction.py:601-632). → (doc_id, src, dst, weight)."""
    q = speakers_df.filter(F.col("speaker_char_id").isNotNull())
    m = unified_mentions.select(
        F.col("doc_id").alias("_d"),
        F.col("char_id").alias("_c"),
        F.col("start_idx").alias("_ms"),
        F.col("end_idx").alias("_me"),
    )
    inside = q.join(
        m,
        (q["doc_id"] == m["_d"])
        & (m["_ms"] >= q["start"])
        & (m["_me"] <= q["end"]),
    ).select(
        "doc_id", "quote_id",
        F.col("speaker_char_id").alias("src"),
        F.col("_c").alias("dst"),
    ).distinct()  # ≥1 mention in the quote counts once (break at :630)
    if ignore_self_mention:
        inside = inside.filter(F.col("src") != F.col("dst"))
    return inside.groupBy("doc_id", "src", "dst").agg(
        F.count(F.lit(1)).alias("weight")
    )
