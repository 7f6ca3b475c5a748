"""Quote detection + rule-based speaker attribution.

QuoteDetector (reference quote_detection.py:17-71) is a stateful
open/close scan over quote-mark tokens: an opening mark opens a quote
when none is open; ANY quote mark closes an open quote. The engine
filters the token stream to quote marks first (a tiny fraction of
tokens — JVM-side filter), then runs the alternating scan per doc in an
Arrow-batched applyInPandas.

Speaker attribution: the reference uses a neural scorer
(speaker_attribution.py:21-136, score>0.5 else None). The engine ships
a deterministic rule attributor with the same output shape: the
speaker is the character whose mention is nearest AFTER the quote end
within `max_gap` tokens (the '"..." said X' pattern), else nearest
BEFORE the start; ties and absences → NULL. Pure DataFrame joins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_QUOTE_PAIRS = [('"', '"'), ("``", "''"), ("«", "»"), ("“", "”")]


def detect_quotes(
    tokens_df: DataFrame, quote_pairs: list[tuple[str, str]] | None = None
) -> DataFrame:
    """→ quotes(doc_id, quote_id, start, end) with end exclusive
    (both quote-mark tokens included in [start, end))."""
    pairs = quote_pairs or DEFAULT_QUOTE_PAIRS
    opens = {p[0] for p in pairs}
    marks = opens | {p[1] for p in pairs}

    qtoks = tokens_df.filter(F.col("token").isin(list(marks))).select(
        "doc_id", "tok_idx", "token"
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("tok_idx")
        rows = []
        open_start = None
        qid = 0
        for tok_idx, token in zip(pdf["tok_idx"], pdf["token"]):
            if open_start is None:
                if token in opens:
                    open_start = int(tok_idx)
            else:
                rows.append((pdf["doc_id"].iloc[0], qid, open_start, int(tok_idx) + 1))
                qid += 1
                open_start = None
        return pd.DataFrame(rows, columns=["doc_id", "quote_id", "start", "end"])

    return qtoks.groupBy("doc_id").applyInPandas(
        scan, schema="doc_id string, quote_id int, start int, end int"
    )


def attribute_speakers(
    quotes_df: DataFrame,
    unified_mentions: DataFrame,
    max_gap: int = 5,
) -> DataFrame:
    """→ speakers(doc_id, quote_id, start, end, speaker_char_id nullable).

    Candidate joins are banded on the gap so they never degenerate:
      after-pattern: 0 ≤ mention.start − quote.end < max_gap
      before-pattern: 0 ≤ quote.start − mention.end < max_gap
    Preference: smallest gap after, then smallest gap before
    (canonical tie-break char_id).
    """
    m = unified_mentions.select(
        F.col("doc_id").alias("_d"),
        F.col("char_id").alias("_c"),
        F.col("start_idx").alias("_ms"),
        F.col("end_idx").alias("_me"),
    )
    q = quotes_df
    after = q.join(
        m,
        (q["doc_id"] == m["_d"])
        & (m["_ms"] >= q["end"])
        & (m["_ms"] < q["end"] + max_gap),
    ).select(
        "doc_id", "quote_id", "start", "end",
        F.col("_c").alias("cand"),
        (F.col("_ms") - q["end"]).alias("gap"),
        F.lit(0).alias("side"),
    )
    before = q.join(
        m,
        (q["doc_id"] == m["_d"])
        & (m["_me"] <= q["start"])
        & (m["_me"] > q["start"] - max_gap),
    ).select(
        "doc_id", "quote_id", "start", "end",
        F.col("_c").alias("cand"),
        (q["start"] - F.col("_me")).alias("gap"),
        F.lit(1).alias("side"),
    )
    cands = after.unionByName(before)
    w = Window.partitionBy("doc_id", "quote_id").orderBy("side", "gap", "cand")
    # confidence mirrors the reference's thresholded scores
    # (speaker_attribution.py:119-124): prediction kept only when the
    # score clears 0.5 — the rule attributor scores by proximity.
    best = (
        cands.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(
            "doc_id",
            "quote_id",
            F.col("cand").alias("speaker_char_id"),
            (
                1.0
                - F.col("gap") / F.lit(2.0 * max_gap)
                - 0.2 * F.col("side")
            ).alias("speaker_score"),
        )
    )
    out = q.join(best, ["doc_id", "quote_id"], "left").select(
        "doc_id", "quote_id", "start", "end", "speaker_char_id",
        "speaker_score",
    )
    # score ≤ 0.5 → no prediction (reference keeps only score > 0.5)
    return out.withColumn(
        "speaker_char_id",
        F.when(F.col("speaker_score") > 0.5, F.col("speaker_char_id")),
    )
