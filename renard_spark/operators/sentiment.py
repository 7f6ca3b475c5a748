"""Sentence-level sentiment — lexicon-based, fully JVM-side.

The reference scores each sentence with NLTK VADER's compound metric
(sentiment_analysis.py:7-39, value in [-1,1]). The engine ships a
deterministic valence-lexicon scorer with the same output shape and the
VADER-style normalization compound = s/√(s²+α): a broadcast join from
tokens to the lexicon, one groupBy per sentence — no Python UDF at all.
The lexicon = a core narrative word list below + the ~3.1k-entry
original compilation in resources/valence.py (same [-4,4] VADER scale).
The real VADER list is drop-in loadable via ``load_vader_lexicon``
(official TSV format) or any (word, valence) DataFrame passed to
``sentence_polarities(lexicon=...)``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from renard_spark.resources.valence import EXTENDED_VALENCE

ALPHA = 15.0  # VADER's normalization constant

# core narrative valences (kept verbatim for fixture stability;
# these override the extended list on key collisions)
_CORE: dict[str, float] = {
    "delightful": 2.9, "charming": 2.2, "wonderful": 2.7, "agreeable": 1.8,
    "happy": 2.1, "happiness": 2.4, "glad": 1.7, "love": 3.2, "loved": 2.9,
    "smile": 1.4, "smiled": 1.4, "pleased": 1.9, "pleasure": 2.0,
    "good": 1.9, "great": 3.1, "kind": 1.8, "gentle": 1.6, "delighted": 2.9,
    "dreadful": -2.7, "horrid": -2.5, "miserable": -2.6, "odious": -2.4,
    "unhappy": -1.9, "sad": -2.1, "hate": -2.7, "hated": -2.7,
    "displeased": -1.8, "angry": -2.3, "terrible": -2.8, "awful": -2.6,
    "bad": -1.9, "cruel": -2.6, "disagreeable": -1.7, "wretched": -2.4,
}

LEXICON: dict[str, float] = {**EXTENDED_VALENCE, **_CORE}


def lexicon_df(spark) -> DataFrame:
    return spark.createDataFrame(
        [(w, v) for w, v in LEXICON.items()], "word string, valence double"
    )


def load_vader_lexicon(spark, path: str) -> DataFrame:
    """Parse the official ``vader_lexicon.txt`` TSV (MIT-licensed;
    ``token\\tmean\\tstddev\\t[votes]``) into the (word, valence) shape
    every scorer here consumes — the concrete drop-in seam for users
    who ship the real ~7.5k-entry list (it cannot be vendored in this
    offline container). Distributed read: the file may live on any
    Hadoop-visible filesystem."""
    raw = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return (
        raw.filter(F.length(F.trim("value")) > 0)
        .select(
            F.lower(parts.getItem(0)).alias("word"),
            parts.getItem(1).cast("double").alias("valence"),
        )
        .filter(F.col("valence").isNotNull())
    )


def sentence_polarities(
    tokens_df: DataFrame, lexicon: DataFrame | None = None
) -> DataFrame:
    """→ (doc_id, sent_idx, polarity double in [-1,1]).

    Every sentence gets a row (0.0 when no lexicon hits), mirroring the
    reference's one-polarity-per-sentence list (core.py:178-179).
    ``lexicon`` (word string, valence double) overrides the built-in
    list — the dim-table seam for a vendored VADER parquet or a
    domain lexicon.
    """
    spark = tokens_df.sparkSession
    lex = lexicon if lexicon is not None else lexicon_df(spark)
    hits = (
        tokens_df.join(
            F.broadcast(lex), F.lower(tokens_df["token"]) == lex["word"], "left"
        )
        .groupBy("doc_id", "sent_idx")
        .agg(F.sum(F.coalesce("valence", F.lit(0.0))).alias("s"))
    )
    return hits.select(
        "doc_id",
        "sent_idx",
        (F.col("s") / F.sqrt(F.col("s") * F.col("s") + F.lit(ALPHA))).alias(
            "polarity"
        ),
    )


def sentence_polarities_narrow(sent_tokens_df: DataFrame) -> DataFrame:
    """Zero-shuffle variant over the compact per-sentence form
    (doc_id, sent_idx, toks): the lexicon becomes a map literal and the
    valence sum an ordered array fold — no join, no groupBy.

    The map is built with ``str_to_map`` over ONE string literal, not
    ``create_map`` over 2·|lexicon| literal expressions: at ~3k
    entries the latter is a ~5.5k-node expression tree that costs
    seconds of analysis on EVERY execution, while this is a 3-node
    tree constant-folded once."""
    assert not any("," in w or ":" in w for w in LEXICON)
    packed = ",".join(f"{w}:{v!r}" for w, v in LEXICON.items())
    lex = F.expr(
        f"str_to_map('{packed}', ',', ':')"
    ).cast("map<string,double>")
    s = F.aggregate(
        "toks",
        F.lit(0.0),
        lambda acc, x: acc + F.coalesce(lex[F.lower(x)], F.lit(0.0)),
    )
    return sent_tokens_df.select(
        "doc_id",
        "sent_idx",
        (s / F.sqrt(s * s + F.lit(ALPHA))).alias("polarity"),
    )


def polarity_py(words: list[str]) -> float:
    """Driver-side twin (test oracle)."""
    s = sum(LEXICON.get(w.lower(), 0.0) for w in words)
    return s / math.sqrt(s * s + ALPHA)
