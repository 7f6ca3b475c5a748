"""Evaluation metrics: triple P/R/F1 (the BASELINE parity metric) and
NER span P/R/F1.

``triple_prf`` mirrors the reference's ``_triple_precision_recall_f1``
(/root/reference/renard/pipeline/relation_extraction.py:64-93): micro
P/R/F1 over multisets of (subj, rel, obj) triples, with the shorter
side padded by null triples (i.e. precision = |matched| / |pred|,
recall = |matched| / |gold| over exact-match triples).
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Sequence

Triple = tuple


def triple_prf(
    pred: Iterable[Sequence], gold: Iterable[Sequence]
) -> tuple[float, float, float]:
    p = Counter(tuple(t) for t in pred)
    g = Counter(tuple(t) for t in gold)
    matched = sum((p & g).values())
    np_, ng = sum(p.values()), sum(g.values())
    precision = matched / np_ if np_ else (1.0 if ng == 0 else 0.0)
    recall = matched / ng if ng else (1.0 if np_ == 0 else 0.0)
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return precision, recall, f1


def span_prf(
    pred: Iterable[tuple], gold: Iterable[tuple]
) -> tuple[float, float, float]:
    """Exact-span NER scoring ((doc_id, start, end, tag) tuples) — the
    engine's stand-in for seqeval (reference ner/ner.py:52-75)."""
    return triple_prf(pred, gold)


def bcubed(
    assign_df,
    sys_col: str = "sys_id",
    gold_col: str = "gold_id",
    key_cols: Sequence[str] = ("doc_id",),
):
    """B-cubed precision/recall/F1 of a system clustering against gold
    over an item table — the standard entity-resolution cluster metric
    (Bagga & Baldwin '98): per item, precision = |C(i) ∩ G(i)| /
    |C(i)| and recall = |C(i) ∩ G(i)| / |G(i)|, averaged over items.

    ``assign_df``: one row per item with cluster columns ``sys_col``
    and ``gold_col``; clusters are scoped by ``key_cols`` (per-doc by
    default). Returns ONE row (n_items, bcubed_precision,
    bcubed_recall, bcubed_f1).

    Distributed shape — the cell-count identity: every item in cell
    (c, g) shares |c∩g| = n_cg, so sum over items of n_cg/n_c equals
    sum over cells of n_cg²/n_c. Three map-side-combined groupBys on
    the same key family + two dimension-scale joins (cells × clusters,
    never items × items) + one global agg — no per-item window, no
    UDF, nothing quadratic."""
    from pyspark.sql import functions as F

    kc = list(key_cols)
    n_sys = assign_df.groupBy(*kc, sys_col).agg(
        F.count(F.lit(1)).alias("_n_c")
    )
    n_gold = assign_df.groupBy(*kc, gold_col).agg(
        F.count(F.lit(1)).alias("_n_g")
    )
    cells = assign_df.groupBy(*kc, sys_col, gold_col).agg(
        F.count(F.lit(1)).alias("_n_cg")
    )
    j = cells.join(n_sys, kc + [sys_col]).join(n_gold, kc + [gold_col])
    agg = j.agg(
        F.sum("_n_cg").alias("_n"),
        F.sum(F.col("_n_cg") * F.col("_n_cg") / F.col("_n_c")).alias("_sp"),
        F.sum(F.col("_n_cg") * F.col("_n_cg") / F.col("_n_g")).alias("_sr"),
    )
    p = F.col("_sp") / F.col("_n")
    r = F.col("_sr") / F.col("_n")
    return agg.select(
        F.col("_n").cast("long").alias("n_items"),
        F.round(p, 6).alias("bcubed_precision"),
        F.round(r, 6).alias("bcubed_recall"),
        F.round(2 * p * r / (p + r), 6).alias("bcubed_f1"),
    )
