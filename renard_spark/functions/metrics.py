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
