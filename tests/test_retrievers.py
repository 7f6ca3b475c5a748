"""NER context retrievers: neighbors + ensemble (reference
ner/retrieval.py:215-240, 343-375), tested against a transcription of
the reference's retrieve() loops (test oracle only)."""

from __future__ import annotations

from renard_spark.functions.retrieval import (
    ensemble_context,
    neighbors_context,
    neural_rerank_context,
)


def reference_neighbors(element_i: int, n_elements: int, k: int):
    """Transcription of NERNeighborsContextRetriever.retrieve
    (ner/retrieval.py:221-240) on index structure only — including the
    negative-slice edge case for early sentences."""
    elements = list(range(n_elements))
    left_nb = k // 2
    # faithful python slicing: elements[element_i - left_nb : element_i]
    lctx = [
        (idx, "left")
        for idx in elements[element_i - left_nb: element_i]
    ] if element_i - left_nb >= 0 else []
    rctx = [
        (idx, "right")
        for idx in elements[element_i + 1: element_i + 1 + left_nb]
    ]
    return lctx + rctx


def test_neighbors_matches_reference(spark):
    n = 9
    sents = spark.createDataFrame(
        [("d1", i) for i in range(n)] + [("d2", i) for i in range(3)],
        "doc_id string, sent_idx int",
    )
    got = {}
    for r in neighbors_context(sents, k=4).collect():
        got.setdefault((r.doc_id, r.sent_idx), set()).add(
            (r.ctx_sent_idx, r.side)
        )
    for doc, nn in (("d1", n), ("d2", 3)):
        for i in range(nn):
            want = set(reference_neighbors(i, nn, 4))
            assert got.get((doc, i), set()) == want, (doc, i)


def test_neighbors_no_cross_doc_leak(spark):
    sents = spark.createDataFrame(
        [("a", 0), ("a", 1), ("b", 0), ("b", 1)],
        "doc_id string, sent_idx int",
    )
    rows = neighbors_context(sents, k=2).collect()
    assert all(r.doc_id in ("a", "b") for r in rows)
    # right-side only (sent 0 has no left under the reference edge
    # case; sent 1's left requires sent_idx >= k/2 = 1 → gets sent 0)
    got = {(r.doc_id, r.sent_idx, r.ctx_sent_idx, r.side) for r in rows}
    assert got == {
        ("a", 0, 1, "right"), ("a", 1, 0, "left"),
        ("b", 0, 1, "right"), ("b", 1, 0, "left"),
    }


def test_ensemble_union_topk(spark):
    scored = spark.createDataFrame(
        [
            ("d", 0, "d", 3, 2.0),
            ("d", 0, "d", 5, 1.0),
            ("d", 0, "d", 7, 3.0),
        ],
        "doc_id string, sent_idx int, ctx_doc_id string, ctx_sent_idx int,"
        " score double",
    )
    unscored = spark.createDataFrame(
        [("d", 0, "d", 1), ("d", 0, "d", 3)],
        "doc_id string, sent_idx int, ctx_doc_id string, ctx_sent_idx int",
    )
    out = ensemble_context([scored, unscored], k=3).collect()
    ranked = sorted(((r.rank, r.ctx_sent_idx, r.score) for r in out))
    # ctx 3 appears in both members: keeps its best (scored) value;
    # scored matches outrank the scoreless ctx 1
    assert ranked == [(1, 7, 3.0), (2, 3, 2.0), (3, 5, 1.0)]

    out2 = ensemble_context([unscored], k=2).collect()
    assert sorted((r.rank, r.ctx_sent_idx) for r in out2) == [(1, 1), (2, 3)]


def test_neural_rerank_topk_threshold_and_sides(spark):
    sents = spark.createDataFrame(
        [("d", i, [f"w{i}", "tok"]) for i in range(6)],
        "doc_id string, sent_idx int, toks array<string>",
    )
    matches = spark.createDataFrame(
        [("d", 3, "d", c) for c in (0, 1, 4, 5)],
        "doc_id string, sent_idx int, ctx_doc_id string, ctx_sent_idx int",
    )

    def scorer_factory():
        # deterministic: score by the ctx sentence's leading token
        # number — ctx 5 best, then 4, 1, 0; verify side plumbed through
        def scorer(batch):
            out = []
            for el, ctx, side in batch:
                assert el[0] == "w3"
                n = int(ctx[0][1:])
                assert side == ("left" if n < 3 else "right")
                out.append(n / 10.0)
            return out
        return scorer

    got = neural_rerank_context(
        matches, sents, scorer_factory, k=3, threshold=0.05
    ).collect()
    ranked = sorted((r.rank, r.ctx_sent_idx, r.score, r.side) for r in got)
    # top-3 by score, then the 0.0-scored ctx 0 is cut by threshold
    # anyway; ctx 1 (0.1) survives the threshold and takes rank 3
    assert ranked == [
        (1, 5, 0.5, "right"), (2, 4, 0.4, "right"), (3, 1, 0.1, "left"),
    ]
