"""Model-shape speaker attribution (reference speaker_attribution.py:
21-136): candidate construction (context window, repr_nb nearest
mentions), injected scorer, argmax + >0.5 gate."""

from __future__ import annotations

from renard_spark.operators.quotes import (
    build_speaker_examples,
    model_speakers,
)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_candidate_construction_invariants(data):
    n_tokens = data.draw(st.integers(10, 300))
    ctx_len = data.draw(st.sampled_from([16, 64, 512]))
    repr_nb = data.draw(st.integers(1, 4))
    quotes = [
        (i, s, min(s + data.draw(st.integers(1, 9)), n_tokens))
        for i, s in enumerate(
            data.draw(st.lists(st.integers(0, n_tokens - 1), max_size=4))
        )
    ]
    mentions = [
        (f"c{data.draw(st.integers(0, 3))}", s, s + 1)
        for s in data.draw(st.lists(st.integers(0, n_tokens - 1), max_size=25))
    ]
    out = build_speaker_examples(
        n_tokens, quotes, mentions, ctx_len, repr_nb
    )
    window = min(ctx_len, n_tokens)
    per_quote: dict[int, set[str]] = {}
    for qid, cid, reps in out:
        assert 1 <= len(reps) <= repr_nb
        assert reps == sorted(reps)
        # every representation lies inside a window of ctx_len tokens
        lo, hi = min(s for s, _ in reps), max(e for _, e in reps)
        assert hi - lo <= window
        assert cid not in per_quote.get(qid, set())  # one row per cand
        per_quote.setdefault(qid, set()).add(cid)
    # a whole-document window admits every mentioned character
    if window >= n_tokens and mentions:
        all_chars = {c for c, _, _ in mentions}
        for qid, _, _ in quotes:
            assert per_quote.get(qid, set()) == all_chars


def test_candidate_window_and_reprs():
    # doc of 1000 tokens, quote at [500, 510): window [255, 767)
    quotes = [(0, 500, 510)]
    mentions = [
        ("alice", 300, 301),   # inside
        ("alice", 490, 491),   # inside, nearest
        ("alice", 505, 506),
        ("alice", 600, 601),
        ("alice", 700, 701),   # inside but 5th-nearest → dropped (repr_nb=4)
        ("bob", 100, 101),     # outside the window
        ("bob", 520, 521),     # inside
    ]
    got = build_speaker_examples(1000, quotes, mentions, ctx_len=512, repr_nb=4)
    assert got == [
        (0, "alice", [(300, 301), (490, 491), (505, 506), (600, 601)]),
        (0, "bob", [(520, 521)]),
    ]


def test_window_shifts_at_document_edges():
    # quote near doc start: window is [0, ctx_len), not shrunk
    got = build_speaker_examples(
        1000, [(0, 5, 8)], [("x", 200, 201), ("y", 600, 601)], ctx_len=512
    )
    assert got == [(0, "x", [(200, 201)])]
    # short doc: window = whole doc
    got2 = build_speaker_examples(
        50, [(0, 40, 45)], [("x", 0, 1)], ctx_len=512
    )
    assert got2 == [(0, "x", [(0, 1)])]


def test_model_speakers_argmax_and_gate(spark):
    doc_tokens = spark.createDataFrame(
        [("d1", [f"t{i}" for i in range(100)])],
        "doc_id string, tokens array<string>",
    )
    quotes = spark.createDataFrame(
        [("d1", 0, 10, 20), ("d1", 1, 60, 70)],
        "doc_id string, quote_id int, start int, end int",
    )
    mentions = spark.createDataFrame(
        [("d1", "alice", 5, 6), ("d1", "bob", 22, 23), ("d1", "carol", 80, 81)],
        "doc_id string, char_id string, start_idx int, end_idx int",
    )

    def scorer_factory():
        # scores by proximity of the candidate's nearest rep to the
        # quote start: alice wins quote 0, carol wins quote 1 — but
        # carol's score is pushed under the 0.5 gate
        def scorer(batch):
            out = []
            for tokens, (qs, qe), cid, reps in batch:
                d = min(abs(ms - qs) for ms, _ in reps)
                s = max(0.0, 1.0 - d / 25.0)
                out.append(s if cid != "carol" else 0.4)
            return out
        return scorer

    rows = {r.quote_id: r for r in model_speakers(
        doc_tokens, quotes, mentions, scorer_factory, ctx_len=512
    ).collect()}
    assert rows[0].speaker_char_id == "alice"
    assert rows[0].speaker_score > 0.5
    # quote 1: best candidate carol gated at 0.4 → NULL, score reported
    assert rows[1].speaker_char_id is None
    assert abs(rows[1].speaker_score - 0.4) < 1e-9


def test_conversational_pipeline_with_model_speakers(spark):
    from renard_spark import corpus, pipeline

    docs = corpus.generate_documents(spark, 15, seed=41)

    def factory():
        return lambda batch: [0.9] * len(batch)  # everyone's credible

    out = pipeline.conversational_pipeline(
        docs, persist=False, speaker_scorer_factory=factory
    )
    speakers = out["speakers"]
    assert set(speakers.columns) >= {
        "doc_id", "quote_id", "start", "end", "speaker_char_id",
        "speaker_score",
    }
    rows = speakers.collect()
    assert rows and any(r.speaker_char_id is not None for r in rows)
    # triples derive from the model-attributed speakers without error
    out["triples"].collect()


def test_model_speakers_tie_breaks_by_char_id(spark):
    doc_tokens = spark.createDataFrame(
        [("d1", [f"t{i}" for i in range(30)])],
        "doc_id string, tokens array<string>",
    )
    quotes = spark.createDataFrame(
        [("d1", 0, 10, 12)], "doc_id string, quote_id int, start int, end int"
    )
    mentions = spark.createDataFrame(
        [("d1", "zed", 8, 9), ("d1", "amy", 14, 15)],
        "doc_id string, char_id string, start_idx int, end_idx int",
    )
    out = model_speakers(
        doc_tokens, quotes, mentions, lambda: (lambda b: [0.9] * len(b))
    ).collect()
    assert out[0].speaker_char_id == "amy"  # equal scores → smallest id
