"""Transformer-NER post-processing: wordpiece realignment + batched
inference loop, tested with an injected deterministic fake model (no
torch needed) against a direct transcription of the reference's
``batch_labels`` (/root/reference/renard/pipeline/ner/ner.py:266-299)
— test oracle only, never imported by the engine.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from renard_spark.operators import ner, tokenize
from renard_spark.operators.ner import (
    model_ner,
    realign_wordpiece_labels,
)


def reference_batch_labels(wp_labels, token_to_word, tokens, ctxmask):
    """Transcription of BertNamedEntityRecognizer.batch_labels
    (ner/ner.py:266-299) — the parity oracle."""
    batch_labels = ["O"] * len(tokens)
    try:
        inference_start = list(ctxmask).index(1)
    except ValueError:
        inference_start = 0
    for wplabel_j, wp_label in enumerate(wp_labels):
        token_i = token_to_word[wplabel_j]
        if token_i is None:
            continue
        if ctxmask[token_i] == 0:
            continue
        batch_labels[token_i - inference_start] = wp_label
    return batch_labels


# ------------------------------------------------------- unit fixtures


def test_realign_last_wordpiece_wins():
    # John | Smi ##th | went — the wordpiece O on ##th OVERWRITES the
    # I-PER from Smi (reference assigns per wordpiece in order)
    tokens = ["John", "Smith", "went"]
    wp_to_word = [None, 0, 1, 1, 2, None]  # [CLS] John Smi ##th went [SEP]
    wp_labels = ["O", "B-PER", "I-PER", "O", "O", "O"]
    ctx = [1, 1, 1]
    got = realign_wordpiece_labels(wp_labels, wp_to_word, ctx, len(tokens))
    assert got == ["B-PER", "O", "O"]
    assert got == reference_batch_labels(wp_labels, wp_to_word, tokens, ctx)


def test_realign_context_mask_shift():
    # two retrieved-context words precede the sentence: their
    # wordpieces are skipped and inference indices shift by 2
    tokens = ["John", "ran"]
    # words: ctx0 ctx1 John ran
    wp_to_word = [None, 0, 1, 2, 2, 3, None]
    wp_labels = ["O", "B-PER", "B-PER", "B-PER", "I-PER", "O", "O"]
    ctx = [0, 0, 1, 1]
    got = realign_wordpiece_labels(wp_labels, wp_to_word, ctx, len(tokens))
    # John (word 2) gets the LAST of its wordpiece labels (I-PER),
    # written at index 2 - inference_start(2) = 0; ctx words dropped
    assert got == ["I-PER", "O"]
    assert got == reference_batch_labels(wp_labels, wp_to_word, tokens, ctx)


def test_realign_all_context_mask_zero():
    # no 1 in the mask → inference_start falls back to 0 (reference's
    # except ValueError branch) and every word is skipped
    got = realign_wordpiece_labels(["B-PER"], [0], [0], 1)
    assert got == ["O"]


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_realign_matches_reference_property(data):
    n_ctx = data.draw(st.integers(0, 3))
    n_inf = data.draw(st.integers(1, 6))
    n_words = n_ctx + n_inf
    ctx = [0] * n_ctx + [1] * n_inf
    # random wordpiece stream: specials (None) + word indices, any order
    wp_to_word = data.draw(
        st.lists(
            st.one_of(st.none(), st.integers(0, n_words - 1)),
            min_size=0, max_size=20,
        )
    )
    labels = data.draw(
        st.lists(
            st.sampled_from(["O", "B-PER", "I-PER", "B-LOC", "I-LOC"]),
            min_size=len(wp_to_word), max_size=len(wp_to_word),
        )
    )
    tokens = [f"w{i}" for i in range(n_inf)]
    assert realign_wordpiece_labels(
        labels, wp_to_word, ctx, n_inf
    ) == reference_batch_labels(labels, wp_to_word, tokens, ctx)


# --------------------------------------------------------- fake model


GAZ = {"Elizabeth", "Darcy"}


def fake_wordpiece_model():
    """Deterministic stand-in for hf_ner_model(): splits tokens > 4
    chars into two wordpieces, labels gazetteer tokens B-PER on every
    piece, wraps each sentence in [CLS]/[SEP] specials."""

    def predict(batch):
        out = []
        for sent in batch:
            wp_labels, wp_to_word = ["O"], [None]  # [CLS]
            for wi, tok in enumerate(sent):
                pieces = [tok] if len(tok) <= 4 else [tok[:4], tok[4:]]
                for p in pieces:
                    wp_labels.append("B-PER" if tok in GAZ else "O")
                    wp_to_word.append(wi)
            wp_labels.append("O")  # [SEP]
            wp_to_word.append(None)
            out.append((wp_labels, wp_to_word, [1] * len(sent)))
        return out

    return predict


def test_model_ner_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "Elizabeth met Darcy. She smiled at Elizabeth."),
            ("d2", "Nobody came. Darcy left early."),
        ],
        "doc_id string, text string",
    )
    st_df = tokenize.sentence_tokens(docs)
    ents = model_ner(st_df, fake_wordpiece_model, batch_size=1)
    got = {
        (r.doc_id, r.start_idx, r.end_idx, r.mention_str, r.tag)
        for r in ents.collect()
    }
    toks = tokenize.tokens(docs)
    expected = {
        (r.doc_id, r.tok_idx, r.tok_idx + 1, r.token, "PER")
        for r in toks.collect()
        if r.token in GAZ
    }
    assert got == expected


def test_model_ner_matches_dictionary_ner(spark):
    """Pipeline interchangeability: the fake-model path produces the
    same entities table as dictionary_ner on single-token gazetteer
    hits, so downstream unification is agnostic to the tagger."""
    docs = spark.createDataFrame(
        [("d%d" % i, f"Darcy spoke. Elizabeth answered Darcy {i} times.")
         for i in range(5)],
        "doc_id string, text string",
    )
    via_model = model_ner(
        tokenize.sentence_tokens(docs), fake_wordpiece_model, batch_size=2
    )
    via_dict = ner.dictionary_ner(tokenize.tokens(docs), sorted(GAZ))
    key = lambda r: (r.doc_id, r.start_idx, r.end_idx, r.mention_str, r.tag)
    assert sorted(map(key, via_model.collect())) == sorted(
        map(key, via_dict.collect())
    )
