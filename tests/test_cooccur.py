"""Co-occurrence extraction parity: the distributed join formulation
must reproduce the reference-style sequential per-doc oracle exactly —
token & sentence units, polarity, dynamic windows."""

import random

from pyspark.sql import functions as F

from renard_spark.operators import cooccur

from .oracle import cooccur_edges_oracle


def _random_doc(rng, n_mentions=30, n_tokens=300, n_chars=5):
    ms = []
    for _ in range(n_mentions):
        s = rng.randrange(0, n_tokens - 3)
        e = s + rng.randint(1, 3)
        ms.append((f"c{rng.randrange(n_chars)}", s, e))
    return ms


def _mentions_df(spark, docs):
    rows = [
        (doc_id, c, s, e) for doc_id, ms in docs.items() for c, s, e in ms
    ]
    return spark.createDataFrame(
        rows, "doc_id string, char_id string, start_idx int, end_idx int"
    )


def _edges_by_doc(df, pol=False):
    out = {}
    for r in df.collect():
        v = (r.weight, round(r.polarity, 9) if pol else None)
        out.setdefault(r.doc_id, {})[(r.src, r.dst)] = v
    return out


def test_token_unit_matches_oracle(spark):
    rng = random.Random(17)
    docs = {f"d{i}": _random_doc(rng) for i in range(10)}
    for dist in (0, 2, 7):
        got = _edges_by_doc(
            cooccur.cooccurrence_edges(_mentions_df(spark, docs), dist, "tokens")
        )
        for doc_id, ms in docs.items():
            want = {
                k: (w, None)
                for k, (w, _) in cooccur_edges_oracle(ms, dist, "tokens").items()
            }
            assert got.get(doc_id, {}) == want, (doc_id, dist)


def _sentence_fixture(rng, n_sent=20, sent_len=10, n_mentions=25, n_chars=4):
    # tokens: n_sent sentences of sent_len tokens
    n_tokens = n_sent * sent_len
    sent_of = [i // sent_len for i in range(n_tokens)]
    bounds = [(i * sent_len, (i + 1) * sent_len) for i in range(n_sent)]
    ms = []
    for _ in range(n_mentions):
        s = rng.randrange(0, n_tokens - 2)
        e = s + rng.randint(1, 2)
        ms.append((f"c{rng.randrange(n_chars)}", s, e))
    return ms, sent_of, bounds


def _tokens_df(spark, docs_sents):
    rows = []
    for doc_id, sent_of in docs_sents.items():
        for i, s in enumerate(sent_of):
            rows.append((doc_id, s, i, f"t{i}"))
    return spark.createDataFrame(
        rows, "doc_id string, sent_idx int, tok_idx int, token string"
    )


def test_sentence_unit_matches_oracle(spark):
    rng = random.Random(23)
    docs, sents, bnds = {}, {}, {}
    for i in range(6):
        ms, sent_of, bounds = _sentence_fixture(rng)
        docs[f"d{i}"], sents[f"d{i}"], bnds[f"d{i}"] = ms, sent_of, bounds
    toks = _tokens_df(spark, sents)
    for dist in (0, 1, 3):
        got = _edges_by_doc(
            cooccur.cooccurrence_edges(
                _mentions_df(spark, docs), dist, "sentences", tokens_df=toks
            )
        )
        for doc_id, ms in docs.items():
            want = {
                k: (w, None)
                for k, (w, _) in cooccur_edges_oracle(
                    ms, dist, "sentences", sents[doc_id], bnds[doc_id]
                ).items()
            }
            assert got.get(doc_id, {}) == want, (doc_id, dist)


def test_polarity_matches_oracle(spark):
    rng = random.Random(31)
    docs, sents, bnds, pols = {}, {}, {}, {}
    for i in range(4):
        ms, sent_of, bounds = _sentence_fixture(rng)
        d = f"d{i}"
        docs[d], sents[d], bnds[d] = ms, sent_of, bounds
        pols[d] = [round(rng.uniform(-1, 1), 3) for _ in bounds]
    toks = _tokens_df(spark, sents)
    pol_rows = [
        (d, i, p) for d, ps in pols.items() for i, p in enumerate(ps)
    ]
    pol_df = spark.createDataFrame(
        pol_rows, "doc_id string, sent_idx int, polarity double"
    )
    got = _edges_by_doc(
        cooccur.cooccurrence_edges(
            _mentions_df(spark, docs), 1, "sentences",
            tokens_df=toks, polarities_df=pol_df,
        ),
        pol=True,
    )
    for doc_id, ms in docs.items():
        want = {
            k: (w, round(p, 9))
            for k, (w, p) in cooccur_edges_oracle(
                ms, 1, "sentences", sents[doc_id], bnds[doc_id], pols[doc_id]
            ).items()
        }
        assert got.get(doc_id, {}) == want, doc_id


def test_dynamic_windows_match_oracle(spark):
    rng = random.Random(41)
    docs = {f"d{i}": _random_doc(rng, n_mentions=23) for i in range(5)}
    window, overlap, dist = 7, 2, 3
    mdf = cooccur.add_window_ids(_mentions_df(spark, docs), window, overlap)
    edges = cooccur.cooccurrence_edges(
        mdf, dist, "tokens", group_col="window_id"
    )
    got = {}
    for r in edges.collect():
        got.setdefault((r.doc_id, r.window_id), {})[(r.src, r.dst)] = r.weight

    step = window - overlap
    for doc_id, ms in docs.items():
        srt = sorted(ms, key=lambda m: (m[1], m[2], m[0]))
        n = len(srt)
        n_win = max((n - window + step - 1) // step + 1, 1)
        for w in range(n_win):
            sub = srt[w * step : w * step + window]
            want = {
                k: cnt
                for k, (cnt, _) in cooccur_edges_oracle(sub, dist, "tokens").items()
            }
            assert got.get((doc_id, w), {}) == want, (doc_id, w)


def test_dynamic_blocks_first_match(spark):
    ms = {"d": [("a", 1, 2), ("b", 3, 4), ("a", 11, 12), ("c", 13, 14), ("b", 25, 26)]}
    blocks = [("d", 0, 0, 10), ("d", 1, 10, 20), ("d", 2, 0, 30)]
    bdf = (
        _mentions_df(spark, {}).sparkSession.createDataFrame(
            blocks, "doc_id string, block_id int, start int, end int"
        )
    )
    assigned = cooccur.assign_dynamic_blocks(_mentions_df(spark, ms), bdf)
    rows = {(r.char_id, r.start_idx): r.block_id for r in assigned.collect()}
    # first containing block wins; end strict
    assert rows == {("a", 1): 0, ("b", 3): 0, ("a", 11): 1, ("c", 13): 1, ("b", 25): 2}


def test_grouped_path_equals_join_path(spark):
    rng = random.Random(71)
    docs = {f"d{i}": _random_doc(rng, n_mentions=25) for i in range(8)}
    mdf = _mentions_df(spark, docs)
    # token unit
    for dist in (0, 3):
        a = _edges_by_doc(cooccur.cooccurrence_edges(mdf, dist, "tokens"))
        b = _edges_by_doc(cooccur.cooccurrence_edges_grouped(mdf, dist, "tokens"))
        assert a == b, dist
    # sentence unit + polarity
    docs2, sents, bnds, pols = {}, {}, {}, {}
    for i in range(5):
        ms, sent_of, bounds = _sentence_fixture(rng)
        d = f"s{i}"
        docs2[d], sents[d], bnds[d] = ms, sent_of, bounds
        pols[d] = [round(rng.uniform(-1, 1), 3) for _ in bounds]
    toks = _tokens_df(spark, sents)
    pol_df = spark.createDataFrame(
        [(d, i, p) for d, ps in pols.items() for i, p in enumerate(ps)],
        "doc_id string, sent_idx int, polarity double",
    )
    a = _edges_by_doc(
        cooccur.cooccurrence_edges(
            _mentions_df(spark, docs2), 1, "sentences",
            tokens_df=toks, polarities_df=pol_df),
        pol=True,
    )
    b = _edges_by_doc(
        cooccur.cooccurrence_edges_grouped(
            _mentions_df(spark, docs2), 1, "sentences",
            tokens_df=toks, polarities_df=pol_df),
        pol=True,
    )
    assert a == b
