"""End-to-end: synthetic interleaved corpus → tokens → NER → unify →
edges → triples, with the edges cross-checked against the sequential
oracle run on the engine's own unified mentions."""

from pyspark.sql import functions as F

from renard_spark import corpus, pipeline

from .oracle import cooccur_edges_oracle


def test_full_pipeline(spark):
    docs = corpus.generate_documents(spark, 15, seed=42)
    out = pipeline.character_graph_pipeline(docs, dist=(1, "sentences"))

    trip = out["triples"].collect()
    assert len(trip) > 0
    assert all(r.pred == "interacts_with" and r.weight >= 1 for r in trip)
    assert all(r.subj < r.obj for r in trip)

    # characters: name variants unified (some doc must have a
    # multi-name character — the corpus uses nicknames/titles)
    chars = out["characters"].collect()
    assert any(len(c.names) > 1 for c in chars)

    # lineage invariant: fingerprints reproduce input spans exactly
    lin = out["lineage"]
    assert lin.count() == 15
    assert lin.filter(F.col("span_fingerprint").isNull()).count() == 0

    # edges parity vs sequential oracle on the same unified mentions
    mentions = out["unified_mentions"].collect()
    toks = out["tokens"].collect()
    sent_of = {}
    for r in toks:
        sent_of.setdefault(r.doc_id, {})[r.tok_idx] = r.sent_idx
    by_doc = {}
    for r in mentions:
        by_doc.setdefault(r.doc_id, []).append((r.char_id, r.start_idx, r.end_idx))
    got = {}
    for r in out["edges"].collect():
        got.setdefault(r.doc_id, {})[(r.src, r.dst)] = r.weight
    for doc_id, ms in by_doc.items():
        so = sent_of[doc_id]
        sent_list = [so[i] for i in range(len(so))]
        n_sent = max(sent_list) + 1
        bounds = []
        for s in range(n_sent):
            idxs = [i for i, x in enumerate(sent_list) if x == s]
            bounds.append((min(idxs), max(idxs) + 1))
        want = {
            k: w
            for k, (w, _) in cooccur_edges_oracle(
                ms, 1, "sentences", sent_list, bounds
            ).items()
        }
        assert got.get(doc_id, {}) == want, doc_id


def test_distributed_generator_matches_driver_side(spark):
    dist = corpus.generate_documents(spark, 8, seed=9).collect()
    pdf = corpus.generate_documents_pdf(8, seed=9)
    want = {
        r["doc_id"]: [tuple(s) for s in r["spans"]] for _, r in pdf.iterrows()
    }
    got = {
        r["doc_id"]: [(s.kind, s.text, s.media_ref, s.offset) for s in r["spans"]]
        for r in dist
    }
    assert got == want
