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


def test_pipeline_edge_case_documents(spark, tmp_path):
    """Degenerate inputs through the FULL staged pipeline: empty text,
    media-only spans, no-mention docs, and a normal doc — no stage may
    crash, and the normal doc still yields triples."""
    from renard_spark.run import build_runner

    def spans(*items):
        return [
            {"kind": k, "text": t, "media_ref": m, "offset": o}
            for (k, t, m, o) in items
        ]

    rows = [
        ("empty", spans(("text", "", None, 0))),
        ("media_only", spans(("image", None, "img://m/0", 0))),
        ("no_mentions", spans(("text", "nothing to see here.", None, 0))),
        (
            "normal",
            spans(
                ("text", "Elizabeth Bennet talked with Jane Bennet. ", None, 0),
                ("image", None, "img://n/0", 42),
                ("text", "Elizabeth Bennet danced with Jane Bennet.", None, 42),
            ),
        ),
    ]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField(
                "spans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("kind", T.StringType()),
                            T.StructField("text", T.StringType(), True),
                            T.StructField("media_ref", T.StringType(), True),
                            T.StructField("offset", T.IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )
    docs = spark.createDataFrame(rows, schema)
    runner = build_runner(spark, docs, str(tmp_path / "edge_kg"))
    out = runner.run()

    trip = out["triples"].collect()
    assert {r.doc_id for r in trip} == {"normal"}
    assert len(trip) > 0
    # media grounding: the normal doc's image links to a mention; the
    # media-only doc (no mentions) drops out
    ml = {r.doc_id for r in out["media_links"].collect()}
    assert ml == {"normal"}
    # lineage preserves every input row, including the degenerate ones
    assert out["lineage"].count() == 4
