"""Deterministic filtered negative sampling (operators/triples.
negative_samples) — the KG-embedding training-pair generator."""

import hashlib

from renard_spark.operators.triples import negative_samples


def _spark_triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


TRIPLES = [
    ("alice", "knows", "bob"),
    ("alice", "knows", "carol"),
    ("bob", "knows", "carol"),
    ("carol", "likes", "dave"),
    ("dave", "knows", "erin"),
]


def _expected(rows, k):
    """Pure-python twin of the sampling contract."""
    pos = sorted(set(rows))
    ents = sorted({s for s, _, _ in pos} | {o for _, _, o in pos})
    out = []
    for s, p, o in pos:
        for i in range(k):
            key = f"neg:{i}|{s}|{p}|{o}"
            slot = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % len(ents)
            cand = ents[slot]
            if cand == s or (s, p, cand) in set(pos):
                continue
            out.append((s, p, o, i, cand))
    return sorted(out)


def test_negative_samples_match_pure_twin(spark):
    got = sorted(
        tuple(r)
        for r in negative_samples(_spark_triples(spark, TRIPLES), k=3).collect()
    )
    assert got == _expected(TRIPLES, 3)
    # filtered semantics: no survivor collides with a positive or self
    pos = set(TRIPLES)
    for s, p, _o, _i, cand in got:
        assert cand != s and (s, p, cand) not in pos


def test_negative_samples_partition_invariant(spark):
    """Same survivors regardless of input partitioning / duplication —
    the determinism a task retry or AQE re-plan must not break."""
    df1 = _spark_triples(spark, TRIPLES).repartition(1)
    df7 = _spark_triples(spark, TRIPLES * 3).repartition(7)  # dups collapse
    a = sorted(tuple(r) for r in negative_samples(df1, k=2).collect())
    b = sorted(tuple(r) for r in negative_samples(df7, k=2).collect())
    assert a == b and len(a) > 0


def test_relation_paths_composition(spark):
    """Hand-built typed edges → 2-hop paths with midpoint count and
    bottleneck support; self-paths excluded."""
    from renard_spark.operators.relations import relation_paths

    edges = spark.createDataFrame(
        [
            ("d", "a", "knows", "m1", 3),
            ("d", "a", "knows", "m2", 1),
            ("d", "m1", "likes", "b", 2),
            ("d", "m2", "likes", "b", 5),
            ("d", "m1", "likes", "a", 9),   # would be a self-path a->..->a
            ("e", "a", "knows", "m1", 1),   # other doc: no second hop
        ],
        "doc_id string, subj_char string, rel string, obj_char string, n long",
    )
    got = sorted(tuple(r) for r in relation_paths(edges).collect())
    # a-knows->m1-likes->b (min(3,2)=2) and a-knows->m2-likes->b
    # (min(1,5)=1): one grouped row, 2 midpoints, support 3.
    # m1-likes->a has no outgoing edge from a EXCEPT a->m1/m2 (knows):
    # m1 -likes-> a -knows-> m1 is a self-path (obj==subj) → excluded
    # for m1, but m1 -likes-> a -knows-> m2 survives.
    assert got == [
        ("d", "a", "knows", "likes", "b", 2, 3),
        ("d", "m1", "likes", "knows", "m2", 1, 1),
    ]


def test_mention_contexts_clamped_snippets(spark):
    """±w snippets clamp at document bounds; mention columns pass
    through; snippet is the exact token window."""
    from renard_spark.operators.tokenize import doc_tokens, tokens
    from renard_spark.operators.utils import mention_contexts
    from renard_spark.sources.ingest import normalize_documents

    docs = spark.createDataFrame(
        [("1", "a b c d e f g h")], "doc_id string, text string"
    )
    toks = tokens(normalize_documents(docs))
    ments = spark.createDataFrame(
        [("1", 0, 1, "a"), ("1", 4, 5, "e"), ("1", 7, 8, "h")],
        "doc_id string, start_idx int, end_idx int, mention_str string",
    )
    got = {
        r["mention_str"]: (r["ctx_start"], r["snippet"])
        for r in mention_contexts(ments, doc_tokens(toks), w=2).collect()
    }
    assert got == {
        "a": (0, "a b c"),
        "e": (2, "c d e f g"),
        "h": (5, "f g h"),
    }


def test_edit_distance_verify_threshold_and_ratio(spark):
    """Thresholded verification: pairs past max_dist drop (the -1
    early exit), ratio is dist over the longer text."""
    from renard_spark.functions.dedup import edit_distance_verify

    docs = spark.createDataFrame(
        [
            (1, "abcdefghij"),
            (2, "abcdefghiX"),   # dist 1 from doc 1
            (3, "zzzzzzzzzz"),   # dist 10 from doc 1
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["dist"], r["ratio"])
        for r in edit_distance_verify(cands, docs, max_dist=5).collect()
    }
    assert got == {(1, 2): (1, 0.1)}


def test_mine_rules_amie_golden(spark):
    """Hand-computed AMIE support/body/PCA on a 5-fact KG.

    Facts: knows(a,b), knows(b,c), likes(a,c), knows(a,c), likes(c,d).
    Paths (x -r1-> m -r2-> y, y != x), distinct:
      a-knows-b, b-knows-c  -> (a, knows, knows, c)
      a-knows-c? via m=c: c has likes(c,d): (a, knows, likes, d) [from
        knows(a,c)] and (b, knows, likes, d) [from knows(b,c)] and
        (a, likes, likes, d) [from likes(a,c)]
    Rule (knows, knows => knows): body {(a,c)}, closed by knows(a,c)
      -> support 1, n_body 1, conf 1.0; PCA: a has knows edges
      -> n_pca 1, pca_conf 1.0.
    Rule (knows, knows => likes): likes(a,c) also closes (a,c)
      -> support 1; PCA: a has likes -> n_pca 1.
    Rule (knows, likes => ?): body {(a,d), (b,d)} n_body 2, no head
      facts close them -> no support rows (min_support=1 drops them).
    """
    from renard_spark.operators.relations import mine_rules

    edges = spark.createDataFrame(
        [
            (1, "a", "knows", "b", 1),
            (1, "b", "knows", "c", 2),
            (2, "a", "likes", "c", 1),
            (2, "a", "knows", "c", 1),
            (1, "c", "likes", "d", 1),
        ],
        "doc_id long, subj_char string, rel string, obj_char string, n long",
    )
    got = {
        (r["rel1"], r["rel2"], r["rel3"]): (
            r["support"], r["n_body"], r["n_pca"], r["conf"], r["pca_conf"]
        )
        for r in mine_rules(edges).collect()
    }
    assert got == {
        ("knows", "knows", "knows"): (1, 1, 1, 1.0, 1.0),
        ("knows", "knows", "likes"): (1, 1, 1, 1.0, 1.0),
    }
