"""Round-5 additions: DistMult / ComplEx scoring models and
keep-first paragraph dedup.

- DistMult (Yang et al. '15): bilinear-diagonal Σ hᵢrᵢtᵢ — exact
  hand-computed fixed-point on an injected embedding table, and the
  family's defining SYMMETRY distmult(s,p,o) == distmult(o,p,s).
- ComplEx (Trouillon et al. '16): Re(<h, r, t̄>) — hand-computed
  complex arithmetic, and the defining ASYMMETRY under s/o swap.
- paragraph_dedup: C4/RefinedWeb keep-FIRST corpus dedup vs
  remove_boilerplate's drop-every-copy semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from renard_spark.functions.dedup import paragraph_dedup
from renard_spark.functions.kgembed import score_triples

_SCALE = 4294967296


def _emb(spark, rows):
    return spark.createDataFrame(rows, "name string, vec array<double>")


def test_distmult_table_mode_exact(spark):
    triples = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    ee = _emb(spark, [("a", [1.0, 2.0]), ("b", [5.0, 6.0])])
    re_ = _emb(spark, [("p", [3.0, 4.0])])
    out = score_triples(
        triples, dim=2, entity_embeddings=ee, relation_embeddings=re_,
        model="distmult",
    ).first()
    # 1*3*5 + 2*4*6 = 63; per-term rounding is exact on integers
    assert out["score_fp"] == 63 * _SCALE
    assert out["distmult_score"] == 63.0


def test_distmult_is_symmetric_in_subject_object(spark):
    fwd = spark.createDataFrame(
        [("x", "p", "y")], "subj string, pred string, obj string"
    )
    rev = spark.createDataFrame(
        [("y", "p", "x")], "subj string, pred string, obj string"
    )
    sf = score_triples(fwd, dim=8, model="distmult").first()["score_fp"]
    sr = score_triples(rev, dim=8, model="distmult").first()["score_fp"]
    assert sf == sr


def test_complex_table_mode_exact(spark):
    # dim 2: slot 0 = real part, slot 1 = imaginary part.
    # h = 1+2i, r = 3+4i, t = 5+6i:
    # Re(h·r·t̄) = 1*3*5 + 2*3*6 + 1*4*6 - 2*4*5 = 15+36+24-40 = 35
    triples = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    ee = _emb(spark, [("a", [1.0, 2.0]), ("b", [5.0, 6.0])])
    re_ = _emb(spark, [("p", [3.0, 4.0])])
    out = score_triples(
        triples, dim=2, entity_embeddings=ee, relation_embeddings=re_,
        model="complex",
    ).first()
    assert out["score_fp"] == 35 * _SCALE
    assert out["complex_score"] == 35.0


def test_complex_is_asymmetric_in_subject_object(spark):
    fwd = spark.createDataFrame(
        [("x", "p", "y")], "subj string, pred string, obj string"
    )
    rev = spark.createDataFrame(
        [("y", "p", "x")], "subj string, pred string, obj string"
    )
    sf = score_triples(fwd, dim=8, model="complex").first()["score_fp"]
    sr = score_triples(rev, dim=8, model="complex").first()["score_fp"]
    assert sf != sr  # hash vectors are generic — a tie would be a bug


def test_complex_odd_dim_and_bad_model_raise(spark):
    t = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    with pytest.raises(ValueError, match="even dim"):
        score_triples(t, dim=7, model="complex").collect()
    with pytest.raises(ValueError, match="transe, distmult or complex"):
        score_triples(t, dim=8, model="rotate")


def test_paragraph_dedup_keep_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared line\nbeta"),
            (2, "shared line\ngamma\nshared line"),
            (3, "delta\nshared line"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs).collect()
    }
    # doc 1 holds the corpus-first copy of "shared line": keeps all 3
    assert rows[1]["clean_text"] == "alpha shared line beta"
    assert (rows[1]["n_kept"], rows[1]["n_dropped"]) == (3, 0)
    # doc 2: both copies are later than doc 1's → only gamma survives
    assert rows[2]["clean_text"] == "gamma"
    assert (rows[2]["n_kept"], rows[2]["n_dropped"]) == (1, 2)
    # doc 3: the duplicate goes, own line stays
    assert rows[3]["clean_text"] == "delta"
    assert (rows[3]["n_kept"], rows[3]["n_dropped"]) == (1, 1)


def test_paragraph_dedup_within_doc_and_order(spark):
    docs = spark.createDataFrame(
        [(7, "x\n\n  \nx\ny\nx")], "doc_id long, text string"
    )
    row = paragraph_dedup(docs).first()
    # whitespace-only units ignored; within-doc repeats dedup too,
    # survivors keep original order
    assert row["clean_text"] == "x y"
    assert (row["n_kept"], row["n_dropped"]) == (2, 2)


def test_rank_fusion_ranks_are_permutations_and_fused(spark):
    from renard_spark.functions.kgembed import rank_fusion

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a"),
         ("a", "q", "c"), ("a", "p", "b")],  # dup collapses
        "subj string, pred string, obj string",
    )
    rows = rank_fusion(t, dim=8).collect()
    assert len(rows) == 4
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r["pred"], []).append(r)
    # each model's ranks are a 1..n permutation within the predicate
    for pred, grp in by_pred.items():
        n = len(grp)
        for col in ("rank_transe", "rank_distmult", "rank_complex"):
            assert sorted(r[col] for r in grp) == list(range(1, n + 1))
    # fused score is exactly the per-term rounded reciprocal-rank sum
    for r in rows:
        want = sum(
            round(4294967296.0 / (60.0 + r[c]))
            for c in ("rank_transe", "rank_distmult", "rank_complex")
        )
        assert r["rrf_fp"] == want


def test_louvain_moves_separates_cliques(spark):
    from renard_spark.functions.graph import louvain_moves

    # two triangles bridged by one weak edge — the canonical
    # two-community graph; after two synchronous rounds each triangle
    # must share one community and the bridge must NOT merge them
    edges = spark.createDataFrame(
        [
            ("a", "b", 3), ("b", "c", 3), ("a", "c", 3),
            ("x", "y", 3), ("y", "z", 3), ("x", "z", 3),
            ("c", "x", 1),
        ],
        "src string, dst string, weight long",
    )
    out = {r["node"]: r["community"] for r in louvain_moves(edges, iters=2).collect()}
    assert len(out) == 6
    assert out["a"] == out["b"] == out["c"]
    assert out["x"] == out["y"] == out["z"]
    assert out["a"] != out["x"]


def test_louvain_moves_partition_invariant(spark):
    from renard_spark.functions.graph import louvain_moves

    edges = spark.createDataFrame(
        [("n%d" % i, "n%d" % ((i * 7 + 1) % 20), 1 + i % 3)
         for i in range(40)],
        "src string, dst string, weight long",
    ).filter("src <> dst")
    a = sorted(map(tuple, louvain_moves(edges, iters=2).collect()))
    b = sorted(map(tuple,
                   louvain_moves(edges.repartition(13), iters=2).collect()))
    assert a == b  # integer scores + explicit tie-breaks → layout-proof
