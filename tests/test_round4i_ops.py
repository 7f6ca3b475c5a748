"""Round-4 session-7 operators: SPARQL ASK / DESCRIBE (completing the
four SPARQL 1.1 query forms) and earliest-arrival temporal
reachability over dynamic narrative networks."""

import pytest
from pyspark.sql import functions as F

from renard_spark.functions.graph import temporal_reachability
from renard_spark.functions.kgquery import ask, bgp_match, describe

TRIPLES = [
    ("n1", "scans", "x1"), ("n1", "scans", "x2"),
    ("n2", "sorts", "x1"),
    ("x1", "scans", "n2"),  # x1 and n2 appear on both sides
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string"
    ).distinct()


class TestAsk:
    def test_hit(self, spark, triples):
        rows = ask(triples, [("?a", "scans", "?b")]).collect()
        assert len(rows) == 1 and rows[0]["answer"] is True

    def test_miss(self, spark, triples):
        rows = ask(triples, [("?a", "never", "?b")]).collect()
        assert len(rows) == 1 and rows[0]["answer"] is False

    def test_join_pattern(self, spark, triples):
        # ?a scans ?b . ?b sorts ?c — only n1 scans x2?? n2 sorts x1,
        # so the join hits via ?b = n2 ... x1 scans n2, n2 sorts x1
        rows = ask(
            triples, [("?a", "scans", "?b"), ("?b", "sorts", "?c")]
        ).collect()
        assert rows[0]["answer"] is True

    def test_prebuilt_bindings(self, spark, triples):
        b = bgp_match(triples, [("?a", "sorts", "?b")])
        assert ask(b).collect()[0]["answer"] is True
        assert ask(b.filter(F.lit(False))).collect()[0]["answer"] is False


class TestDescribe:
    def test_both_roles(self, spark, triples):
        out = describe(triples, ["x1"]).collect()
        roles = {(r["role"], r["subj"], r["pred"], r["obj"]) for r in out}
        assert ("subj", "x1", "scans", "n2") in roles
        assert ("obj", "n1", "scans", "x1") in roles
        assert ("obj", "n2", "sorts", "x1") in roles
        assert len(out) == 3
        assert all(r["resource"] == "x1" for r in out)

    def test_multi_resource_and_df_variant(self, spark, triples):
        lst = describe(triples, ["x1", "n1"])
        res_df = spark.createDataFrame([("x1",), ("n1",)], ["r"])
        via_df = describe(triples, res_df)
        assert sorted(map(tuple, lst.collect())) == sorted(
            map(tuple, via_df.collect())
        )
        assert lst.filter(F.col("resource") == "n1").count() == 2

    def test_empty_rejected(self, spark, triples):
        with pytest.raises(ValueError):
            describe(triples, [])


DYN = [
    # doc d1: A-B at w1, B-C at w0 (too early to relay), B-D at w2,
    # D-E at w2 (equal window: waiting is free, arrival at w2 relays)
    ("d1", 1, "A", "B"),
    ("d1", 0, "B", "C"),
    ("d1", 2, "B", "D"),
    ("d1", 2, "D", "E"),
    # doc d2 reuses the SAME node names with different timing — doc
    # scoping must keep the two universes apart
    ("d2", 0, "A", "B"),
    ("d2", 1, "B", "C"),
]


@pytest.fixture(scope="module")
def dyn(spark):
    return spark.createDataFrame(
        DYN, "doc_id string, window_id int, src string, dst string"
    )


class TestTemporalReachability:
    def test_time_respecting_not_static(self, spark, dyn):
        srcs = spark.createDataFrame([("d1", "A")], ["doc_id", "source"])
        out = {
            r["node"]: r["arrive"]
            for r in temporal_reachability(dyn, srcs).collect()
        }
        # static reachability would include C (A-B w1, B-C w0);
        # time-respecting must NOT: you reach B at w1, the B-C edge
        # is in the past
        assert out == {"A": -1, "B": 1, "D": 2, "E": 2}

    def test_doc_scoped(self, spark, dyn):
        srcs = spark.createDataFrame(
            [("d1", "A"), ("d2", "A")], ["doc_id", "source"]
        )
        out = temporal_reachability(dyn, srcs)
        d2 = {
            r["node"]: r["arrive"]
            for r in out.filter(F.col("doc_id") == "d2").collect()
        }
        # d2's B-C is at w1 >= arrival(B)=0, so C IS reachable here
        assert d2 == {"A": -1, "B": 0, "C": 1}

    def test_multi_source(self, spark, dyn):
        srcs = spark.createDataFrame(
            [("d1", "A"), ("d1", "C")], ["doc_id", "source"]
        )
        out = temporal_reachability(dyn, srcs)
        from_c = {
            r["node"]: r["arrive"]
            for r in out.filter(F.col("source") == "C").collect()
        }
        # from C: B at w0, then every later edge relays
        assert from_c == {"C": -1, "B": 0, "A": 1, "D": 2, "E": 2}

    def test_fixed_iters_match_fixpoint(self, spark, dyn):
        srcs = spark.createDataFrame([("d1", "A")], ["doc_id", "source"])
        fixed = temporal_reachability(dyn, srcs, iters=4)
        fixp = temporal_reachability(dyn, srcs)
        assert sorted(map(tuple, fixed.collect())) == sorted(
            map(tuple, fixp.collect())
        )


PATH_TRIPLES = [
    ("a", "p", "b"), ("b", "p", "c"), ("c", "q", "d"), ("a", "r", "x"),
]
PATH_UNIVERSE = {"a", "b", "c", "d", "x"}


@pytest.fixture(scope="module")
def ptriples(spark):
    return spark.createDataFrame(
        PATH_TRIPLES, "subj string, pred string, obj string"
    )


def _pairs(df):
    return {(r["s"], r["o"]) for r in df.collect()}


class TestPathAlgebra:
    def test_parse_precedence(self):
        from renard_spark.functions.kgquery import parse_path

        # postfix > ^ > / > |
        assert parse_path("^a/b+|c") == (
            "alt", ("seq", ("inv", "a"), ("plus", "b")), "c"
        )
        assert parse_path("a/(b|c)") == ("seq", "a", ("alt", "b", "c"))
        assert parse_path("(a|b)/c") == ("seq", ("alt", "a", "b"), "c")
        with pytest.raises(ValueError):
            parse_path("a//b")
        with pytest.raises(ValueError):
            parse_path("!(a+)")

    def test_predicate_inverse_seq_alt(self, spark, ptriples):
        from renard_spark.functions.kgquery import eval_path

        assert _pairs(eval_path(ptriples, "p")) == {("a", "b"), ("b", "c")}
        assert _pairs(eval_path(ptriples, "^p")) == {("b", "a"), ("c", "b")}
        assert _pairs(eval_path(ptriples, "p/q")) == {("b", "d")}
        assert _pairs(eval_path(ptriples, "p|q")) == {
            ("a", "b"), ("b", "c"), ("c", "d")
        }

    def test_closures_and_zero_length(self, spark, ptriples):
        from renard_spark.functions.kgquery import eval_path

        assert _pairs(eval_path(ptriples, "p+")) == {
            ("a", "b"), ("b", "c"), ("a", "c")
        }
        ident = {(x, x) for x in PATH_UNIVERSE}
        assert _pairs(eval_path(ptriples, "p*")) == {
            ("a", "b"), ("b", "c"), ("a", "c")
        } | ident
        assert _pairs(eval_path(ptriples, "q?")) == {("c", "d")} | ident

    def test_negated_set_and_composite(self, spark, ptriples):
        from renard_spark.functions.kgquery import eval_path

        assert _pairs(eval_path(ptriples, "!(p|r)")) == {("c", "d")}
        # p+/q : reach c via p's, then q to d
        assert _pairs(eval_path(ptriples, "p+/q")) == {("b", "d"), ("a", "d")}
        # ^q/^p : d back to b
        assert _pairs(eval_path(ptriples, "^q/^p")) == {("d", "b")}

    def test_ast_input_matches_string(self, spark, ptriples):
        from renard_spark.functions.kgquery import eval_path

        assert _pairs(eval_path(ptriples, ("plus", "p"))) == _pairs(
            eval_path(ptriples, "p+")
        )


class TestPathInBgp:
    def test_path_predicate_in_pattern(self, spark, ptriples):
        # ?x (p+/q) ?y inside a BGP alongside a plain pattern
        out = bgp_match(
            ptriples, [("?x", "p+/q", "?y"), ("?x", "p", "?z")]
        )
        rows = {(r["x"], r["y"], r["z"]) for r in out.collect()}
        # p+/q pairs: (a,d),(b,d); both a and b also have a plain p edge
        assert rows == {("a", "d", "b"), ("b", "d", "c")}

    def test_plain_plus_still_works(self, spark, ptriples):
        out = bgp_match(ptriples, [("a", "p+", "?y")])
        assert {r["y"] for r in out.collect()} == {"b", "c"}

    def test_inverse_path_predicate(self, spark, ptriples):
        out = bgp_match(ptriples, [("d", "^q", "?y")])
        assert {r["y"] for r in out.collect()} == {"c"}


QUADS = [
    # graph g1: a chain a-p->b-p->c ; graph g2: only a-p->c directly
    ("g1", "a", "p", "b"), ("g1", "b", "p", "c"),
    ("g2", "a", "p", "c"), ("g2", "c", "q", "d"),
]


@pytest.fixture(scope="module")
def quads(spark):
    return spark.createDataFrame(
        QUADS, "g string, subj string, pred string, obj string"
    )


class TestGraphQuads:
    def test_shared_graph_var_scopes_join(self, spark, quads):
        # ?x p ?y . ?y p ?z WITHIN one graph: only g1 has a 2-chain
        out = bgp_match(
            quads,
            [("?g", "?x", "p", "?y"), ("?g", "?y", "p", "?z")],
            graph="g",
        )
        rows = {(r["g"], r["x"], r["y"], r["z"]) for r in out.collect()}
        assert rows == {("g1", "a", "b", "c")}

    def test_constant_graph_term(self, spark, quads):
        out = bgp_match(quads, [("g2", "?x", "p", "?y")], graph="g")
        assert {(r["x"], r["y"]) for r in out.collect()} == {("a", "c")}

    def test_mixed_triple_and_quad_patterns(self, spark, quads):
        # cross-graph triple pattern joined with a graph-bound one
        out = bgp_match(
            quads,
            [("?x", "q", "?w"), ("?g", "?y", "p", "?x")],
            graph="g",
        )
        rows = {(r["g"], r["y"], r["x"], r["w"]) for r in out.collect()}
        assert rows == {("g1", "b", "c", "d"), ("g2", "a", "c", "d")}

    def test_quad_requires_graph_kwarg(self, spark, quads):
        with pytest.raises(ValueError):
            bgp_match(quads, [("?g", "?x", "p", "?y")])

    def test_composite_path_rejected_in_quad(self, spark, quads):
        # `p+` IS supported in quads (grouped closure); the composite
        # grammar is not — TestGroupedClosure covers both sides
        with pytest.raises(ValueError):
            bgp_match(quads, [("?g", "?x", "^p", "?y")], graph="g")


class TestVoidStats:
    def test_functionality(self, spark, ptriples):
        from renard_spark.functions.kgquery import void_stats

        rows = {r["pred"]: r for r in void_stats(ptriples).collect()}
        # p: 2 triples, 2 subjects, 2 objects -> functionality 1.0
        assert rows["p"]["n_triples"] == 2
        assert rows["p"]["functionality"] == 1.0
        assert rows["p"]["inverse_functionality"] == 1.0
        assert rows["q"]["n_triples"] == 1
        assert set(rows) == {"p", "q", "r"}

    def test_non_functional_predicate(self, spark):
        from renard_spark.functions.kgquery import void_stats

        t = spark.createDataFrame(
            [("s1", "p", "o1"), ("s1", "p", "o2"), ("s2", "p", "o2")],
            "subj string, pred string, obj string",
        )
        r = void_stats(t).collect()[0]
        assert r["n_triples"] == 3 and r["n_subjects"] == 2
        assert r["functionality"] == round(2 / 3, 6)
        assert r["inverse_functionality"] == round(2 / 3, 6)


class TestGroupedClosure:
    def test_per_group_isolation(self, spark, quads):
        from renard_spark.functions.graph import grouped_transitive_closure

        e = quads.filter(F.col("pred") == "p").select(
            "g", F.col("subj").alias("src"), F.col("obj").alias("dst")
        )
        out = grouped_transitive_closure(e, group="g")
        rows = {(r["g"], r["src"], r["dst"]) for r in out.collect()}
        # g1 chain closes to (a,c); g2's direct (a,c) stays alone —
        # no cross-graph relay
        assert rows == {
            ("g1", "a", "b"), ("g1", "b", "c"), ("g1", "a", "c"),
            ("g2", "a", "c"),
        }

    def test_plus_inside_quad_pattern(self, spark, quads):
        out = bgp_match(
            quads, [("?g", "?x", "p+", "?y")], graph="g"
        )
        rows = {(r["g"], r["x"], r["y"]) for r in out.collect()}
        assert rows == {
            ("g1", "a", "b"), ("g1", "b", "c"), ("g1", "a", "c"),
            ("g2", "a", "c"),
        }

    def test_composite_path_still_rejected_in_quad(self, spark, quads):
        with pytest.raises(ValueError):
            bgp_match(quads, [("?g", "?x", "p/q", "?y")], graph="g")


class TestFilterExists:
    def test_exists_keeps_matching(self, spark, ptriples):
        # ?x p ?y FILTER EXISTS { ?y p ?z }: only (a,b) — b has p-out
        out = bgp_match(
            ptriples, [("?x", "p", "?y")], exists=[[("?y", "p", "?z")]]
        )
        assert {(r["x"], r["y"]) for r in out.collect()} == {("a", "b")}

    def test_not_exists_drops_matching(self, spark, ptriples):
        out = bgp_match(
            ptriples, [("?x", "p", "?y")],
            not_exists=[[("?y", "p", "?z")]],
        )
        assert {(r["x"], r["y"]) for r in out.collect()} == {("b", "c")}

    def test_semi_join_no_duplication(self, spark, ptriples):
        # a has TWO outgoing edges (p and r); EXISTS must not
        # duplicate the (x=?, y=a)-free solutions — use ?x p ?y with
        # EXISTS {?x ?r ?w}: x in {a,b}, both have outgoing, so the
        # result equals the required part exactly (no fan-out)
        out = bgp_match(
            ptriples, [("?x", "p", "?y")], exists=[[("?x", "?r", "?w")]]
        )
        assert sorted((r["x"], r["y"]) for r in out.collect()) == [
            ("a", "b"), ("b", "c")
        ]

    def test_uncorrelated_exists_is_global_gate(self, spark, ptriples):
        hit = bgp_match(
            ptriples, [("?x", "p", "?y")], exists=[[("c", "q", "d")]]
        )
        assert hit.count() == 2
        miss = bgp_match(
            ptriples, [("?x", "p", "?y")], exists=[[("c", "q", "zzz")]]
        )
        assert miss.count() == 0
        # NOT EXISTS flips it — and differs from MINUS, which would
        # be rejected (disjoint) rather than remove everything
        neg = bgp_match(
            ptriples, [("?x", "p", "?y")], not_exists=[[("c", "q", "d")]]
        )
        assert neg.count() == 0
