"""Round-4 session-6 operators: SPARQL SELECT solution modifiers,
k-anonymity / l-diversity audit, asymmetric containment near-dup,
ER threshold sweep."""

import pytest
from pyspark.sql import functions as F

from renard_spark.functions.dedup import containment_pairs, threshold_sweep
from renard_spark.functions.kgquery import bgp_match, select_solutions
from renard_spark.functions.profile import k_anonymity

TRIPLES = [
    # a near-star KG: n1 scans everything, n2 scans two, n3 scans one
    ("n1", "scans", "x1"), ("n1", "scans", "x2"), ("n1", "scans", "x3"),
    ("n2", "scans", "x1"), ("n2", "scans", "x1"),  # dup collapses
    ("n2", "sorts", "x2"),
    ("n3", "reads", "x1"),  # filtered out by VALUES
    ("n3", "scans", "x9"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string"
    ).distinct()


class TestSelectSolutions:
    def test_grouped_aggregates_having_order_limit(self, spark, triples):
        b = bgp_match(triples, [("?a", "?r", "?b")])
        out = select_solutions(
            b,
            values=(["?r"], [("scans",), ("sorts",)]),
            group_by=["?a"],
            aggregates=[
                ("count", "*", "n"),
                ("count_distinct", "?b", "partners"),
                ("group_concat", "?r", "rels"),
                ("sample", "?b", "first_partner"),
            ],
            having=["n >= 2"],
            order_by=["DESC(n)", "?a"],
            limit=10,
        ).collect()
        # n3 has 1 qualifying triple (reads is VALUES-excluded) -> cut
        assert [(r["a"], r["n"]) for r in out] == [("n1", 3), ("n2", 2)]
        n1 = out[0]
        assert n1["partners"] == 3
        assert n1["rels"] == "scans scans scans"
        assert n1["first_partner"] == "x1"
        n2 = out[1]
        assert n2["rels"] == "scans sorts"

    def test_implicit_single_group(self, spark, triples):
        b = bgp_match(triples, [("?a", "scans", "?b")])
        out = select_solutions(
            b, aggregates=[("count", "*", "n"), ("max", "?b", "top")]
        ).collect()
        assert len(out) == 1
        assert out[0]["n"] == 5  # distinct (a, b) scans pairs
        assert out[0]["top"] == "x9"

    def test_values_undef_rejected(self, spark, triples):
        b = bgp_match(triples, [("?a", "?r", "?b")])
        with pytest.raises(ValueError, match="UNDEF"):
            select_solutions(b, values=(["?r"], [(None,)]))

    def test_values_unbound_var_rejected(self, spark, triples):
        b = bgp_match(triples, [("?a", "scans", "?b")])
        with pytest.raises(ValueError, match="not bound"):
            select_solutions(b, values=(["?zzz"], [("x",)]))

    def test_group_by_without_aggregates_rejected(self, spark, triples):
        b = bgp_match(triples, [("?a", "?r", "?b")])
        with pytest.raises(ValueError, match="group_by"):
            select_solutions(b, group_by=["?a"])

    def test_unknown_aggregate_rejected(self, spark, triples):
        b = bgp_match(triples, [("?a", "?r", "?b")])
        with pytest.raises(ValueError, match="unsupported"):
            select_solutions(b, aggregates=[("median", "?a", "m")])

    def test_distinct_projection(self, spark, triples):
        b = bgp_match(triples, [("?a", "?r", "?b")]).select("r")
        out = select_solutions(b, distinct=True, order_by=["?r"]).collect()
        assert [r["r"] for r in out] == ["reads", "scans", "sorts"]


class TestKAnonymity:
    def test_classes_and_risk(self, spark):
        rows = [
            ("a", 1, "s1"), ("a", 1, "s1"), ("a", 1, "s2"),
            ("b", 1, "s3"),
        ]
        df = spark.createDataFrame(rows, "q1 string, q2 int, sens string")
        out = {
            (r["q1"], r["q2"]): r
            for r in k_anonymity(df, ["q1", "q2"], "sens").collect()
        }
        assert out[("a", 1)]["k"] == 3
        assert out[("a", 1)]["l"] == 2
        assert out[("a", 1)]["risk"] == pytest.approx(1 / 3, abs=1e-6)
        # the singleton class is the k=1 privacy violation
        assert out[("b", 1)]["k"] == 1
        assert out[("b", 1)]["risk"] == 1.0

    def test_no_sensitive_column(self, spark):
        df = spark.createDataFrame([("a",), ("a",)], "q string")
        out = k_anonymity(df, ["q"]).collect()
        assert out[0]["l"] == 0 and out[0]["k"] == 2

    def test_empty_quasi_rejected(self, spark):
        df = spark.createDataFrame([("a",)], "q string")
        with pytest.raises(ValueError):
            k_anonymity(df, [])


class TestContainmentPairs:
    def test_subset_doc_has_asymmetric_containment(self, spark):
        small = "alpha beta gamma delta epsilon"
        big = small + " zeta eta theta iota kappa lam mu nu xi omicron"
        docs = spark.createDataFrame(
            [(1, small), (2, big), (3, "totally unrelated words here")],
            "doc_id long, text string",
        )
        out = containment_pairs(docs, w=3, threshold=0.5).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["doc_a"], r["doc_b"]) == (1, 2)
        # every shingle of the small doc is in the big one
        assert r["cont_a"] == 1.0
        # but the big doc is NOT contained in the small one
        assert r["cont_b"] < 0.5

    def test_df_cap_drops_boilerplate_shingles(self, spark):
        # the same 3-token boilerplate in every doc; with max_df=2 it
        # leaves the vocabulary entirely, so no doc pairs survive
        docs = spark.createDataFrame(
            [(i, f"common boiler plate unique{i} word{i} tail{i}")
             for i in range(4)],
            "doc_id long, text string",
        )
        out = containment_pairs(docs, w=3, threshold=0.1, max_df=2)
        assert out.count() == 0


class TestThresholdSweep:
    def test_curve_matches_hand_computation(self, spark):
        # 3 distinct scores; gold: both 0.9s and one 0.5
        pairs = spark.createDataFrame(
            [(0.9, 1), (0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0)],
            "score double, label int",
        )
        out = {
            r["threshold"]: r
            for r in threshold_sweep(pairs, "score", "label").collect()
        }
        assert out[0.9]["tp"] == 2 and out[0.9]["fp"] == 0
        assert out[0.9]["precision"] == 1.0
        assert out[0.9]["recall"] == pytest.approx(2 / 3, abs=1e-6)
        assert out[0.5]["tp"] == 3 and out[0.5]["fp"] == 1
        assert out[0.5]["precision"] == 0.75
        assert out[0.5]["recall"] == 1.0
        assert out[0.1]["fp"] == 2 and out[0.1]["fn"] == 0

    def test_total_positives_counts_blocking_misses(self, spark):
        pairs = spark.createDataFrame(
            [(0.9, 1)], "score double, label int"
        )
        out = threshold_sweep(
            pairs, "score", "label", total_positives=4
        ).collect()[0]
        assert out["tp"] == 1 and out["fn"] == 3
        assert out["recall"] == 0.25
