"""Round-4 session-8 operators: SPARQL 1.1 subqueries (join_solutions)
+ BIND (select_solutions bind=), and the oracle-gated deterministic
scorer for the SpacyCoreferee chunked-coref variant."""

import pytest
from pyspark.sql import functions as F

from renard_spark.functions.kgquery import (
    bgp_match,
    join_solutions,
    select_solutions,
    update_where,
)
from renard_spark.operators.coref import coreferee_corefs, coreferee_doc_corefs

TRIPLES = [
    ("n1", "scans", "x1"), ("n1", "scans", "x2"),
    ("n2", "scans", "x1"),
    ("n1", "audits", "x9"),  # rare predicate — excluded by HAVING
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string"
    ).distinct()


class TestSubquery:
    def test_popular_predicate_subselect(self, spark, triples):
        outer = bgp_match(triples, [("?a", "?p", "?b")])
        inner = select_solutions(
            bgp_match(triples, [("?x", "?p", "?y")]),
            group_by=["?p"],
            aggregates=[("count", "*", "n")],
            having=["n >= 2"],
        )
        rows = join_solutions(outer, inner).collect()
        # the three 'scans' triples survive, each carrying n=3;
        # the lone 'audits' triple is excluded by HAVING
        assert len(rows) == 3
        assert all(r["p"] == "scans" and r["n"] == 3 for r in rows)

    def test_no_shared_variable_rejected(self, spark, triples):
        outer = bgp_match(triples, [("?a", "scans", "?b")])
        inner = select_solutions(
            bgp_match(triples, [("?x", "?q", "?y")]),
            group_by=["?q"],
            aggregates=[("count", "*", "n")],
        ).select("n")  # drops every shared column
        with pytest.raises(ValueError, match="cartesian"):
            join_solutions(outer, inner)

    def test_shared_vars_join_on_all(self, spark, triples):
        # inner restricts (a, b) pairs — the join keys are BOTH shared
        # variables, not just one
        outer = bgp_match(triples, [("?a", "scans", "?b")])
        inner = spark.createDataFrame(
            [("n1", "x1")], "a string, b string"
        )
        rows = join_solutions(outer, inner).collect()
        assert [(r["a"], r["b"]) for r in rows] == [("n1", "x1")]


class TestBind:
    def test_bind_adds_column(self, spark, triples):
        sols = bgp_match(triples, [("?a", "scans", "?b")])
        out = select_solutions(
            sols, bind=[("concat(a, '#', b)", "?key")]
        )
        keys = {r["key"] for r in out.collect()}
        assert keys == {"n1#x1", "n1#x2", "n2#x1"}

    def test_bind_sequential_reference(self, spark, triples):
        sols = bgp_match(triples, [("?a", "scans", "?b")])
        out = select_solutions(
            sols,
            bind=[("length(a)", "?la"), ("la + length(b)", "?tot")],
        )
        assert all(r["tot"] == 4 for r in out.collect())

    def test_bind_rebinding_rejected(self, spark, triples):
        sols = bgp_match(triples, [("?a", "scans", "?b")])
        with pytest.raises(ValueError, match="already bound"):
            select_solutions(sols, bind=[("upper(b)", "?a")])

    def test_offset_after_order(self, spark, triples):
        sols = bgp_match(triples, [("?a", "scans", "?b")])
        rows = select_solutions(
            sols, order_by=["?a", "?b"], offset=1, limit=2
        ).collect()
        assert [(r["a"], r["b"]) for r in rows] == [
            ("n1", "x2"), ("n2", "x1")
        ]

    def test_offset_without_order_rejected(self, spark, triples):
        sols = bgp_match(triples, [("?a", "scans", "?b")])
        with pytest.raises(ValueError, match="nondeterministic"):
            select_solutions(sols, offset=1)


class TestUpdateWhere:
    def _rows(self, df):
        return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}

    def test_delete_insert_where(self, spark, triples):
        out = update_where(
            triples,
            delete=[("?a", "scans", "?b")],
            insert=[("?b", "scanned_by", "?a")],
            patterns=[("?a", "scans", "?b")],
        )
        got = self._rows(out)
        assert ("n1", "scans", "x1") not in got
        assert ("x1", "scanned_by", "n1") in got
        assert ("n1", "audits", "x9") in got  # untouched slice survives

    def test_reinsert_of_deleted_triple_survives(self, spark, triples):
        # DELETE then INSERT the same template: spec order means the
        # triple is re-added — the graph is unchanged
        out = update_where(
            triples,
            delete=[("?a", "scans", "?b")],
            insert=[("?a", "scans", "?b")],
            patterns=[("?a", "scans", "?b")],
        )
        assert self._rows(out) == set(TRIPLES)

    def test_insert_existing_no_duplicate(self, spark, triples):
        # inserting a triple that already exists must not duplicate it
        out = update_where(
            triples,
            insert=[("?a", "scans", "x2")],
            patterns=[("?a", "scans", "?b")],
        )
        assert out.count() == out.distinct().count()
        assert self._rows(out) == set(TRIPLES) | {("n2", "scans", "x2")}

    def test_ground_data_forms(self, spark, triples):
        out = update_where(
            triples,
            delete=[("n1", "audits", "x9")],
            insert=[("n9", "audits", "x9")],
        )
        got = self._rows(out)
        assert ("n1", "audits", "x9") not in got
        assert ("n9", "audits", "x9") in got

    def test_variables_without_where_rejected(self, spark, triples):
        with pytest.raises(ValueError, match="no\\s+WHERE"):
            update_where(triples, insert=[("?a", "p", "c")])

    def test_no_templates_rejected(self, spark, triples):
        with pytest.raises(ValueError, match="templates"):
            update_where(triples, patterns=[("?a", "?p", "?b")])


class TestStreamIntervalJoin:
    def test_stream_equals_batch_cross_batch_state(self, spark, tmp_path):
        import datetime as dt

        from renard_spark.streaming.events import stream_interval_join

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

        def h(x):
            return t0 + dt.timedelta(hours=x)

        in_dir = str(tmp_path / "in")
        views = spark.createDataFrame(
            [(1, h(0), "u1"), (2, h(0), "u2"), (3, h(5), "u3")],
            "eid long, ts timestamp, user string",
        )
        clicks = spark.createDataFrame(
            # u1 inside the 2h bound; u2 outside; u3 BEFORE its view
            [(11, h(1), "u1"), (12, h(3), "u2"), (13, h(4), "u3")],
            "eid long, ts timestamp, user string",
        )
        # two separate files → separate micro-batches: the u1 view
        # must be held in join state until its click arrives later
        views.withColumn("kind", F.lit("v")).coalesce(1).write.parquet(in_dir)
        clicks.withColumn("kind", F.lit("c")).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

        schema = spark.read.parquet(in_dir).schema

        def src():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(in_dir)
            )

        l = src().filter(F.col("kind") == "v").select(
            F.col("user"),
            F.col("eid").alias("vid"),
            F.col("ts").alias("vts"),
        )
        r = src().filter(F.col("kind") == "c").select(
            F.col("user"),
            F.col("eid").alias("cid"),
            F.col("ts").alias("cts"),
        )
        joined = stream_interval_join(
            l, r, "user", "vts", "cts", bound="2 hours", watermark="10 days"
        )
        out_dir = str(tmp_path / "out")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r_["user"], r_["vid"], r_["cid"])
            for r_ in spark.read.parquet(out_dir).collect()
        }
        assert got == {("u1", 1, 11)}

    def test_key_column_not_duplicated(self, spark, tmp_path):
        # drop(rw[key]) must leave exactly one key column
        from renard_spark.streaming.events import stream_interval_join

        l = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .select(
                F.col("value").alias("user"),
                F.col("timestamp").alias("vts"),
            )
        )
        r = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
            .select(
                F.col("value").alias("user"),
                F.col("timestamp").alias("cts"),
            )
        )
        j = stream_interval_join(l, r, "user", "vts", "cts")
        assert j.columns.count("user") == 1


class TestTransEScoring:
    def _ref_component(self, ns, name, i):
        import hashlib

        h = hashlib.md5(f"{ns}{name}:{i}".encode()).hexdigest()
        return int(h[:8], 16) / 4294967296.0 - 0.5

    def test_hash_mode_matches_reference_md5(self, spark):
        from renard_spark.functions.kgembed import score_triples

        df = spark.createDataFrame(
            [("a", "likes", "b")], "subj string, pred string, obj string"
        )
        row = score_triples(df, dim=4).collect()[0]
        want = sum(
            abs(
                self._ref_component("e:", "a", i)
                + self._ref_component("r:", "likes", i)
                - self._ref_component("e:", "b", i)
            )
            for i in range(4)
        )
        assert row["transe_score"] == want  # exact dyadic arithmetic
        assert row["score_fp"] == round(want * 4294967296.0)

    def test_table_mode_matches_hand_calc(self, spark):
        from renard_spark.functions.kgembed import score_triples

        ents = spark.createDataFrame(
            [("a", [1.0, 0.0]), ("b", [0.0, 2.0])],
            "name string, vec array<double>",
        )
        rels = spark.createDataFrame(
            [("likes", [0.5, 0.5])], "name string, vec array<double>"
        )
        df = spark.createDataFrame(
            [("a", "likes", "b")], "subj string, pred string, obj string"
        )
        row = score_triples(
            df, entity_embeddings=ents, relation_embeddings=rels
        ).collect()[0]
        # |1+0.5-0| + |0+0.5-2| = 1.5 + 1.5 = 3.0
        assert row["transe_score"] == 3.0

    def test_true_triple_scores_below_corrupted(self, spark):
        # with TABLE embeddings encoding h + r == t exactly, the true
        # triple must beat any corruption (sanity of the energy's sign)
        from renard_spark.functions.kgembed import score_triples

        ents = spark.createDataFrame(
            [("h", [0.25, 0.5]), ("t", [0.5, 0.75]), ("x", [1.0, -0.5])],
            "name string, vec array<double>",
        )
        rels = spark.createDataFrame(
            [("r", [0.25, 0.25])], "name string, vec array<double>"
        )
        df = spark.createDataFrame(
            [("h", "r", "t"), ("h", "r", "x")],
            "subj string, pred string, obj string",
        )
        got = {
            r_["obj"]: r_["transe_score"]
            for r_ in score_triples(
                df, entity_embeddings=ents, relation_embeddings=rels
            ).collect()
        }
        assert got["t"] == 0.0 and got["x"] > 0.0

    def test_link_prediction_ranks(self, spark):
        # table embeddings with a known ordering: vocab = {h, t, x},
        # and for (h, r) the energies are t=0 < h=0.5 < x=1.75, so the
        # true t ranks 1 of 3 and x ranks last
        from renard_spark.functions.kgembed import link_prediction_ranks

        ents = spark.createDataFrame(
            [("h", [0.25, 0.5]), ("t", [0.5, 0.75]), ("x", [1.0, -0.5])],
            "name string, vec array<double>",
        )
        rels = spark.createDataFrame(
            [("r", [0.25, 0.25])], "name string, vec array<double>"
        )
        df = spark.createDataFrame(
            [("h", "r", "t"), ("h", "r", "x")],
            "subj string, pred string, obj string",
        )
        got = {
            r_["obj"]: (r_["rank"], r_["n_cands"])
            for r_ in link_prediction_ranks(
                df, entity_embeddings=ents, relation_embeddings=rels
            ).collect()
        }
        assert got["t"][0] == 1 and got["t"][1] == 3
        assert got["x"][0] > 1

    def test_filtered_rank_discounts_better_true_objects(self, spark):
        # (a, r) has TWO true objects; the worse-ranked one discounts
        # the better one: filtered == raw - 1 for it, and filtered ==
        # raw for the best. Equivalent to re-ranking with the other
        # true object REMOVED from the candidate list.
        from renard_spark.functions.kgembed import link_prediction_ranks

        df = spark.createDataFrame(
            [("a", "r", "b"), ("a", "r", "c")],
            "subj string, pred string, obj string",
        )
        rows = link_prediction_ranks(df, dim=4).collect()
        by_rank = sorted(rows, key=lambda r_: r_["rank"])
        assert by_rank[0]["filtered_rank"] == by_rank[0]["rank"]
        assert by_rank[1]["filtered_rank"] == by_rank[1]["rank"] - 1

    def test_rank_counts_all_vocab_candidates(self, spark):
        # hash mode, 3 entities in the graph -> every (s, p) scores 3
        # candidates; every rank is within [1, 3]
        from renard_spark.functions.kgembed import link_prediction_ranks

        df = spark.createDataFrame(
            [("a", "r", "b"), ("b", "r", "c"), ("a", "q", "c")],
            "subj string, pred string, obj string",
        )
        rows = link_prediction_ranks(df, dim=4).collect()
        assert len(rows) == 3
        assert all(r["n_cands"] == 3 for r in rows)
        assert all(1 <= r["rank"] <= 3 for r in rows)

    def test_half_injected_embeddings_rejected(self, spark):
        from renard_spark.functions.kgembed import score_triples

        df = spark.createDataFrame(
            [("a", "r", "b")], "subj string, pred string, obj string"
        )
        ents = spark.createDataFrame(
            [("a", [1.0])], "name string, vec array<double>"
        )
        with pytest.raises(ValueError, match="both"):
            score_triples(df, entity_embeddings=ents)


def _gate_scorer(cast):
    """Mirror of __spark_entry__._coreferee_gate_scorer over an
    arbitrary cast set (kept in-test so the semantics are pinned even
    if the driver constant changes)."""
    def scorer(chunks):
        out = []
        for toks in chunks:
            chains = {}
            for i, t in enumerate(toks):
                if t in cast:
                    if i + 2 < len(toks) and toks[i + 1] == "the":
                        chains.setdefault(t, []).append([i, i + 2])
                    else:
                        chains.setdefault(t, []).append([i])
            out.append([chains[k] for k in sorted(chains)])
        return out
    return scorer


class TestCorefereeGateScorer:
    CAST = {"ada", "bob"}

    def test_poison_discards_whole_chunk_chain(self):
        # ada@0 followed by 'the' (i+2=2 < 4) → ada's WHOLE chunk chain
        # (both occurrences) is discarded; bob survives
        toks = ["ada", "the", "cat", "ada", "bob", "ran"]
        chains = coreferee_doc_corefs(
            toks, _gate_scorer(self.CAST), max_chunk_size=None
        )
        assert chains == [[(4, 5)]]

    def test_chunk_boundary_blocks_poison(self):
        # chunk size 2: ada@0 | the cat | ... — 'the' is in the NEXT
        # chunk, so the scorer never sees it and ada survives
        toks = ["ada", "the", "cat", "bob"]
        chains = coreferee_doc_corefs(
            toks, _gate_scorer(self.CAST), max_chunk_size=2
        )
        # enumeration: chunk0 → ada chain, chunk1 (none), chunk2 → bob
        assert chains == [[(0, 1)], [(3, 4)]]

    def test_end_of_chunk_fallback_not_poison(self):
        # ada@1 followed by 'the' but i+2 == len(chunk) → single-token
        # fallback, chain kept (reference: subtree indexing stays
        # inside the spacy doc)
        toks = ["x", "ada", "the"]
        chains = coreferee_doc_corefs(
            toks, _gate_scorer(self.CAST), max_chunk_size=None
        )
        assert chains == [[(1, 2)]]

    def test_enumeration_order_chunk_then_surface(self):
        toks = ["bob", "ada", "x", "x", "ada", "bob"]
        chains = coreferee_doc_corefs(
            toks, _gate_scorer(self.CAST), max_chunk_size=4
        )
        # chunk0 sorted surfaces: ada@1, bob@0; chunk1: ada@4, bob@5
        assert chains == [
            [(1, 2)], [(0, 1)], [(4, 5)], [(5, 6)],
        ]

    def test_spark_operator_matches_pure_python(self, spark):
        docs = [
            ("d1", ["ada", "the", "cat", "ada", "bob", "ran"]),
            ("d2", ["bob", "ada", "x", "x", "ada", "bob"]),
            ("d3", ["x", "ada", "the"]),
        ]
        df = spark.createDataFrame(
            docs, "doc_id string, tokens array<string>"
        )
        got = {
            (r["doc_id"], r["chain_id"], r["start_idx"], r["end_idx"])
            for r in coreferee_corefs(
                df, lambda: _gate_scorer(self.CAST), max_chunk_size=4
            ).collect()
        }
        want = set()
        for doc_id, toks in docs:
            chains = coreferee_doc_corefs(
                toks, _gate_scorer(self.CAST), max_chunk_size=4
            )
            for cid, chain in enumerate(chains):
                for s, e in chain:
                    want.add((doc_id, cid, s, e))
        assert got == want
