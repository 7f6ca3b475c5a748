"""Round-4 continuation, batch C: window funnel, cohort retention,
column profiling, and the N-Triples KG export sink."""

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from renard_spark.functions.events import funnel_levels, retention_cohorts
from renard_spark.functions.profile import profile_table
from renard_spark.io.ntriples import triples_to_ntriples, write_ntriples


def _events(spark, rows):
    # rows: (event_id, user_id, seconds-offset, event_type)
    base = datetime(2024, 1, 1)
    data = [
        (eid, u, datetime.fromtimestamp(base.timestamp() + s), t)
        for eid, u, s, t in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )


def _levels(spark, rows, window_s=100):
    ev = _events(spark, rows)
    return {
        r["user_id"]: r["level"]
        for r in funnel_levels(
            ev, ["view", "click", "purchase"], window_s
        ).collect()
    }


def test_funnel_basic_levels(spark):
    rows = [
        # u1 completes the whole funnel inside the window
        (1, 1, 0, "view"), (2, 1, 10, "click"), (3, 1, 20, "purchase"),
        # u2 stalls after click
        (4, 2, 0, "view"), (5, 2, 10, "click"),
        # u3 has the steps out of order → only level 1
        (6, 3, 0, "purchase"), (7, 3, 10, "click"), (8, 3, 20, "view"),
        # u4 has only a non-first step → level 0 (still a row)
        (9, 4, 0, "click"),
    ]
    assert _levels(spark, rows) == {1: 3, 2: 2, 3: 1, 4: 0}


def test_funnel_window_bounds_total_span(spark):
    # chain span 0→140 exceeds W=100 even though each hop is short
    rows = [
        (1, 1, 0, "view"), (2, 1, 60, "click"), (3, 1, 140, "purchase"),
    ]
    assert _levels(spark, rows) == {1: 2}
    # exactly-at-window span is allowed (tl - t1 <= W)
    rows = [
        (1, 1, 0, "view"), (2, 1, 60, "click"), (3, 1, 100, "purchase"),
    ]
    assert _levels(spark, rows) == {1: 3}


def test_funnel_max_start_beats_greedy_earliest(spark):
    # a later view restarts the clock: the 50→60→140 chain fits W=100,
    # while a greedy earliest-start fold (anchored at the view@0)
    # would stop at level 2
    rows = [
        (1, 1, 0, "view"), (2, 1, 50, "view"),
        (3, 1, 60, "click"), (4, 1, 140, "purchase"),
    ]
    assert _levels(spark, rows) == {1: 3}


def test_funnel_same_timestamp_chains(spark):
    # non-decreasing semantics: same-instant view→click chains count,
    # regardless of event_id order
    rows = [(1, 1, 10, "click"), (2, 1, 10, "view")]
    assert _levels(spark, rows) == {1: 2}


def test_funnel_rejects_duplicate_steps(spark):
    ev = _events(spark, [(1, 1, 0, "view")])
    with pytest.raises(ValueError):
        funnel_levels(ev, ["view", "view"], 10)


def test_retention_cohorts_day(spark):
    day = 86400
    rows = [
        # u1 first seen day 0, back on day 2 (twice — distinct'd)
        (1, 1, 0, "view"), (2, 1, 2 * day, "view"),
        (3, 1, 2 * day + 5, "click"),
        # u2 first seen day 1, never back
        (4, 2, day, "view"),
        # u3 first seen day 0, back day 1
        (5, 3, 5, "view"), (6, 3, day + 5, "view"),
    ]
    got = {
        (r["cohort"], r["offset"]): r["n_users"]
        for r in retention_cohorts(_events(spark, rows), "day").collect()
    }
    assert got == {
        (date(2024, 1, 1), 0): 2,
        (date(2024, 1, 1), 1): 1,
        (date(2024, 1, 1), 2): 1,
        (date(2024, 1, 2), 0): 1,
    }


def test_profile_table_counts_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, "b", None), (2, "a", 5.0), (2, None, 7.0)],
        "id long, s string, x double",
    )
    got = {
        r["col_name"]: (
            r["n"], r["n_null"], r["n_distinct"], r["min_val"], r["max_val"]
        )
        for r in profile_table(df).collect()
    }
    assert got["id"] == (3, 0, 2, "1", "2")
    assert got["s"] == (3, 1, 2, "a", "b")
    assert got["x"] == (3, 1, 2, "5.0", "7.0")
    with pytest.raises(ValueError):
        profile_table(df, ["nope"])


def test_ntriples_lines_and_escaping(spark):
    trips = spark.createDataFrame(
        [
            (0, 'A"quote', "interacts_with", "B\nline"),
            (1, 'A"quote', "interacts_with", "B\nline"),  # dup collapses
        ],
        "doc_id long, subj string, pred string, obj string",
    )
    lines = sorted(
        r["line"] for r in triples_to_ntriples(trips).collect()
    )
    assert len(lines) == 3  # 1 fact + 2 labels
    labels = [l for l in lines if "rdf-schema#label" in l]
    assert any('"A\\"quote"' in l for l in labels)
    assert any('"B\\nline"' in l for l in labels)
    fact = [l for l in lines if "interacts_with" in l]
    assert len(fact) == 1
    assert fact[0].startswith("_:b") and fact[0].endswith(" .")
    # blank-node ids agree between the fact and its labels
    subj_b = fact[0].split(" ")[0]
    assert any(l.startswith(subj_b + " ") for l in labels)


def test_ntriples_writer_roundtrip(spark, tmp_path):
    trips = spark.createDataFrame(
        [(0, "Ann", "interacts_with", "Bob")],
        "doc_id long, subj string, pred string, obj string",
    )
    out = str(tmp_path / "kg.nt")
    write_ntriples(triples_to_ntriples(trips), out)
    back = {r["value"] for r in spark.read.text(out).collect()}
    assert len(back) == 3
    assert all(l.endswith(" .") for l in back)


def test_gapfill_locf_fills_and_carries(spark):
    from renard_spark.functions.events import gapfill_locf

    rows = [
        # key 'a': hours 0 and 3 observed; 1, 2 are gaps
        (1, 1, 0, "a"), (2, 1, 600, "a"), (3, 1, 3 * 3600, "a"),
        # key 'b': only hour 1 → rows for 0..3 still appear
        (4, 2, 3700, "b"),
    ]
    ev = _events(spark, rows).withColumn(
        "value", F.col("event_id").cast("double")
    )
    got = {
        (r["key"], r["bucket_start"].hour): (
            r["n"], r["vmax"], r["vmax_locf"]
        )
        for r in gapfill_locf(ev, bucket="hour").collect()
    }
    assert len(got) == 8  # 2 keys x 4 hourly buckets
    assert got[("a", 0)] == (2, 2.0, 2.0)
    assert got[("a", 1)] == (0, None, 2.0)
    assert got[("a", 2)] == (0, None, 2.0)
    assert got[("a", 3)] == (1, 3.0, 3.0)
    assert got[("b", 0)] == (0, None, None)
    assert got[("b", 1)] == (1, 4.0, 4.0)
    assert got[("b", 3)] == (0, None, 4.0)


def test_activity_streaks(spark):
    from renard_spark.functions.events import activity_streaks

    day = 86400
    rows = [
        # u1: days 0,1,2 then 5,6 → longest 3, active 5
        (1, 1, 0, "view"), (2, 1, day, "view"), (3, 1, 2 * day, "view"),
        (4, 1, 5 * day, "view"), (5, 1, 6 * day, "view"),
        # two events same day don't double-count
        (6, 1, day + 5, "click"),
        # u2: single day
        (7, 2, 0, "view"),
    ]
    got = {
        r["user_id"]: (r["n_active_days"], r["longest_streak"])
        for r in activity_streaks(_events(spark, rows)).collect()
    }
    assert got == {1: (5, 3), 2: (1, 1)}


def test_corpus_cube_cells(spark):
    from renard_spark.functions.text import corpus_cube

    docs = spark.createDataFrame(
        [(0, "s0", "en", 10), (1, "s0", "fr", 20), (2, "s1", "en", 30)],
        "doc_id long, source string, lang string, n_chars long",
    )
    got = {
        (r["source"], r["lang"]): (r["n_docs"], r["sum_chars"])
        for r in corpus_cube(docs).collect()
    }
    assert len(got) == 8  # 3 leaves + 2 source + 2 lang subtotals + grand
    assert got[("s0", "en")] == (1, 10)
    assert got[("s0", "(all)")] == (2, 30)
    assert got[("(all)", "en")] == (2, 40)
    assert got[("(all)", "(all)")] == (3, 60)


def test_rate_anomalies_matches_numpy(spark):
    import math

    from renard_spark.functions.events import rate_anomalies

    # one series, hourly counts with a spike at the end
    counts = [5, 6, 5, 7, 6, 5, 6, 40]
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append((eid, 1, h * 3600 + i, "a"))
            eid += 1
    got = {
        r["bucket_start"].hour: (r["n"], r["z"])
        for r in rate_anomalies(
            _events(spark, rows), trailing=4, bucket="hour"
        ).collect()
    }
    assert [got[h][0] for h in range(8)] == counts
    # first 4 buckets: incomplete trailing window → NULL z
    assert all(got[h][1] is None for h in range(4))
    for h in range(4, 8):
        w = counts[h - 4:h]
        mean = sum(w) / 4
        var = sum((x - mean) ** 2 for x in w) / 3
        if var > 0:
            assert got[h][1] == pytest.approx(
                (counts[h] - mean) / math.sqrt(var), abs=1e-5
            )
        else:
            assert got[h][1] is None
    assert got[7][1] > 5  # the spike is flagged hard


def test_dq_summary_rules(spark):
    from renard_spark.functions.profile import dq_summary

    df = spark.createDataFrame(
        [(1, "en", 10), (1, "xx", -5), (2, None, 20), (3, "en", 2000)],
        "id long, lang string, n long",
    )
    got = {
        (r["check"], r["col_name"]): r["n_bad"]
        for r in dq_summary(
            df,
            not_null=["lang"],
            unique=["id"],
            accepted={"lang": ["en", "fr"]},
            ranges={"n": (0, 1000)},
        ).collect()
    }
    assert got == {
        ("not_null", "lang"): 1,
        ("unique", "id"): 1,      # two rows share id=1
        ("accepted_values", "lang"): 1,  # 'xx'; NULL not counted
        ("range", "n"): 2,        # -5 and 2000
    }
    with pytest.raises(ValueError):
        dq_summary(df)
    with pytest.raises(ValueError):
        dq_summary(df, not_null=["nope"])


def test_readability_known_text(spark):
    from renard_spark.functions.text import readability_scores

    docs = spark.createDataFrame(
        [(0, "The cat sat. The dog ran!"), (1, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_sents"], r["n_words"], r["n_syll"],
            r["flesch"], r["fk_grade"],
        )
        for r in readability_scores(docs).collect()
    }
    s, w, y = 2, 6, 6  # six monosyllabic words, two sentences
    assert got[0][:3] == (s, w, y)
    assert got[0][3] == pytest.approx(
        round(206.835 - 1.015 * (w / s) - 84.6 * (y / w), 4)
    )
    assert got[0][4] == pytest.approx(
        round(0.39 * (w / s) + 11.8 * (y / w) - 15.59, 4)
    )
    assert got[1][:3] == (1, 1, 1)  # floors keep empty docs finite


def test_compaction_groups_next_fit(spark):
    from renard_spark.functions.maintenance import compaction_groups

    files = spark.createDataFrame(
        [
            ("p", 1, 60), ("p", 2, 50), ("p", 3, 10), ("p", 4, 300),
            ("p", 5, 5), ("q", 1, 10),
        ],
        "part_key string, file_id long, bytes long",
    )
    got = {
        (r["part_key"], r["file_id"]): r["group_id"]
        for r in compaction_groups(files, 100).collect()
    }
    # starts: 0, 60, 110, 120, 420 → groups 0, 0, 1, 1, 4
    assert got == {
        ("p", 1): 0, ("p", 2): 0, ("p", 3): 1, ("p", 4): 1,
        ("p", 5): 4, ("q", 1): 0,
    }


def test_scd2_versions_intervals(spark):
    from renard_spark.functions.events import scd2_versions

    rows = [
        (1, 1, 0, "a"), (2, 1, 10, "a"), (3, 1, 20, "b"),
        (4, 1, 30, "a"),
        (5, 2, 0, "x"),
    ]
    got = sorted(
        (
            r["user_id"], r["attr"], r["valid_from"].second
            if r["valid_from"] else None,
            r["valid_to"].second if r["valid_to"] else None,
            r["is_current"],
        )
        for r in scd2_versions(_events(spark, rows)).collect()
    )
    assert got == [
        (1, "a", 0, 20, False),
        (1, "a", 30, None, True),
        (1, "b", 20, 30, False),
        (2, "x", 0, None, True),
    ]


def test_event_transitions_probabilities(spark):
    from renard_spark.functions.events import event_transitions

    rows = [
        (1, 1, 0, "a"), (2, 1, 10, "b"), (3, 1, 20, "a"),
        (4, 1, 30, "c"),
        (5, 2, 0, "a"), (6, 2, 10, "b"),
    ]
    got = {
        (r["cur"], r["nxt"]): (r["n"], r["p"])
        for r in event_transitions(_events(spark, rows)).collect()
    }
    assert got == {
        ("a", "b"): (2, 2 / 3),
        ("a", "c"): (1, 1 / 3),
        ("b", "a"): (1, 1.0),
    }


def test_active_users_grains(spark):
    from renard_spark.functions.events import active_users

    day = 86400
    rows = [
        (1, 1, 0, "v"), (2, 2, 0, "v"),          # day 0: u1, u2
        (3, 1, day, "v"),                         # day 1: u1
        (4, 3, 8 * day, "v"),                     # next week: u3
    ]
    got = {
        (r["grain"], r["bucket"].day): r["n_users"]
        for r in active_users(_events(spark, rows)).collect()
    }
    assert got[("day", 1)] == 2
    assert got[("day", 2)] == 1
    assert got[("day", 9)] == 1
    # Jan 1 2024 is a Monday: week buckets are Jan 1 and Jan 8
    assert got[("week", 1)] == 2
    assert got[("week", 8)] == 1
    assert got[("month", 1)] == 3


def test_skew_stats_topk_and_share(spark):
    from renard_spark.functions.maintenance import skew_stats

    df = spark.createDataFrame(
        [(k,) for k in [1] * 5 + [2] * 3 + [3] * 2 + [4]],
        "k long",
    )
    got = [
        (r["key_val"], r["n"], r["share"])
        for r in skew_stats(df, "k", k=2).collect()
    ]
    assert got == [("1", 5, 5 / 11), ("2", 3, 3 / 11)]


def test_profile_diff_drift_flags(spark):
    from renard_spark.functions.profile import profile_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id long, s string"
    )
    got = {
        r["col_name"]: (r["n_old"], r["n_new"], r["drifted"])
        for r in profile_diff(old, new).collect()
    }
    assert got["id"] == (2, 3, True)
    assert got["s"] == (2, 3, True)
    same = profile_diff(old, old).filter("drifted").count()
    assert same == 0
    # column appears only in the new snapshot → NULL olds, drifted
    wide = spark.createDataFrame([(1, "a", 5.0)], "id long, s string, x double")
    gx = {
        r["col_name"]: (r["n_old"], r["drifted"])
        for r in profile_diff(old, wide, None).collect()
        if r["col_name"] == "x"
    }
    assert gx["x"] == (None, True)


def test_fuzzy_alias_pairs_blocking_and_verify(spark):
    from renard_spark.functions.text import fuzzy_alias_pairs

    docs = spark.createDataFrame(
        [
            (0, "John meets Jonh and Johnn near the mill"),
            (1, "Mary visits the mill daily; Marry too"),
            (2, "table tables chair bench"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]) for r in fuzzy_alias_pairs(docs).collect()
    }
    assert ("john", "johnn") in got     # insertion (distance 1)
    assert ("marry", "mary") in got     # insertion ('marr' < 'mary')
    assert ("table", "tables") in got   # insertion
    # transposition is TWO Levenshtein edits — out at max_dist=1
    assert ("john", "jonh") not in got
    assert ("chair", "bench") not in got


def test_write_graph_tables_bundle(spark, tmp_path):
    from renard_spark.io.export import write_graph_tables

    trips = spark.createDataFrame(
        [
            (0, "Ann", "interacts_with", "Bob", 2),
            (1, "Ann", "interacts_with", "Bob", 3),
            (1, "Bob", "interacts_with", "Cat", 1),
        ],
        "doc_id long, subj string, pred string, obj string, weight long",
    )
    out = str(tmp_path / "bundle")
    counts = write_graph_tables(spark, trips, out)
    assert counts == {"triples": 3, "edges": 2, "nodes": 3}
    ed = {
        (r["subj"], r["obj"]): (r["weight"], r["n_docs"])
        for r in spark.read.parquet(out + "/edges").collect()
    }
    assert ed == {("Ann", "Bob"): (5, 2), ("Bob", "Cat"): (1, 1)}
    nd = {
        r["char_id"]: (r["degree"], r["strength"])
        for r in spark.read.parquet(out + "/nodes").collect()
    }
    assert nd == {"Ann": (1, 5), "Bob": (2, 6), "Cat": (1, 1)}
    nt = {r["value"] for r in spark.read.text(out + "/kg.nt").collect()}
    assert len(nt) == 5  # 2 facts + 3 labels
    gexf = open(out + "/graph.gexf").read()
    assert gexf.count("<node ") == 3 and gexf.count("<edge ") == 2


def test_incremental_components_matches_full_recompute(spark):
    import random

    from renard_spark.operators.cc import (
        connected_components,
        incremental_components,
    )

    rng = random.Random(7)
    nodes = [f"n{i:02d}" for i in range(30)]
    all_edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(50)
    ]
    old, batch = all_edges[:30], all_edges[30:]
    to_df = lambda rows: spark.createDataFrame(rows, "src string, dst string")
    assign = connected_components(to_df(old))
    inc = {
        (r["vertex"], r["component"])
        for r in incremental_components(assign, to_df(batch)).collect()
    }
    # full recompute must agree on every vertex seen so far
    full = {
        (r["vertex"], r["component"])
        for r in connected_components(to_df(all_edges)).collect()
    }
    assert inc == full


def test_incremental_components_merges_and_preserves(spark):
    from renard_spark.operators.cc import (
        connected_components,
        incremental_components,
    )

    to_df = lambda rows: spark.createDataFrame(rows, "src string, dst string")
    assign = connected_components(to_df([("a", "b"), ("c", "d"), ("x", "x")]))
    got = {
        r["vertex"]: r["component"]
        for r in incremental_components(
            assign, to_df([("b", "c"), ("p", "q")])
        ).collect()
    }
    # a-b and c-d merge under 'a'; x untouched; p-q is brand new
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a", "x": "x",
        "p": "p", "q": "p",
    }
