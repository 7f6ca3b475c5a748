"""KG snapshot diffing (operators/triples.graph_diff)."""

from renard_spark.operators import triples


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src string, dst string, weight long"
    )


def test_graph_diff_statuses(spark):
    old = _edges(spark, [("a", "b", 3), ("a", "c", 1), ("b", "c", 2)])
    new = _edges(spark, [("a", "b", 3), ("a", "c", 5), ("c", "d", 1)])
    got = {
        (r.src, r.dst): (r.w_old, r.w_new, r.status)
        for r in triples.graph_diff(old, new).collect()
    }
    assert got == {
        ("a", "b"): (3, 3, "same"),
        ("a", "c"): (1, 5, "changed"),
        ("b", "c"): (2, 0, "removed"),
        ("c", "d"): (0, 1, "added"),
    }


def test_graph_diff_empty_old_is_all_added(spark):
    old = _edges(spark, [])
    new = _edges(spark, [("x", "y", 7)])
    rows = triples.graph_diff(old, new).collect()
    assert [(r.src, r.dst, r.w_old, r.w_new, r.status) for r in rows] == [
        ("x", "y", 0, 7, "added")
    ]


def test_edge_validity_spans_and_peak_tie(spark):
    dyn = spark.createDataFrame(
        [
            ("d", 0, "a", "b", 2), ("d", 1, "a", "b", 5),
            ("d", 3, "a", "b", 5), ("d", 2, "a", "c", 1),
        ],
        "doc_id string, window_id int, src string, dst string, weight long",
    )
    got = {
        (r.src, r.dst): (r.first_w, r.last_w, r.n_windows, r.peak_w)
        for r in triples.edge_validity(dyn).collect()
    }
    # peak tie (w=5 at windows 1 and 3) -> earliest window
    assert got == {("a", "b"): (0, 3, 3, 1), ("a", "c"): (2, 2, 1, 2)}
