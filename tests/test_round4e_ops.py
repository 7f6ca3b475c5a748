"""Session-4e additions vs independent oracles: multimodal caption
pairs (hand-built interleaved docs), ANN recall@k (pure-python set
math), SHACL-lite triple validation (hand-enumerated violations), and
B-cubed (pure-python per-item definition vs the cell-count identity)."""

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from renard_spark.functions.metrics import bcubed
from renard_spark.functions.similarity import topk_recall
from renard_spark.operators.linking import caption_pairs
from renard_spark.operators.relations import validate_triples


def _span(kind, text=None, ref=None, off=0):
    return Row(kind=kind, text=text, media_ref=ref, offset=off)


def test_caption_pairs_hand_golden(spark):
    docs = spark.createDataFrame(
        [
            # leading cover image (no text before), trailing audio
            Row(
                doc_id="d1",
                spans=[
                    _span("image", ref="i1", off=0),
                    _span("text", text="alpha bravo", off=0),
                    _span("audio", ref="a1", off=11),
                ],
            ),
            # media sandwiched between two text spans
            Row(
                doc_id="d2",
                spans=[
                    _span("text", text="first part", off=0),
                    _span("video", ref="v1", off=10),
                    _span("text", text="second part", off=10),
                ],
            ),
            # text-only doc: contributes no pairs
            Row(doc_id="d3", spans=[_span("text", text="only text", off=0)]),
        ]
    )
    got = {
        (r["doc_id"], r["media_ref"]): (
            r["kind"], r["pos"], r["caption_before"], r["caption_after"]
        )
        for r in caption_pairs(docs, snippet_len=5).collect()
    }
    assert got == {
        ("d1", "i1"): ("image", 0, None, "alpha"),
        ("d1", "a1"): ("audio", 2, "alpha", None),
        ("d2", "v1"): ("video", 1, "first", "secon"),
    }


def test_caption_pairs_picks_nearest_text(spark):
    # two text spans before the media: the LATER one is the caption
    docs = spark.createDataFrame(
        [
            Row(
                doc_id="d",
                spans=[
                    _span("text", text="far away", off=0),
                    _span("text", text="near one", off=8),
                    _span("image", ref="i", off=16),
                    _span("text", text="after a", off=16),
                    _span("text", text="after b", off=23),
                ],
            )
        ]
    )
    [r] = caption_pairs(docs, snippet_len=20).collect()
    assert r["caption_before"] == "near one"
    assert r["caption_after"] == "after a"


def test_topk_recall_set_math(spark):
    rng = random.Random(7)
    k = 4
    exact, approx, want = [], [], {}
    for q in range(25):
        true = rng.sample(range(100), k)
        # approx keeps a random subset of the truth + fillers
        n_keep = rng.randint(0, k)
        kept = true[:n_keep]
        fill = [x for x in rng.sample(range(100, 200), k - n_keep)]
        exact += [(q, t) for t in true]
        approx += [(q, a) for a in kept + fill]
        want[q] = (k, n_keep, round(n_keep / k, 6))
    e = spark.createDataFrame(exact, "vec_id int, neighbor_id int")
    a = spark.createDataFrame(approx, "vec_id int, neighbor_id int")
    got = {
        r["vec_id"]: (r["n_true"], r["n_hit"], r["recall"])
        for r in topk_recall(e, a).collect()
    }
    assert got == want


def test_validate_triples_hand_enumerated(spark):
    rows = [
        # functional violation: a scans two distinct objects in doc 1
        (1, "a", "scans", "x"), (1, "a", "scans", "y"), (1, "a", "scans", "y"),
        # same subject, other doc: no violation (doc-scoped)
        (2, "a", "scans", "x"),
        # inverse-functional violation: z sorted-by two subjects
        (1, "p", "sorts", "z"), (1, "q", "sorts", "z"),
        # domain violation: 'bad' not in the allowed class, twice
        (3, "bad", "groups", "x"), (3, "bad", "groups", "y"),
        (3, "a", "groups", "x"),  # allowed subject: clean
    ]
    t = spark.createDataFrame(
        rows, "doc_id int, subj_char string, rel string, obj_char string"
    )
    got = {
        (r["constraint"], r["doc_id"], r["rel"], r["node"]): r["n"]
        for r in validate_triples(
            t,
            functional=("scans",),
            inverse_functional=("sorts",),
            domains={"groups": ["a", "b"]},
        ).collect()
    }
    assert got == {
        ("functional", 1, "scans", "a"): 2,
        ("inverse_functional", 1, "sorts", "z"): 2,
        ("domain", 3, "groups", "bad"): 2,
    }


def test_validate_triples_requires_constraints(spark):
    t = spark.createDataFrame(
        [(1, "a", "r", "b")],
        "doc_id int, subj_char string, rel string, obj_char string",
    )
    try:
        validate_triples(t)
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError with no constraints")


def _bcubed_pure(items):
    """Per-item B-cubed definition (Bagga & Baldwin '98)."""
    ps, rs = [], []
    for d, c, g in items:
        cluster = [x for x in items if x[0] == d and x[1] == c]
        gold = [x for x in items if x[0] == d and x[2] == g]
        inter = [x for x in cluster if x[2] == g]
        ps.append(len(inter) / len(cluster))
        rs.append(len(inter) / len(gold))
    p, r = sum(ps) / len(ps), sum(rs) / len(rs)
    return p, r, 2 * p * r / (p + r)


def test_bcubed_matches_per_item_definition(spark):
    rng = random.Random(13)
    items = [
        (d, f"c{rng.randint(0, 3)}", f"g{rng.randint(0, 2)}")
        for d in range(4)
        for _ in range(rng.randint(3, 9))
    ]
    df = spark.createDataFrame(
        items, "doc_id int, sys_id string, gold_id string"
    )
    [row] = bcubed(df, "sys_id", "gold_id", key_cols=("doc_id",)).collect()
    p, r, f1 = _bcubed_pure(items)
    assert row["n_items"] == len(items)
    assert abs(row["bcubed_precision"] - round(p, 6)) <= 1e-6
    assert abs(row["bcubed_recall"] - round(r, 6)) <= 1e-6
    assert abs(row["bcubed_f1"] - round(f1, 6)) <= 1e-6


def test_bcubed_perfect_and_degenerate(spark):
    # identical clusterings → all three metrics 1.0
    df = spark.createDataFrame(
        [(1, "a", "a"), (1, "a", "a"), (1, "b", "b")],
        "doc_id int, sys_id string, gold_id string",
    )
    [row] = bcubed(df, "sys_id", "gold_id").collect()
    assert (
        row["bcubed_precision"], row["bcubed_recall"], row["bcubed_f1"]
    ) == (1.0, 1.0, 1.0)
    # everything in one system cluster vs singleton golds: p<1, r=1
    df2 = spark.createDataFrame(
        [(1, "a", "g1"), (1, "a", "g2")],
        "doc_id int, sys_id string, gold_id string",
    )
    [row2] = bcubed(df2, "sys_id", "gold_id").collect()
    assert row2["bcubed_precision"] == 0.5
    assert row2["bcubed_recall"] == 1.0
