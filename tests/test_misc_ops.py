"""Preprocessing, tag normalization, utils, BM25, GEXF, metrics,
pipeline factories."""

import math
import os

from renard_spark import corpus, pipeline
from renard_spark.functions import retrieval
from renard_spark.functions.metrics import triple_prf
from renard_spark.io.gexf import edges_to_gexf
from renard_spark.operators import ner, preprocess, tokenize
from renard_spark.operators import utils as oputils
from renard_spark.sources import ingest

from pyspark.sql import functions as F


def test_substitute_rule_order(spark):
    df = spark.createDataFrame([("d", "aaa bbb")], "doc_id string, text string")
    out = preprocess.substitute(df, [("a+", "X"), ("X b", "Y")])
    assert out.first().text == "Ybb"


def test_normalize_tags(spark):
    df = spark.createDataFrame(
        [("d", 0, "x", "B-PERSON"), ("d", 1, "y", "O")],
        "doc_id string, tok_idx int, token string, bio_tag string",
    )
    got = {r.tok_idx: r.bio_tag for r in ner.normalize_tags(
        df, {"B-PERSON": "B-PER"}).collect()}
    assert got == {0: "B-PER", 1: "O"}


def test_make_vocab_first_seen_order(spark):
    df = spark.createDataFrame(
        [(0, "b"), (1, "a"), (2, "b"), (3, "c")], "ord int, v string"
    )
    got = {r.value: r.vocab_id for r in oputils.make_vocab(df, "v", "ord").collect()}
    assert got == {"b": 0, "a": 1, "c": 2}


def test_search_pattern(spark):
    df = spark.createDataFrame(
        [(["a", "b", "a", "b", "a"],)], "toks array<string>"
    )
    got = df.select(
        oputils.search_pattern(F.col("toks"), ["a", "b", "a"]).alias("hits")
    ).first().hits
    assert got == [0, 2]


def test_char_blocks_to_token_blocks(spark):
    # text: "ab cd ef" tokens at chars 0,3,6
    offsets = spark.createDataFrame(
        [("d", 0, 0, 2), ("d", 1, 3, 5), ("d", 2, 6, 8)],
        "doc_id string, tok_idx int, char_start int, char_end int",
    )
    blocks = spark.createDataFrame(
        [("d", 0, 0, 5), ("d", 1, 4, 8)],
        "doc_id string, block_id int, char_start int, char_end int",
    )
    got = {
        r.block_id: (r.start, r.end)
        for r in oputils.char_blocks_to_token_blocks(blocks, offsets).collect()
    }
    assert got == {0: (0, 1), 1: (1, 2)}


def test_bm25_topk(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across the cluster"),
            (2, "the cat sat on the mat"),
            (3, "spark spark spark tuning guide"),
        ],
        "doc_id long, text string",
    )
    idx = retrieval.bm25_index(docs)
    q = spark.createDataFrame([(0, "spark"), (0, "tuning")],
                              "query_id int, term string")
    got = retrieval.bm25_topk(idx, q, k=2).orderBy("rank").collect()
    assert [r.doc_id for r in got] == [3, 1]
    assert got[0].score > got[1].score > 0


def test_metrics_triple_prf():
    p, r, f1 = triple_prf([("a", "x", "b")], [("a", "x", "b"), ("a", "y", "c")])
    assert p == 1.0 and r == 0.5 and abs(f1 - 2 / 3) < 1e-12
    assert triple_prf([], []) == (1.0, 1.0, 1.0)


def test_gexf_export(spark, tmp_path):
    nodes = spark.createDataFrame([("A",), ("B",)], "char_id string")
    edges = spark.createDataFrame([("A", "B", 3)], "src string, dst string, weight long")
    path = str(tmp_path / "g.gexf")
    edges_to_gexf(nodes, edges, path)
    content = open(path).read()
    assert '<node id="A"' in content and 'weight="3"' in content
    import xml.dom.minidom
    xml.dom.minidom.parseString(content)  # well-formed


def test_conversational_and_relational_pipelines(spark):
    docs = corpus.generate_documents(spark, 25, seed=19)
    conv = pipeline.conversational_pipeline(
        docs, conversation_dist=(1, "sentences")
    )
    t1 = conv["triples"].collect()
    assert len(t1) > 0 and all(r.pred == "converses_with" for r in t1)
    ment = pipeline.conversational_pipeline(docs, graph_type="mention")
    t2 = ment["triples"].collect()
    assert len(t2) > 0 and all(r.pred == "mentions" for r in t2)
    rel = pipeline.relational_pipeline(docs)
    t3 = rel["triples"].collect()
    assert len(t3) > 0
    assert {r.pred for r in t3} <= set(
        __import__("renard_spark.operators.relations", fromlist=["RELATION_VERBS"]).RELATION_VERBS.values()
    )


def test_samenoun_context(spark):
    from renard_spark.operators import tokenize as tk

    docs = ingest.normalize_documents(corpus.generate_documents(spark, 10, seed=37))
    st = tk.sentence_tokens(docs)
    ents = __import__(
        "renard_spark.operators.ner", fromlist=["rule_ner_sentences"]
    ).rule_ner_sentences(st, pipeline.default_gazetteer())
    ctx = retrieval.samenoun_context(ents, st, k=3)
    rows = ctx.collect()
    assert len(rows) > 0
    # never retrieves the mention's own sentence; rank within k
    for r in rows:
        assert (r.ctx_doc_id, r.ctx_sent_idx) != (r.doc_id, r.sent_idx)
        assert 1 <= r.rank <= 3


def test_dynamic_gexf_two_window_golden(spark, tmp_path):
    # hand-built two-window dynamic graph (reference
    # dynamic_graph_to_gephi_graph semantics, graph_utils.py:108-167):
    # w0: (a,b,2); w1: (a,b,3) + (b,c,1) — the (a,b) edge must carry
    # cumulative dweight spells [2,0,1] then [5,1,2]; (b,c) one spell
    # [1,1,2]; node c starts at window 1.
    from renard_spark.io.gexf import dynamic_edges_to_gexf

    df = spark.createDataFrame(
        [(0, "a", "b", 2), (1, "a", "b", 3), (1, "b", "c", 1)],
        "window_id int, src string, dst string, weight long",
    )
    path = str(tmp_path / "dyn.gexf")
    dynamic_edges_to_gexf(df, path)
    import xml.etree.ElementTree as ET

    ns = {"g": "http://gexf.net/1.3"}
    root = ET.parse(path).getroot()
    graph = root.find("g:graph", ns)
    assert graph.get("mode") == "dynamic"
    nodes = {
        n.get("id"): (n.get("start"), n.get("end"))
        for n in graph.find("g:nodes", ns)
    }
    assert nodes == {"a": ("0", "2"), "b": ("0", "2"), "c": ("1", "2")}
    edges = {}
    for e in graph.find("g:edges", ns):
        spells = [
            (av.get("value"), av.get("start"), av.get("end"))
            for av in e.find("g:attvalues", ns)
        ]
        edges[(e.get("source"), e.get("target"))] = (e.get("start"), spells)
    assert edges[("a", "b")] == (
        "0", [("2.0", "0", "1"), ("5.0", "1", "2")]
    )
    assert edges[("b", "c")] == ("1", [("1.0", "1", "2")])


def test_character_salience_hand_values(spark):
    """Hand-computed salience on one 10-token doc with two characters:
    alice at positions 0, 4, 9 (n=3, first=0, spread=9,
    salience=(3/10)*(1-0/10)=0.3) and bob at position 5 (n=1, first=5,
    spread=0, salience=(1/10)*(1-5/10)=0.05)."""
    from renard_spark.operators.unify import character_salience

    ments = spark.createDataFrame(
        [
            ("d1", "alice", 0),
            ("d1", "alice", 4),
            ("d1", "alice", 9),
            ("d1", "bob", 5),
        ],
        "doc_id string, char_id string, start_idx int",
    )
    dl = spark.createDataFrame([("d1", 10)], "doc_id string, n_toks long")
    got = {
        r["char_id"]: (
            r["n_mentions"], r["first_idx"], r["spread"], r["salience"]
        )
        for r in character_salience(ments, dl).collect()
    }
    assert got == {
        "alice": (3, 0, 9, 0.3),
        "bob": (1, 5, 0, 0.05),
    }
