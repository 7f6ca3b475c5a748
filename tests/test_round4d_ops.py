"""Session-4d additions vs independent oracles: Katz centrality,
k-truss, quotient graph, transitive closure + SCC (networkx), and the
BGP matcher (brute-force binding enumeration)."""

import itertools
import random

import networkx as nx
from pyspark.sql import functions as F

from renard_spark.functions import graph as gmetrics
from renard_spark.functions.kgquery import bgp_match


def _random_edges(seed, n_nodes=30, n_edges=80):
    rng = random.Random(seed)
    seen = set()
    rows = []
    while len(rows) < n_edges:
        a, b = rng.sample(range(n_nodes), 2)
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        rows.append((f"n{key[0]:02d}", f"n{key[1]:02d}", rng.randint(1, 9)))
    return rows


def test_katz_matches_networkx(spark):
    rows = _random_edges(11)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: r["katz"]
        for r in gmetrics.katz_centrality(df, iters=40).collect()
    }
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    alpha = 0.5 / max(d for _, d in g.degree())
    want = nx.katz_centrality(
        g, alpha=alpha, beta=1.0, normalized=False, tol=1e-12,
        max_iter=10_000,
    )
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) / want[n] < 1e-6, n


def test_ktruss_matches_networkx(spark):
    for seed in (3, 17):
        rows = _random_edges(seed, n_nodes=25, n_edges=90)
        df = spark.createDataFrame(
            rows, "src string, dst string, weight int"
        )
        g = nx.Graph()
        for a, b, _ in rows:
            g.add_edge(a, b)
        for k in (3, 4):
            out = gmetrics.k_truss(df, k=k, rounds=10).collect()
            got = {(r["src"], r["dst"]) for r in out}
            want = {
                (min(a, b), max(a, b))
                for a, b in nx.k_truss(g, k).edges
            }
            assert got == want, (seed, k)
            # reported support is the triangle count inside the truss
            tg = nx.Graph(list(want))
            for r in out:
                comm = len(
                    set(tg.neighbors(r["src"])) & set(tg.neighbors(r["dst"]))
                )
                assert r["support"] == comm


def test_quotient_graph_hand_case(spark):
    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("a", "c", 1.0), ("c", "d", 5.0),
         ("b", "d", 1.0), ("d", "e", 3.0)],
        "src string, dst string, weight double",
    )
    labels = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "R"), ("d", "R"), ("e", "R")],
        "node string, label string",
    )
    got = {
        (r["c1"], r["c2"]): (r["weight"], r["n_edges"])
        for r in gmetrics.quotient_graph(edges, labels).collect()
    }
    assert got == {
        ("L", "L"): (2.0, 1),          # a-b
        ("L", "R"): (2.0, 2),          # a-c, b-d
        ("R", "R"): (8.0, 2),          # c-d, d-e
    }


def _random_digraph(seed, n_nodes=18, n_edges=40):
    rng = random.Random(seed)
    rows = set()
    while len(rows) < n_edges:
        a, b = rng.sample(range(n_nodes), 2)
        rows.add((f"n{a:02d}", f"n{b:02d}"))
    return sorted(rows)


def test_transitive_closure_matches_networkx(spark):
    rows = _random_digraph(5)
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {
        (r["src"], r["dst"])
        for r in gmetrics.transitive_closure(df).collect()
    }
    g = nx.DiGraph(rows)
    # oracle: (u, v) iff a path of length >= 1 exists — explicit
    # reachability, incl. (v, v) exactly when v lies on a cycle
    want = set()
    for u in g.nodes:
        reach = set()
        for w in g.successors(u):
            reach.add(w)
            reach |= nx.descendants(g, w)
        want |= {(u, v) for v in reach}
    assert got == want


def test_scc_matches_networkx(spark):
    for seed in (2, 9, 21):
        rows = _random_digraph(seed, n_nodes=14, n_edges=30)
        df = spark.createDataFrame(rows, "src string, dst string")
        got = {
            r["node"]: r["scc_id"]
            for r in gmetrics.strongly_connected(df).collect()
        }
        g = nx.DiGraph(rows)
        want = {}
        for comp in nx.strongly_connected_components(g):
            m = min(comp)
            for n in comp:
                want[n] = m
        assert got == want, seed


TRIPLES = [
    ("ann", "knows", "bob"), ("bob", "knows", "cat"),
    ("ann", "knows", "cat"), ("cat", "likes", "dog"),
    ("bob", "likes", "dog"), ("dog", "knows", "ann"),
    ("eve", "likes", "eve"),
]


def _brute(patterns):
    """Enumerate consistent bindings by brute force."""
    vs = sorted({t[1:] for p in patterns for t in p if t.startswith("?")})
    consts = sorted({t for p in patterns for t in p if not t.startswith("?")}
                    | {x for tr in TRIPLES for x in tr})
    out = set()
    for combo in itertools.product(consts, repeat=len(vs)):
        env = dict(zip(vs, combo))
        ok = True
        for s, p, o in patterns:
            t = tuple(env[x[1:]] if x.startswith("?") else x
                      for x in (s, p, o))
            if t not in TRIPLES:
                ok = False
                break
        if ok:
            out.add(tuple(env[v] for v in vs))
    return out


def test_bgp_match_vs_bruteforce(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    cases = [
        [("?a", "knows", "?b"), ("?b", "likes", "?c")],
        [("?a", "knows", "?b"), ("?b", "knows", "?c"),
         ("?c", "knows", "?a")],
        [("?a", "likes", "dog")],
        [("?x", "likes", "?x")],
        [("?a", "knows", "?b"), ("?a", "likes", "dog")],
    ]
    for patterns in cases:
        res = bgp_match(df, patterns)
        vs = sorted({t[1:] for p in patterns for t in p
                     if t.startswith("?")})
        assert res.columns == vs
        got = {tuple(r[v] for v in vs) for r in res.collect()}
        assert got == _brute(patterns), patterns


def test_bgp_disconnected_cross_and_errors(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    res = bgp_match(df, [("?a", "likes", "dog"), ("eve", "likes", "?b")])
    got = {(r["a"], r["b"]) for r in res.collect()}
    assert got == {("cat", "eve"), ("bob", "eve")}
    import pytest

    with pytest.raises(ValueError):
        bgp_match(df, [])
    with pytest.raises(ValueError):
        bgp_match(df, [("?a", "knows")])  # type: ignore[list-item]
