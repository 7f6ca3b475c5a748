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


def test_eccentricity_matches_networkx(spark):
    # two components + an isolated-pair: per-component horizons
    rows = _random_edges(13, n_nodes=20, n_edges=30) + [
        ("z1", "z2", 1), ("z2", "z3", 1)
    ]
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: r["ecc"]
        for r in gmetrics.eccentricity(df).collect()
    }
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    want = {}
    for n in g.nodes:
        want[n] = max(nx.shortest_path_length(g, n).values())
    assert got == want
    # fixed rounds >= diameter equal the fixpoint
    fixed = {
        r["node"]: r["ecc"]
        for r in gmetrics.eccentricity(df, iters=25).collect()
    }
    assert fixed == got


def test_dsir_weights_vs_handrolled(spark):
    import hashlib
    import math

    from renard_spark.functions.sampling import dsir_weights

    docs = [
        (1, "the cat sat on the mat", True),
        (2, "the dog sat on the log", True),
        (3, "zig zag zig zag zig", False),
        (4, "the cat and the dog", False),
        (5, "one", True),           # <2 tokens: no bigrams, dropped
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, is_target boolean"
    )
    B = 16
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_logweight"])
        for r in dsir_weights(df, n_buckets=B).collect()
    }

    def bucket(w1, w2):
        h = hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:8]
        return int(h, 16) % B

    raw, tgt, per_doc = {}, {}, {}
    for did, text, is_t in docs:
        toks = text.lower().split()
        for w1, w2 in zip(toks, toks[1:]):
            b = bucket(w1, w2)
            per_doc.setdefault(did, {}).setdefault(b, 0)
            per_doc[did][b] += 1
            raw[b] = raw.get(b, 0) + 1
            if is_t:
                tgt[b] = tgt.get(b, 0) + 1
    nr, nt = sum(raw.values()), sum(tgt.values())
    assert set(got) == set(per_doc)
    for did, bs in per_doc.items():
        w = sum(
            m * (math.log(tgt.get(b, 0) + 1) - math.log(nt + B)
                 - math.log(raw[b] + 1) + math.log(nr + B))
            for b, m in bs.items()
        )
        n_feats, lw = got[did]
        assert n_feats == sum(bs.values())
        assert abs(lw - w) < 1e-9, did


def test_blocking_quality_bruteforce(spark):
    from renard_spark.functions import dedup

    # 3 exact-dup groups (by normalized text) + distinct docs
    texts = [
        "alpha beta gamma delta", "alpha  beta gamma DELTA".lower(),
        "epsilon zeta eta theta", "epsilon zeta eta theta",
        "iota kappa lambda mu", "nu xi omicron pi",
        "rho sigma tau upsilon",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    row = dedup.blocking_quality(df, w=3, num_hashes=8, bands=4).first()
    assert row["n_docs"] == len(texts)
    # truth: normalized-identical pairs
    import re as _re

    def norm(t):
        return _re.sub(r"\s+", " ", t.lower()).strip()

    groups = {}
    for i, t in enumerate(texts):
        groups.setdefault(norm(t), []).append(i)
    n_truth = sum(len(v) * (len(v) - 1) // 2 for v in groups.values())
    assert row["n_truth_pairs"] == n_truth
    # exact dupes share every shingle, hence every band: LSH must
    # propose them all -> completeness 1.0
    assert row["n_hits"] == n_truth
    assert row["pairs_completeness"] == 1.0
    total = len(texts) * (len(texts) - 1) // 2
    assert abs(
        row["reduction_ratio"] - (1 - row["n_cand_pairs"] / total)
    ) < 1e-6
    assert row["n_cand_pairs"] <= total


def test_spanning_forest_matches_networkx(spark):
    # distinct weights -> the MST is unique: edge sets must match
    rng = random.Random(31)
    rows = _random_edges(31, n_nodes=22, n_edges=60)
    weights = rng.sample(range(1, 1000), len(rows))
    rows = [(a, b, w) for (a, b, _), w in zip(rows, weights)]
    # plus a second component
    rows += [("y1", "y2", 7), ("y2", "y3", 1001), ("y1", "y3", 1002)]
    df = spark.createDataFrame(rows, "src string, dst string, weight long")
    g = nx.Graph()
    for a, b, w in rows:
        g.add_edge(a, b, weight=w)
    for mode, nx_edges in (
        ("min", nx.minimum_spanning_edges),
        ("max", nx.maximum_spanning_edges),
    ):
        got = {
            (r["src"], r["dst"], r["weight"])
            for r in gmetrics.spanning_forest(df, mode=mode).collect()
        }
        want = {
            (min(a, b), max(a, b), d["weight"])
            for a, b, d in nx_edges(g, algorithm="kruskal", data=True)
        }
        assert got == want, mode


def test_spanning_forest_ties_total_weight(spark):
    # heavy ties: edge SET may differ from nx, total weight may not;
    # result must still be a spanning forest (acyclic, right count)
    rows = _random_edges(41, n_nodes=18, n_edges=50)
    rows = [(a, b, w % 3 + 1) for a, b, w in rows]
    df = spark.createDataFrame(rows, "src string, dst string, weight long")
    g = nx.Graph()
    for a, b, w in rows:
        g.add_edge(a, b, weight=w)
    got = [
        (r["src"], r["dst"], r["weight"])
        for r in gmetrics.spanning_forest(df, mode="min").collect()
    ]
    f = nx.Graph()
    f.add_weighted_edges_from(got)
    assert nx.is_forest(f)
    n_comp = nx.number_connected_components(g)
    assert len(got) == g.number_of_nodes() - n_comp
    want_w = sum(
        d["weight"]
        for _, _, d in nx.minimum_spanning_edges(g, data=True)
    )
    assert sum(w for _, _, w in got) == want_w


def _wl_reference(adj, iters):
    """Pure-python twin of graph.wl_refinement."""
    import hashlib

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    col = {n: h(str(len(nbrs))) for n, nbrs in adj.items()}
    for _ in range(iters):
        col = {
            n: h(col[n] + "|" + ",".join(sorted(col[m] for m in nbrs)))
            for n, nbrs in adj.items()
        }
    return col


def test_wl_refinement_matches_reference(spark):
    rows = _random_edges(23, n_nodes=20, n_edges=45)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    adj = {}
    for a, b, _ in rows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for iters in (1, 3):
        got = {
            r["node"]: r["wl_color"]
            for r in gmetrics.wl_refinement(df, iters=iters).collect()
        }
        assert got == _wl_reference(adj, iters)


def test_wl_graph_hash_isomorphism(spark):
    # doc 1 and doc 2: isomorphic (relabeled) graphs -> same hash;
    # doc 3: a different structure -> different hash
    tri_plus = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    relabel = {"a": "w", "b": "x", "c": "y", "d": "z"}
    path4 = [("p", "q"), ("q", "r"), ("r", "s")]
    rows = (
        [(1, u, v) for u, v in tri_plus]
        + [(2, relabel[u], relabel[v]) for u, v in tri_plus]
        + [(3, u, v) for u, v in path4]
    )
    df = spark.createDataFrame(rows, "doc_id long, src string, dst string")
    got = {
        r["doc_id"]: (r["wl_hash"], r["n_nodes"])
        for r in gmetrics.wl_graph_hash(df).collect()
    }
    assert got[1] == got[2]
    assert got[1][0] != got[3][0]
    assert got[3] == (got[3][0], 4)


def test_forman_curvature_matches_networkx_counts(spark):
    rows = _random_edges(53, n_nodes=20, n_edges=55)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    out = gmetrics.forman_curvature(df).collect()
    assert len(out) == g.number_of_edges()
    for r in out:
        u, v = r["src"], r["dst"]
        t = len(set(g.neighbors(u)) & set(g.neighbors(v)))
        assert r["support"] == t
        assert r["deg_src"] == g.degree(u)
        assert r["deg_dst"] == g.degree(v)
        assert r["curvature"] == 4 - g.degree(u) - g.degree(v) + 3 * t


def test_rich_club_matches_networkx(spark):
    rows = _random_edges(61, n_nodes=24, n_edges=70)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    got = {
        r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
        for r in gmetrics.rich_club(df).collect()
    }
    want_phi = nx.rich_club_coefficient(g, normalized=False)
    for k, (nn, ne, phi) in got.items():
        nodes = [n for n in g.nodes if g.degree(n) > k]
        sub = g.subgraph(nodes)
        assert nn == len(nodes), k
        assert ne == sub.number_of_edges(), k
        if nn >= 2:
            assert abs(phi - 2 * ne / (nn * (nn - 1))) < 1e-12
            if k in want_phi:
                assert abs(phi - want_phi[k]) < 1e-12
        else:
            assert phi is None
