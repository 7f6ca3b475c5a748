"""Graph-analytics operators vs independent oracles (networkx for
degrees, a hand-rolled power iteration for fixed-iter PageRank)."""

import random

import networkx as nx
import pytest
from pyspark.sql import functions as F

from renard_spark.functions import graph as gmetrics


def _random_edges(seed, n_nodes=40, n_edges=120):
    rng = random.Random(seed)
    seen = set()
    rows = []
    while len(rows) < n_edges:
        a, b = rng.sample(range(n_nodes), 2)
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        rows.append((f"n{key[0]}", f"n{key[1]}", rng.randint(1, 9)))
    return rows


def test_degrees_match_networkx(spark):
    rows = _random_edges(7)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: (r["degree"], r["strength"])
        for r in gmetrics.degrees(df).collect()
    }
    g = nx.Graph()
    for a, b, w in rows:
        g.add_edge(a, b, weight=w)
    want = {
        n: (g.degree(n), float(g.degree(n, weight="weight")))
        for n in g.nodes
    }
    assert got == want


def test_degrees_scoped_per_doc(spark):
    rows = [("d1", "a", "b", 2), ("d1", "a", "c", 3), ("d2", "a", "b", 5)]
    df = spark.createDataFrame(
        rows, "doc_id string, src string, dst string, weight int"
    )
    got = {
        (r["doc_id"], r["node"]): (r["degree"], r["strength"])
        for r in gmetrics.degrees(df, scope_cols=("doc_id",)).collect()
    }
    assert got[("d1", "a")] == (2, 5.0)
    assert got[("d1", "b")] == (1, 2.0)
    assert got[("d2", "a")] == (1, 5.0)
    assert ("d2", "c") not in got


def _power_iteration(rows, damping, iters):
    """Reference fixed-iteration weighted PageRank on the undirected
    graph — plain dicts, no library."""
    adj = {}
    for a, b, w in rows:
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    nodes = sorted(adj)
    n = len(nodes)
    strength = {u: float(sum(adj[u].values())) for u in nodes}
    r = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        nxt = {u: (1.0 - damping) / n for u in nodes}
        for u in nodes:
            for v, w in adj[u].items():
                nxt[v] += damping * r[u] * w / strength[u]
        r = nxt
    return r


def test_pagerank_matches_power_iteration(spark):
    rows = _random_edges(13, n_nodes=25, n_edges=60)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: r["rank"]
        for r in gmetrics.pagerank(df, damping=0.85, iters=10).collect()
    }
    want = _power_iteration(rows, 0.85, 10)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12)
    # ranks form a probability distribution (symmetric graph: no
    # dangling mass leaks)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_unweighted_uniform_on_cycle(spark):
    # on a cycle every node is symmetric → uniform ranks
    rows = [(f"n{i}", f"n{(i + 1) % 6}", 1) for i in range(6)]
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = gmetrics.pagerank(df, iters=5, weight=None).collect()
    for r in got:
        assert r["rank"] == pytest.approx(1.0 / 6, abs=1e-12)


def test_pagerank_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string, weight int")
    assert gmetrics.pagerank(df).count() == 0


def test_triangles_match_networkx(spark):
    rows = _random_edges(29, n_nodes=30, n_edges=90)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in gmetrics.triangles(df).collect()
    }
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    tri = nx.triangles(g)
    clu = nx.clustering(g)
    assert set(got) == set(g.nodes)
    for n in g.nodes:
        d, t, c = got[n]
        assert (d, t) == (g.degree(n), tri[n]), n
        assert c == pytest.approx(clu[n], abs=1e-12), n


def test_triangles_counts_each_once(spark):
    # K4: 4 triangles total, each node in 3; plus a pendant node
    rows = []
    nodes = ["a", "b", "c", "d"]
    for i in range(4):
        for j in range(i + 1, 4):
            rows.append((nodes[i], nodes[j], 1))
    rows.append(("d", "e", 1))
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {r["node"]: r for r in gmetrics.triangles(df).collect()}
    for n in "abc":
        assert got[n]["n_triangles"] == 3
        assert got[n]["clustering"] == 1.0
    assert got["d"]["n_triangles"] == 3 and got["d"]["degree"] == 4
    assert got["e"]["n_triangles"] == 0 and got["e"]["clustering"] == 0.0


def _sync_lpa(rows, iters):
    """Pure-Python synchronous weighted LPA with (max weight-sum,
    min label) tie-break — the independent oracle."""
    adj = {}
    for a, b, w in rows:
        adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0) + w
        adj.setdefault(b, {})[a] = adj.setdefault(b, {}).get(a, 0) + w
    labels = {u: u for u in adj}
    for _ in range(iters):
        nxt = {}
        for u in adj:
            votes = {}
            for v, w in adj[u].items():
                votes[labels[v]] = votes.get(labels[v], 0.0) + w
            nxt[u] = min(votes, key=lambda l: (-votes[l], l))
        labels = nxt
    return labels


def test_lpa_matches_pure_sync(spark):
    rows = _random_edges(41, n_nodes=30, n_edges=70)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: r["label"]
        for r in gmetrics.label_propagation(df, iters=5).collect()
    }
    assert got == _sync_lpa(rows, 5)


def test_lpa_two_cliques_with_bridge(spark):
    # two K4 cliques joined by one weak bridge → two communities,
    # each labelled by its clique's smallest node id
    rows = []
    for names in (["a1", "a2", "a3", "a4"], ["b1", "b2", "b3", "b4"]):
        for i in range(4):
            for j in range(i + 1, 4):
                rows.append((names[i], names[j], 5))
    rows.append(("a4", "b1", 1))
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: r["label"]
        for r in gmetrics.label_propagation(df, iters=5).collect()
    }
    assert {got[n] for n in ("a1", "a2", "a3", "a4")} == {"a1"}
    assert {got[n] for n in ("b1", "b2", "b3", "b4")} == {"b1"}


def test_k_core_matches_networkx(spark):
    rows = _random_edges(57, n_nodes=30, n_edges=70)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    for k in (2, 3, 4):
        got = {
            r["node"]: r["degree"]
            for r in gmetrics.k_core(df, k=k).collect()
        }
        core = nx.k_core(g, k=k)
        assert got == {n: core.degree(n) for n in core.nodes}, k


def test_k_core_peels_chain_entirely(spark):
    # a path graph has no 2-core: peeling cascades end-to-end
    rows = [(f"n{i}", f"n{i+1}", 1) for i in range(8)]
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    assert gmetrics.k_core(df, k=2).count() == 0
    # but a triangle hanging off the chain survives as the 2-core
    rows += [("n0", "x", 1), ("x", "y", 1), ("y", "n0", 1)]
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {r["node"]: r["degree"] for r in gmetrics.k_core(df, k=2).collect()}
    assert got == {"n0": 2, "x": 2, "y": 2}


def test_core_number_matches_networkx(spark):
    rows = _random_edges(91, n_nodes=40, n_edges=140)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    got = {
        r["node"]: r["core_number"]
        for r in gmetrics.core_number(df).collect()
    }
    assert got == nx.core_number(g)


def test_core_number_fixed_rounds_converge(spark):
    # the driver query unrolls a fixed round count on both engines; the
    # h-index iteration must have converged by then (monotone, so extra
    # rounds are no-ops) — assert fixed-round == fixpoint == networkx
    rows = _random_edges(17, n_nodes=35, n_edges=110)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    fixed = {
        r["node"]: r["core_number"]
        for r in gmetrics.core_number(df, iters=8).collect()
    }
    assert fixed == nx.core_number(g)


def test_core_number_path_and_clique(spark):
    # path: all coreness 1; clique K5: all coreness 4
    rows = [(f"p{i}", f"p{i+1}", 1) for i in range(6)]
    rows += [
        (f"c{i}", f"c{j}", 1) for i in range(5) for j in range(i + 1, 5)
    ]
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: r["core_number"]
        for r in gmetrics.core_number(df).collect()
    }
    want = {f"p{i}": 1 for i in range(7)} | {f"c{i}": 4 for i in range(5)}
    assert got == want


def test_bfs_distances_match_networkx(spark):
    rows = _random_edges(23, n_nodes=30, n_edges=60)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    source = sorted(g.nodes)[0]
    got = {
        r["node"]: r["distance"]
        for r in gmetrics.bfs_distances(df, source).collect()
    }
    want = nx.single_source_shortest_path_length(g, source)
    # unreachable nodes are absent on both sides
    assert got == dict(want)


def test_bfs_fixed_rounds_converge(spark):
    # the driver unrolls BFS_ROUNDS on both engines: fixed-round must
    # equal the fixpoint whenever rounds >= diameter
    rows = [(f"n{i}", f"n{i+1}", 1) for i in range(6)]  # diameter 6
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: r["distance"]
        for r in gmetrics.bfs_distances(df, "n0", iters=8).collect()
    }
    assert got == {f"n{i}": i for i in range(7)}


def test_pmi_edges_match_numpy(spark):
    import math

    rows = _random_edges(41, n_nodes=20, n_edges=50)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        (r["src"], r["dst"]): (r["weight"], r["pmi"])
        for r in gmetrics.pmi_edges(df).collect()
    }
    w = {(min(a, b), max(a, b)): float(wt) for a, b, wt in rows}
    total = sum(w.values())
    s: dict[str, float] = {}
    for (a, b), wt in w.items():
        s[a] = s.get(a, 0.0) + wt
        s[b] = s.get(b, 0.0) + wt
    for (a, b), wt in w.items():
        want = max(
            math.log((wt / total) / ((s[a] / (2 * total)) * (s[b] / (2 * total)))),
            0.0,
        )
        gw, gp = got[(a, b)]
        assert gw == wt and abs(gp - want) < 1e-9, (a, b)
    # frequent-hub suppression property: PPMI of a pair of hubs with an
    # average edge is below that of an exclusive low-degree pair
    excl = spark.createDataFrame(
        [("h1", "h2", 10), ("h1", "x", 10), ("h2", "y", 10), ("p", "q", 10)],
        "src string, dst string, weight int",
    )
    pm = {(r.src, r.dst): r.pmi for r in gmetrics.pmi_edges(excl).collect()}
    assert pm[("p", "q")] > pm[("h1", "h2")]


def test_weighted_distances_match_networkx(spark):
    rows = _random_edges(67, n_nodes=25, n_edges=55)
    df = spark.createDataFrame(
        rows, "src string, dst string, weight int"
    ).withColumn("cost", 1.0 / F.col("weight"))
    g = nx.Graph()
    for a, b, w in rows:
        # mirror the operator's parallel-edge min (none here, but keep
        # the convention explicit)
        g.add_edge(a, b, cost=1.0 / w)
    source = sorted(g.nodes)[0]
    got = {
        r["node"]: r["distance"]
        for r in gmetrics.weighted_distances(df, source).collect()
    }
    want = nx.single_source_dijkstra_path_length(g, source, weight="cost")
    assert set(got) == set(want)
    for n, d in want.items():
        assert abs(got[n] - d) < 1e-9, n


def _hits_reference(rows, iters):
    """Hand-rolled fixed-iteration HITS with the operator's exact
    schedule (auth step, L1-normalize, hub step, L1-normalize)."""
    nodes = sorted({r[0] for r in rows} | {r[1] for r in rows})
    idx = {v: i for i, v in enumerate(nodes)}
    import numpy as np

    W = np.zeros((len(nodes), len(nodes)))
    for a, b, w in rows:
        W[idx[a], idx[b]] += w
        W[idx[b], idx[a]] += w
    h = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(iters):
        a = W.T @ h
        a = a / a.sum()
        h = W @ a
        h = h / h.sum()
    return (
        {v: h[idx[v]] for v in nodes},
        {v: a[idx[v]] for v in nodes},
    )


def test_hits_matches_hand_rolled(spark):
    rows = _random_edges(17, n_nodes=25, n_edges=60)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in gmetrics.hits(df, iters=8).collect()
    }
    wh, wa = _hits_reference(rows, 8)
    assert set(got) == set(wh)
    for node in wh:
        assert got[node][0] == pytest.approx(wh[node], abs=1e-12)
        assert got[node][1] == pytest.approx(wa[node], abs=1e-12)
    # both score vectors are L1-normalized distributions
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_converges_to_principal_eigenvector(spark):
    # at convergence on a symmetric graph, hub == auth == the L1-
    # normalized principal eigenvector of the weighted adjacency
    # (networkx's hits oracle needs scipy, absent here — numpy eigh on
    # the symmetric matrix is the same converged answer)
    import numpy as np

    rows = _random_edges(23, n_nodes=15, n_edges=40)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in gmetrics.hits(df, iters=40).collect()
    }
    nodes = sorted({r[0] for r in rows} | {r[1] for r in rows})
    idx = {v: i for i, v in enumerate(nodes)}
    W = np.zeros((len(nodes), len(nodes)))
    for a, b, w in rows:
        W[idx[a], idx[b]] += w
        W[idx[b], idx[a]] += w
    vals, vecs = np.linalg.eigh(W)
    v = vecs[:, np.argmax(vals)]
    v = np.abs(v)
    v = v / v.sum()
    for node in nodes:
        assert got[node][0] == pytest.approx(v[idx[node]], abs=1e-5)
        assert got[node][1] == pytest.approx(v[idx[node]], abs=1e-5)


def test_hits_empty_edges(spark):
    df = spark.createDataFrame([], "src string, dst string, weight int")
    assert gmetrics.hits(df).count() == 0


def test_harmonic_centrality_matches_networkx(spark):
    rows = _random_edges(31, n_nodes=24, n_edges=48)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    got = {
        r["node"]: round(r["harmonic"], 9)
        for r in gmetrics.harmonic_centrality(df).collect()
    }
    want = {
        n: round(v, 9) for n, v in nx.harmonic_centrality(g).items()
    }
    assert got == want


def test_harmonic_centrality_sampled_sources(spark):
    rows = [("a", "b", 1), ("b", "c", 1), ("c", "d", 1), ("x", "y", 1)]
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        r["node"]: round(r["harmonic"], 9)
        for r in gmetrics.harmonic_centrality(
            df, sources=["a", "x", "zz-not-in-graph"]
        ).collect()
    }
    # a: b=1, c=2, d=3 -> 1 + 1/2 + 1/3; x: y=1 (other component)
    assert got == {"a": round(1 + 0.5 + 1 / 3, 9), "x": 1.0}


def test_betweenness_matches_networkx(spark):
    rows = _random_edges(47, n_nodes=18, n_edges=32)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    got = {
        r["node"]: round(r["betweenness"], 9)
        for r in gmetrics.betweenness_centrality(df).collect()
    }
    want = {
        n: round(v, 9)
        for n, v in nx.betweenness_centrality(g, normalized=False).items()
    }
    assert got == want


def test_betweenness_fixed_rounds_converge(spark):
    # path graph diameter 6: fixed 8 rounds must equal the fixpoint
    rows = [(f"n{i}", f"n{i+1}", 1) for i in range(6)]
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    fixed = {
        r["node"]: round(r["betweenness"], 9)
        for r in gmetrics.betweenness_centrality(df, iters=8).collect()
    }
    free = {
        r["node"]: round(r["betweenness"], 9)
        for r in gmetrics.betweenness_centrality(df).collect()
    }
    g = nx.path_graph(7)
    want = {
        f"n{n}": round(v, 9)
        for n, v in nx.betweenness_centrality(g, normalized=False).items()
    }
    assert fixed == free == want


def test_assortativity_matches_networkx(spark):
    rows = _random_edges(53, n_nodes=20, n_edges=45)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    got = gmetrics.assortativity(df).collect()[0]["assortativity"]
    want = nx.degree_assortativity_coefficient(g)
    assert got == pytest.approx(want, abs=1e-9)


def test_modularity_matches_networkx(spark):
    rows = _random_edges(59, n_nodes=20, n_edges=40)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    g = nx.Graph()
    for a, b, w in rows:
        # duplicate pairs collapse in the nx oracle exactly as the
        # operator consumes the aggregated edge table
        g.add_edge(a, b, weight=max(w, g.get_edge_data(a, b, {}).get(
            "weight", 0)))
    agg = (
        df.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    comms = gmetrics.label_propagation(agg, iters=4)
    got = gmetrics.modularity(agg, comms).collect()[0]["modularity"]
    parts: dict = {}
    for r in comms.collect():
        parts.setdefault(r["label"], set()).add(r["node"])
    want = nx.community.modularity(g, parts.values(), weight="weight")
    assert got == pytest.approx(want, abs=1e-9)


def test_link_prediction_matches_networkx(spark):
    rows = _random_edges(23, n_nodes=25, n_edges=50)
    df = spark.createDataFrame(rows, "src string, dst string, weight int")
    got = {
        (r.u, r.v): (r.common_neighbors, r.jaccard, r.adamic_adar)
        for r in gmetrics.link_prediction_scores(df).collect()
    }
    g = nx.Graph()
    for a, b, _ in rows:
        g.add_edge(a, b)
    want = {}
    for u, v in nx.non_edges(g):
        u, v = min(u, v), max(u, v)
        cn = list(nx.common_neighbors(g, u, v))
        if not cn:
            continue  # only distance-2 pairs are emitted
        (_, _, jac), = nx.jaccard_coefficient(g, [(u, v)])
        (_, _, aa), = nx.adamic_adar_index(g, [(u, v)])
        want[(u, v)] = (len(cn), jac, aa)
    assert set(got) == set(want)
    for k, (cn, jac, aa) in want.items():
        assert got[k][0] == cn
        assert got[k][1] == pytest.approx(jac, abs=1e-9)
        assert got[k][2] == pytest.approx(aa, abs=1e-9)


def test_link_prediction_scoped_isolates_docs(spark):
    # two docs with the same path graph a-b-c: the (a,c) candidate must
    # appear once PER DOC, never across docs
    rows = [("d1", "a", "b", 1), ("d1", "b", "c", 1),
            ("d2", "a", "b", 1), ("d2", "b", "c", 1)]
    df = spark.createDataFrame(
        rows, "doc_id string, src string, dst string, weight int"
    )
    out = gmetrics.link_prediction_scores(
        df, scope_cols=("doc_id",)
    ).collect()
    assert sorted((r.doc_id, r.u, r.v) for r in out) == [
        ("d1", "a", "c"), ("d2", "a", "c")
    ]
    for r in out:
        assert r.common_neighbors == 1
        assert r.jaccard == pytest.approx(1.0)  # 1 / (1 + 1 - 1)


def test_random_walks_match_python_twin(spark):
    import hashlib

    from renard_spark.functions.graph import random_walks

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(
        [(s, t, 1.0) for s, t in edges], "src string, dst string, weight double"
    )
    R, L, seed = 2, 5, "walk"
    got = sorted(
        (r.walk_id, r.step, r.node)
        for r in random_walks(df, walks_per_node=R, walk_len=L, seed=seed).collect()
    )

    adjd: dict = {}
    for a, b in edges:
        adjd.setdefault(a, set()).add(b)
        adjd.setdefault(b, set()).add(a)
    adj = {k: sorted(v) for k, v in adjd.items()}
    want = []
    for u in adj:
        for i in range(R):
            wid = f"{u}:{i}"
            cur = u
            want.append((wid, 0, u))
            for t in range(1, L):
                nb = adj[cur]
                h = hashlib.md5(f"{seed}:{wid}:{t}".encode()).hexdigest()[:8]
                cur = nb[int(h, 16) % len(nb)]
                want.append((wid, t, cur))
    assert got == sorted(want)
    # every consecutive pair really is an edge
    seq: dict = {}
    for wid, t, node in got:
        seq.setdefault(wid, {})[t] = node
    und = {frozenset(e) for e in edges}
    for wid, steps in seq.items():
        assert len(steps) == L
        for t in range(1, L):
            assert frozenset((steps[t - 1], steps[t])) in und


def test_skipgram_pairs_window_semantics(spark):
    from renard_spark.functions.graph import skipgram_pairs

    walks = spark.createDataFrame(
        [("w0", 0, "a"), ("w0", 1, "b"), ("w0", 2, "c"), ("w0", 3, "d"),
         ("w1", 0, "a"), ("w1", 1, "b")],
        "walk_id string, step int, node string",
    )
    got = {(r.center, r.context): r.n_pairs
           for r in skipgram_pairs(walks, window=2).collect()}
    # window 2 on w0: a sees b,c; b sees a,c,d; etc. w1 adds (a,b),(b,a)
    assert got[("a", "b")] == 2 and got[("b", "a")] == 2
    assert got[("a", "c")] == 1 and got[("c", "a")] == 1
    assert ("a", "d") not in got          # distance 3 > window
    assert all(c != x for c, x in got)    # no self pairs
    # symmetric corpus: count(x,y) == count(y,x)
    assert all(got[(y, x)] == n for (x, y), n in got.items())


def test_node2vec_walks_match_python_twin(spark):
    import hashlib

    from renard_spark.functions.graph import node2vec_walks

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
             ("e", "a"), ("b", "d")]
    df = spark.createDataFrame(
        [(s, t, 1.0) for s, t in edges], "src string, dst string, weight double"
    )
    R, L, p, q, seed = 2, 6, 4.0, 2.0, "n2v"
    got = sorted(
        (r.walk_id, r.step, r.node)
        for r in node2vec_walks(
            df, walks_per_node=R, walk_len=L, p=p, q=q, seed=seed
        ).collect()
    )

    adjd: dict = {}
    for a, b in edges:
        adjd.setdefault(a, set()).add(b)
        adjd.setdefault(b, set()).add(a)
    adj = {k: sorted(v) for k, v in adjd.items()}

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    want = []
    for u in adj:
        for i in range(R):
            wid = f"{u}:{i}"
            want.append((wid, 0, u))
            nb = adj[u]
            cur = nb[h32(f"{seed}:{wid}:1") % len(nb)]
            prev = u
            want.append((wid, 1, cur))
            for t in range(2, L):
                nbrs = adj[cur]
                ws = [
                    (1.0 / p) if x == prev
                    else 1.0 if x in adjd[prev]
                    else (1.0 / q)
                    for x in nbrs
                ]
                total = sum(ws)
                tgt = (h32(f"{seed}:{wid}:{t}") / 4294967296.0) * total
                cum, idx = 0.0, len(nbrs) - 1
                for j, w in enumerate(ws):
                    cum += w
                    if cum > tgt:
                        idx = j
                        break
                prev, cur = cur, nbrs[idx]
                want.append((wid, t, cur))
    assert got == sorted(want)
