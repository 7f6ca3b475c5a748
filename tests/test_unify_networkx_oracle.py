"""Independent unification oracle: the reference's exact algorithm
expressed over networkx (available as a TEST dependency only, never in
the engine), run in the engine's canonical order — compared against
unify_core.unify_doc on randomized name sets, plus a triple-P/R gate
on full pipeline output (the BASELINE.json ≥0.95 criterion)."""

import random
from itertools import combinations

import networkx as nx
import pytest

from renard_spark.functions.metrics import triple_prf
from renard_spark.functions.names import parse_name
from renard_spark.operators.unify_core import infer_gender, unify_doc
from renard_spark.resources.gazetteers import hypocorism_related

FIRSTS = ["Elizabeth", "Jane", "Lydia", "Charles", "William", "George",
          "Catherine", "Edward", "Charlotte", "Fitzwilliam"]
LASTS = ["Bennet", "Darcy", "Bingley", "Collins", "Lucas", "Wickham"]
NICKS = ["Lizzy", "Eliza", "Charlie", "Bill", "Will", "Kitty", "Ned", "Ted",
         "Lottie"]
TITLES = ["Mr", "Mrs", "Miss", "Sir", "Lady"]


def random_names(rng, k):
    pool = []
    for _ in range(k):
        shape = rng.randrange(5)
        if shape == 0:
            pool.append(rng.choice(FIRSTS))
        elif shape == 1:
            pool.append(f"{rng.choice(FIRSTS)} {rng.choice(LASTS)}")
        elif shape == 2:
            pool.append(f"{rng.choice(TITLES)} {rng.choice(LASTS)}")
        elif shape == 3:
            pool.append(rng.choice(NICKS))
        else:
            pool.append(
                f"{rng.choice(TITLES)} {rng.choice(FIRSTS)} {rng.choice(LASTS)}"
            )
    return sorted(set(pool))


def nx_reference_unify(names):
    """The reference algorithm (character_unification.py:217-342) on
    networkx, canonical (sorted) iteration order, no corefs."""
    G = nx.Graph()
    G.add_nodes_from(names)
    parsed = {n: parse_name(n) for n in names}

    def related_after_title_removal(p1, p2):
        r1, r2 = p1.without_title, p2.without_title
        if r1 == "" or r2 == "":
            return False
        return r1.lower() == r2.lower() or hypocorism_related(r1, r2)

    for n1, n2 in combinations(sorted(names), 2):
        p1, p2 = parsed[n1], parsed[n2]
        if hypocorism_related(n1, n2):
            G.add_edge(n1, n2)
            continue
        if related_after_title_removal(p1, p2):
            G.add_edge(n1, n2)
            continue
        if p1.last != "" and p1.last.lower() == p2.last.lower():
            G.add_edge(n1, n2)
            continue
        if p1.first != "" and p1.first.lower() == p2.first.lower():
            G.add_edge(n1, n2)

    for n in G.nodes():
        G.nodes[n]["gender"] = infer_gender(n, None, "eng")

    def try_remove(paths_gen):
        # remove_edges_from consumes each path as an edge tuple:
        # only (path[0], path[1]) is removed (2- and 3-tuples)
        try:
            edges = [tuple(p[:2]) for p in paths_gen]
            G.remove_edges_from(edges)
        except nx.NetworkXNoPath:
            pass

    for n1, n2 in combinations(sorted(names), 2):
        p1, p2 = parsed[n1], parsed[n2]
        if (
            p1.last != "" and p2.last != ""
            and p1.first != "" and p2.first != ""
            and p1.last == p2.last
            and p1.first != p2.first
        ):
            try:
                try_remove(nx.all_shortest_paths(G, n1, n2))
            except nx.NetworkXNoPath:
                pass
            continue
        g1, g2 = G.nodes[n1]["gender"], G.nodes[n2]["gender"]
        if g1 != g2 and g1 != "UNKNOWN" and g2 != "UNKNOWN":
            try:
                try_remove(nx.all_shortest_paths(G, n1, n2))
            except nx.NetworkXNoPath:
                pass

    return sorted(tuple(sorted(c)) for c in nx.connected_components(G))


@pytest.mark.parametrize("seed", range(30))
def test_components_match_networkx_reference(seed):
    rng = random.Random(seed)
    names = random_names(rng, rng.randint(2, 12))
    mentions = [(n, 10 * i, 10 * i + len(n.split())) for i, n in enumerate(names)]
    got = sorted(tuple(c["names"]) for c in unify_doc(mentions))
    want = nx_reference_unify(names)
    assert got == want, names


def test_triple_pr_against_networkx_pipeline():
    """Full-doc parity: triples built from networkx-oracle components
    + the sequential co-occurrence oracle vs the engine core — the
    P/R≥0.95 criterion from BASELINE.json, measured exactly."""
    from .oracle import cooccur_edges_oracle

    rng = random.Random(99)
    all_pred, all_gold = [], []
    for doc in range(40):
        names = random_names(rng, rng.randint(3, 10))
        mentions = []
        pos = 0
        for _ in range(rng.randint(5, 40)):
            n = rng.choice(names)
            mentions.append((n, pos, pos + len(n.split())))
            pos += rng.randint(2, 8)
        # engine: unify → edges
        chars = unify_doc(mentions)
        key_of = {}
        for c in chars:
            for n in c["names"]:
                key_of[n] = c["char_id"]
        engine_m = [(key_of[m[0]], m[1], m[2]) for m in mentions if m[0] in key_of]
        engine_edges = cooccur_edges_oracle(engine_m, 3, "tokens")
        # oracle: networkx components → same edge extraction
        comps = nx_reference_unify(names)
        okey = {}
        for comp in comps:
            for n in comp:
                okey[n] = comp[0]
        oracle_m = [(okey[m[0]], m[1], m[2]) for m in mentions if m[0] in okey]
        oracle_edges = cooccur_edges_oracle(oracle_m, 3, "tokens")
        all_pred += [(doc, a, b, w) for (a, b), (w, _) in engine_edges.items()]
        all_gold += [(doc, a, b, w) for (a, b), (w, _) in oracle_edges.items()]

    p, r, f1 = triple_prf(all_pred, all_gold)
    assert p >= 0.95 and r >= 0.95, (p, r, f1)
