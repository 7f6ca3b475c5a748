"""The linked_characters driver queries rest on a claim: for two-token
mentions synthesized from (first, last) token bigrams with case
alternating by position parity, GraphRules unification
(unify_core.unify_doc — link rules + contradiction edge removal + CC)
produces EXACTLY the components of this SQL-expressible edge set:

  * shared first token (always survives — the contradiction needs
    case-sensitively equal lasts, impossible across distinct mentions
    with equal lower firsts);
  * shared lower last token with OPPOSITE casing (same-case pairs are
    linked then contradiction-cut: both firsts non-empty and
    case-sensitively different; the cut removes exactly the direct
    edge since it is the unique shortest path at cut time).

This property test proves that claim over random corpora, so the DuckDB
recursive-CTE oracle in __spark_entry__._ORACLE_LINKED is a faithful
independent oracle for the engine's hardest operator.
"""

import itertools
import random

from renard_spark.operators.unify_core import unify_doc

FIRSTS = ["spark", "customer", "vector", "window"]
LASTS = ["table", "stream", "batch", "join"]
VOCAB = FIRSTS + LASTS + ["a", "the", "data", "value", "row"]


def _mentions_of(toks):
    out = []
    for i in range(len(toks) - 1):
        if toks[i] in FIRSTS and toks[i + 1] in LASTS:
            if i % 2 == 0:
                m = toks[i].capitalize() + " " + toks[i + 1].capitalize()
            else:
                m = toks[i] + " " + toks[i + 1]
            out.append((m, i, i + 2, toks[i], toks[i + 1], i % 2 == 0))
    return out

def _predicted_components(names):
    # names: {mention: (fi, la, up)}
    adj = {m: set() for m in names}
    for (m1, (f1, l1, u1)), (m2, (f2, l2, u2)) in itertools.combinations(
        sorted(names.items()), 2
    ):
        if f1 == f2 or (l1 == l2 and u1 != u2):
            adj[m1].add(m2)
            adj[m2].add(m1)
    comps, seen = [], set()
    for m in sorted(names):
        if m in seen:
            continue
        stack, comp = [m], set()
        while stack:
            u = stack.pop()
            if u in comp:
                continue
            comp.add(u)
            stack.extend(adj[u])
        seen |= comp
        comps.append(tuple(sorted(comp)))
    return set(comps)


def test_unify_doc_equals_sql_edge_semantics_randomized():
    rng = random.Random(7)
    nontrivial = 0
    for _ in range(400):
        toks = [rng.choice(VOCAB) for _ in range(rng.randint(5, 60))]
        ms = _mentions_of(toks)
        mentions = [(m, s, e) for m, s, e, *_ in ms]
        names = {m: (fi, la, up) for m, _, _, fi, la, up in ms}
        chars = unify_doc(mentions)
        got = set(tuple(c["names"]) for c in chars)
        assert got == _predicted_components(names), toks
        for c in chars:
            assert c["char_id"] == c["names"][0]
            if len(c["names"]) >= 2:
                nontrivial += 1
    # the corpus shape actually produces multi-name components
    assert nontrivial > 100


def test_mixed_case_last_link_survives_same_case_is_cut():
    # mixed case, shared last → one component (link survives)
    chars = unify_doc([("Spark Table", 0, 2), ("customer table", 3, 5)])
    assert [c["names"] for c in chars] == [["Spark Table", "customer table"]]
    # same case, shared last, different firsts → contradiction cuts it
    chars = unify_doc([("spark table", 0, 2), ("customer table", 3, 5)])
    assert sorted(c["char_id"] for c in chars) == [
        "customer table", "spark table"
    ]
    # shared first is never cut
    chars = unify_doc([("spark table", 0, 2), ("spark join", 3, 5)])
    assert [c["names"] for c in chars] == [["spark join", "spark table"]]
