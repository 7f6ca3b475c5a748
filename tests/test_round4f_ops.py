"""Round-4 session-4 operators: RDFS entailment, SPARQL OPTIONAL /
FILTER in the BGP compiler, and the N-Triples reader / roundtrip."""

import pytest
from pyspark.sql import functions as F

from renard_spark.functions.kgquery import bgp_match
from renard_spark.functions.ontology import (
    DOMAIN,
    RANGE,
    SUB_CLASS_OF,
    SUB_PROPERTY_OF,
    rdfs_closure,
    rdfs_closure_py,
)
from renard_spark.io.ntriples import (
    ntriples_to_triples,
    parse_ntriples,
    triples_to_ntriples,
)

SCHEMA = [
    # property chain of depth 3 (exercises the doubling closure)
    ("scans", SUB_PROPERTY_OF, "reads"),
    ("reads", SUB_PROPERTY_OF, "uses"),
    ("uses", SUB_PROPERTY_OF, "interacts_with"),
    ("sorts", SUB_PROPERTY_OF, "interacts_with"),
    # domain/range at two hierarchy levels
    ("scans", DOMAIN, "reader"),
    ("uses", DOMAIN, "participant"),
    ("interacts_with", RANGE, "participant"),
    # class chain of depth 2
    ("reader", SUB_CLASS_OF, "participant"),
    ("participant", SUB_CLASS_OF, "thing"),
]

FACTS = [
    ("alice", "scans", "table1"),
    ("bob", "sorts", "table2"),
    ("carol", "likes", "dave"),  # no schema for 'likes': passes through
    ("eve", "type", "reader"),  # explicit type fact climbs the classes
]


def _run_closure(spark, facts, schema):
    fdf = spark.createDataFrame(facts, "subj string, pred string, obj string")
    sdf = spark.createDataFrame(schema, "subj string, pred string, obj string")
    got = rdfs_closure(fdf, sdf)
    return {tuple(r) for r in got.collect()}


def test_rdfs_closure_matches_naive_fixpoint(spark):
    got = _run_closure(spark, FACTS, SCHEMA)
    want = rdfs_closure_py(FACTS, SCHEMA)
    assert got == want
    # spot invariants: property chain rolled all the way up, domain on
    # an INHERITED predicate fires, range types the object, explicit
    # type fact reaches the top class
    assert ("alice", "interacts_with", "table1") in got
    assert ("alice", "type", "participant") in got  # via uses' domain
    assert ("table1", "type", "participant") in got  # via range
    assert ("alice", "type", "reader") in got
    assert ("eve", "type", "thing") in got
    assert ("carol", "likes", "dave") in got
    # nothing invents types for schema-free predicates
    assert not any(s == "carol" and p == "type" for s, p, o in got)


def test_rdfs_closure_no_schema_is_identity(spark):
    fdf = spark.createDataFrame(FACTS, "subj string, pred string, obj string")
    sdf = spark.createDataFrame(
        [], "subj string, pred string, obj string"
    )
    got = {tuple(r) for r in rdfs_closure(fdf, sdf).collect()}
    assert got == set(FACTS)


TRIPLES = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("a", "likes", "c"),
    ("c", "knows", "a"),
    ("d", "likes", "a"),
]


def _brute_optional(triples, req, opt):
    """Reference OPTIONAL semantics: enumerate required bindings, then
    per row the optional group's compatible bindings (left join)."""

    def bind(patterns, binding):
        results = [binding]
        for pat in patterns:
            nxt = []
            for b in results:
                for t in triples:
                    bb = dict(b)
                    ok = True
                    for term, val in zip(pat, t):
                        if term.startswith("?"):
                            v = term[1:]
                            if v in bb and bb[v] != val:
                                ok = False
                                break
                            bb[v] = val
                        elif term != val:
                            ok = False
                            break
                    if ok:
                        nxt.append(bb)
            results = nxt
        return results

    out = []
    opt_vars = {
        t[1:] for pat in opt for t in pat if t.startswith("?")
    }
    for b in bind(req, {}):
        exts = bind(opt, dict(b))
        if exts:
            out.extend(exts)
        else:
            row = dict(b)
            for v in opt_vars - set(b):
                row[v] = None
            out.append(row)
    return out


def test_bgp_optional_matches_bruteforce(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    req = [("?x", "knows", "?y")]
    opt = [("?y", "likes", "?z")]
    res = bgp_match(df, req, optionals=[opt])
    got = sorted(
        tuple(r[c] for c in sorted(["x", "y", "z"])) for r in res.collect()
    )
    want = sorted(
        tuple(b[v] for v in sorted(["x", "y", "z"]))
        for b in _brute_optional(TRIPLES, req, opt)
    )
    assert got == want
    # the unmatched side must be present with NULL z
    assert any(z is None for (_, _, z) in got)


def test_bgp_two_optionals_and_filter(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    res = bgp_match(
        df,
        [("?x", "knows", "?y")],
        optionals=[[("?y", "likes", "?z")], [("?z", "knows", "?w")]],
        filters=["z IS NOT NULL"],
    )
    rows = {tuple(r) for r in res.collect()}
    # only surviving binding: x=c knows y=a; a likes z=c; c knows w=a
    assert rows == {("a", "c", "a", "c")}  # (w, x, y, z) sorted cols
    assert res.columns == ["w", "x", "y", "z"]


def test_bgp_property_path_plus(spark):
    chain = [
        ("a", "knows", "b"),
        ("b", "knows", "c"),
        ("c", "knows", "d"),
        ("c", "likes", "e"),
    ]
    df = spark.createDataFrame(chain, "subj string, pred string, obj string")
    res = bgp_match(df, [("?x", "knows+", "?y")])
    got = {tuple(r) for r in res.collect()}
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }
    # path pattern composes with plain patterns on shared variables
    res2 = bgp_match(df, [("?x", "knows+", "?y"), ("?y", "likes", "?z")])
    assert {tuple(r) for r in res2.collect()} == {
        ("a", "c", "e"), ("b", "c", "e"),
    }


def test_bgp_property_path_cycle_reachability(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    res = bgp_match(df, [("?x", "knows+", "?y")])
    got = {tuple(r) for r in res.collect()}
    # brute-force reachability over the 'knows' slice (cyclic: a,b,c)
    edges = {(s, o) for s, p, o in TRIPLES if p == "knows"}
    reach = set(edges)
    changed = True
    while changed:
        ext = {(a, d) for a, b in reach for c, d in edges if b == c}
        changed = not ext <= reach
        reach |= ext
    assert got == reach
    assert ("a", "a") in got  # cycle self-reachability


def test_bgp_optional_requires_shared_variable(spark):
    df = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    with pytest.raises(ValueError):
        bgp_match(df, [("?x", "knows", "?y")], optionals=[[("?p", "likes", "?q")]])
    with pytest.raises(ValueError):
        bgp_match(df, [("?x", "knows", "?y")], optionals=[[]])


NASTY_NAMES = [
    'quote"inside',
    "back\\slash",
    "new\nline",
    "tab\there",
    "carriage\rreturn",
    "unicode-ünïcødé-日本語",
    "emoji-\U0001f600-pair",
    "plain",
]


def test_ntriples_roundtrip_nasty_names(spark):
    facts = [
        (NASTY_NAMES[i], "interacts_with", NASTY_NAMES[(i + 1) % len(NASTY_NAMES)])
        for i in range(len(NASTY_NAMES))
    ]
    tdf = spark.createDataFrame(facts, "subj string, pred string, obj string")
    lines = triples_to_ntriples(tdf)
    back = ntriples_to_triples(lines)
    assert {tuple(r) for r in back.collect()} == set(facts)


def test_parse_ntriples_terms_escapes_and_junk(spark):
    lines = [
        ("<http://x/s> <http://x/p> <http://x/o> .",),
        ('_:b1 <http://x/p> "a\\u0041\\U0001F600\\ud83d\\ude00b\\\\\\"\\n" .',),
        ("# a comment",),
        ("",),
        ("not a triple at all",),
    ]
    df = spark.createDataFrame(lines, "line string")
    got = parse_ntriples(df).collect()
    by_kind = {r["obj_kind"]: r for r in got}
    assert by_kind["iri"]["subj"] == "http://x/s"
    assert by_kind["iri"]["obj"] == "http://x/o"
    lit = by_kind["literal"]
    assert lit["subj"] == "_:b1"
    assert lit["obj"] == 'aA\U0001f600\U0001f600b\\"\n'
    # junk line surfaces as NULL kind, comments/blanks are gone
    assert None in by_kind and len(got) == 3
