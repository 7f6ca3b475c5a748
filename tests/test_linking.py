"""KB entity linking (operators/linking.py): candidate generation,
context disambiguation, prior fallback, NIL-on-tie."""

import pytest

from pyspark.sql import functions as F

from renard_spark.operators import linking

KB_ROWS = [
    ("e_join", ["join", "merge"], ["hash", "key"], 0.7),
    ("e_sort", ["merge", "sort"], ["order", "slow"], 0.5),
    ("e_vec_a", ["vector"], ["data", "scan"], 0.5),
    ("e_vec_b", ["vector"], ["row", "line"], 0.5),
]
KB_SCHEMA = (
    "entity_id string, aliases array<string>,"
    " context array<string>, prior double"
)


def _toks(spark, docs: dict[str, str]):
    rows = [
        (d, i, t)
        for d, text in docs.items()
        for i, t in enumerate(text.split())
    ]
    return spark.createDataFrame(
        rows, "doc_id string, tok_idx int, token string"
    )


def _links(spark, docs, **kw):
    kb = spark.createDataFrame(KB_ROWS, KB_SCHEMA)
    out = linking.link_entities(_toks(spark, docs), kb, **kw)
    return {
        (r["doc_id"], r["tok_idx"]): (
            r["entity_id"],
            r["score"],
            r["n_cands"],
        )
        for r in out.collect()
    }


def test_context_disambiguates_shared_alias(spark):
    # "merge" is claimed by e_join and e_sort; d1's context is all
    # e_join profile, d2's all e_sort profile.
    got = _links(
        spark,
        {"d1": "hash key merge", "d2": "order slow merge"},
        prior_weight=0.4,
    )
    assert got[("d1", 2)][0] == "e_join"
    assert got[("d2", 2)][0] == "e_sort"
    # score = .4*prior + .6*overlap: e_join in d1 = .4*.7 + .6*1.0
    assert got[("d1", 2)][1] == pytest.approx(0.88, abs=1e-6)
    assert got[("d1", 2)][2] == 2


def test_prior_breaks_context_tie(spark):
    # no context tokens present: scores are pure priors, e_join (0.7)
    # beats e_sort (0.5) with a real margin — linked, not NIL.
    got = _links(spark, {"d": "merge"}, prior_weight=0.4)
    assert got[("d", 0)] == (
        "e_join",
        pytest.approx(0.28, abs=1e-6),
        2,
    )


def test_exact_tie_is_nil(spark):
    # e_vec_a and e_vec_b are fully symmetric here: same prior, zero
    # overlap each -> exact tie -> NIL, n_cands still reported.
    got = _links(spark, {"d": "vector"}, prior_weight=0.4)
    ent, score, n = got[("d", 0)]
    assert ent is None
    assert n == 2
    assert score == pytest.approx(0.2, abs=1e-6)


def test_tie_broken_by_context_links(spark):
    got = _links(spark, {"d": "data scan vector"}, prior_weight=0.4)
    assert got[("d", 2)][0] == "e_vec_a"


def test_unique_alias_links_directly(spark):
    got = _links(spark, {"d": "sort"}, prior_weight=0.4)
    assert got[("d", 0)][0] == "e_sort"
    assert got[("d", 0)][2] == 1


def test_non_alias_tokens_produce_no_rows(spark):
    got = _links(spark, {"d": "hash key order"}, prior_weight=0.4)
    assert got == {}


def test_alias_match_is_case_insensitive(spark):
    got = _links(spark, {"d": "MERGE hash key"}, prior_weight=0.4)
    assert got[("d", 0)][0] == "e_join"
    # surface keeps the original casing
    kb = spark.createDataFrame(KB_ROWS, KB_SCHEMA)
    out = linking.link_entities(
        _toks(spark, {"d": "MERGE hash key"}), kb
    )
    assert out.select("surface").first()[0] == "MERGE"


def _media_links(spark, mentions, media):
    ment = spark.createDataFrame(
        mentions, "doc_id string, char_start int, character string"
    )
    med = spark.createDataFrame(
        media, "doc_id string, media_ref string, kind string, offset int"
    )
    out = linking.link_media_to_mentions(med, ment)
    return {
        r["media_ref"]: (r["character"], r["dist"]) for r in out.collect()
    }


def test_media_links_nearest_mention(spark):
    got = _media_links(
        spark,
        [("d", 0, "alice"), ("d", 100, "bob")],
        [("d", "img://1", "image", 30), ("d", "img://2", "image", 90)],
    )
    assert got == {"img://1": ("alice", 30), "img://2": ("bob", 10)}


def test_media_links_tie_prefers_preceding(spark):
    got = _media_links(
        spark,
        [("d", 10, "alice"), ("d", 30, "bob")],
        [("d", "img://t", "image", 20)],
    )
    assert got == {"img://t": ("alice", 10)}


def test_media_links_mention_at_offset_is_distance_zero(spark):
    got = _media_links(
        spark,
        [("d", 20, "alice"), ("d", 21, "bob")],
        [("d", "img://z", "image", 20)],
    )
    assert got == {"img://z": ("alice", 0)}


def test_media_links_no_mentions_drops_media(spark):
    got = _media_links(
        spark,
        [("other", 0, "alice")],
        [("d", "img://x", "image", 5)],
    )
    assert got == {}


def test_media_links_only_following_mention(spark):
    got = _media_links(
        spark,
        [("d", 50, "carol")],
        [("d", "img://f", "image", 10)],
    )
    assert got == {"img://f": ("carol", 40)}


def test_media_links_no_join_explosion(spark):
    """The plan must be the union+window AS-OF shape — no join node
    between media and mentions at all."""
    ment = spark.createDataFrame(
        [("d", 0, "a")], "doc_id string, char_start int, character string"
    )
    med = spark.createDataFrame(
        [("d", "m", "image", 1)],
        "doc_id string, media_ref string, kind string, offset int",
    )
    plan = (
        linking.link_media_to_mentions(med, ment)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin", "BroadcastHashJoin"):
        assert node not in plan


@pytest.mark.parametrize("seed", [3, 17, 91])
def test_media_links_randomized_matches_bruteforce(spark, seed):
    """Operator == brute-force argmin over (dist, char_start) on a
    randomized (seeded) mention/media layout, including collisions of
    mention and media positions."""
    import random

    rng = random.Random(seed)
    mentions, media = [], []
    for d in range(12):
        doc = f"d{d}"
        n_m = rng.randint(0, 6)
        starts = rng.sample(range(0, 200), n_m) if n_m else []
        for cs in starts:
            mentions.append((doc, cs, f"ch{rng.randint(0, 3)}"))
        for j in range(rng.randint(0, 4)):
            media.append(
                (doc, f"m://{doc}/{j}", "image", rng.randint(0, 200))
            )
    got = _media_links(spark, mentions or [("zz", 0, "x")], media)

    by_doc = {}
    for doc, cs, ch in mentions:
        by_doc.setdefault(doc, []).append((cs, ch))
    want = {}
    for doc, ref, _, off in media:
        cands = by_doc.get(doc)
        if not cands:
            continue
        dist, cs, ch = min((abs(off - cs), cs, ch) for cs, ch in cands)
        want[ref] = (ch, dist)
    assert got == want


def test_canonicalize_links_majority_and_nil(spark):
    ml = spark.createDataFrame(
        [
            ("c1", "e_a"), ("c1", "e_a"), ("c1", "e_b"), ("c1", None),
            ("c2", "e_x"), ("c2", "e_y"),       # 1-1 tie -> smaller id
            ("c3", None), ("c3", None),          # nothing linked -> NIL
        ],
        "char_id string, entity_id string",
    )
    got = {
        r.char_id: (r.entity_id, r.n_linked, r.n_mentions)
        for r in linking.canonicalize_links(ml).collect()
    }
    assert got == {
        "c1": ("e_a", 2, 4),
        "c2": ("e_x", 1, 2),
        "c3": ("NIL", 0, 2),
    }


def test_unbroadcast_kb_same_results(spark):
    """broadcast_kb=False (huge-KB path) changes the join strategy,
    never the links."""
    docs = {"d1": "hash key merge", "d2": "order slow merge", "d3": "vector"}
    a = _links(spark, docs, prior_weight=0.4)
    kb = spark.createDataFrame(KB_ROWS, KB_SCHEMA)
    out = linking.link_entities(
        _toks(spark, docs), kb, prior_weight=0.4, broadcast_kb=False
    )
    b = {
        (r["doc_id"], r["tok_idx"]): (r["entity_id"], r["score"], r["n_cands"])
        for r in out.collect()
    }
    assert a == b


def test_broadcast_dimension_joins(spark):
    """The alias index and context profile must reach the plan as
    broadcast joins — the KB is a dimension table."""
    kb = spark.createDataFrame(KB_ROWS, KB_SCHEMA)
    out = linking.link_entities(_toks(spark, {"d": "merge hash"}), kb)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_re_dialects_agree(spark):
    """TOKEN_RE (Java/RE2 dialect) and TOKEN_RE_PY (Python dialect)
    tokenize unicode text identically across Spark, Python re, and
    DuckDB — the tri-engine contract behind every gated query."""
    import re

    import duckdb

    from pyspark.sql import functions as F

    from renard_spark.operators.tokenize import TOKEN_RE, TOKEN_RE_PY

    samples = [
        "José parlait avec Hélène à l'époque.",
        "Überraschung! Ça va? naïve café №5",
        "日本語のテキスト and English mixed 123",
        "don't — em—dash …ellipsis 'quoted'",
        "é combining, ß, Ørsted, Łukasz",
        "plain ascii text with_underscores and 42 numbers",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i int, s string"
    )
    jvm = {
        r["i"]: list(r["t"])
        for r in df.select(
            "i", F.regexp_extract_all("s", F.lit(TOKEN_RE), 0).alias("t")
        ).collect()
    }
    con = duckdb.connect()
    for i, s in enumerate(samples):
        py = re.findall(TOKEN_RE_PY, s)
        dd = con.execute(
            "SELECT regexp_extract_all(?, ?)", [s, TOKEN_RE]
        ).fetchone()[0]
        assert py == jvm[i] == dd, s


def test_alias_priors_distillation(spark):
    """Hand-built link decisions → P(entity|alias) with abstention
    counts: priors sum to 1 per alias, NILs excluded from the
    numerator but reported."""
    from renard_spark.operators.linking import alias_priors

    links = spark.createDataFrame(
        [
            ("Paris", "ent_paris_fr"),
            ("paris", "ent_paris_fr"),
            ("Paris", "ent_paris_tx"),
            ("Paris", None),          # NIL abstention
            ("Lyon", "ent_lyon"),
        ],
        "surface string, entity_id string",
    )
    got = {
        (r["alias"], r["entity_id"]): (r["n"], r["prior"], r["n_nil"])
        for r in alias_priors(links).collect()
    }
    assert got == {
        ("paris", "ent_paris_fr"): (2, 0.666667, 1),
        ("paris", "ent_paris_tx"): (1, 0.333333, 1),
        ("lyon", "ent_lyon"): (1, 1.0, 0),
    }
