"""Deterministic sampling operators (functions/sampling.py)."""

import pytest

from renard_spark.functions import sampling


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, f"g{i % 5}") for i in range(n)], "doc_id long, grp string"
    )


def test_sample_frac_bound_edges():
    assert sampling.hash_frac_bound(0.0) == "00000000"
    assert sampling.hash_frac_bound(1.0) == "ffffffff"
    assert sampling.hash_frac_bound(0.25) == "40000000"
    with pytest.raises(ValueError):
        sampling.hash_frac_bound(1.5)


def test_sample_by_hash_partition_invariant(spark):
    # the SAME rows survive regardless of physical layout — the whole
    # point vs df.sample (partition-dependent RNG)
    df = _docs(spark)
    a = {r.doc_id for r in sampling.sample_by_hash(df, 0.3).collect()}
    b = {
        r.doc_id
        for r in sampling.sample_by_hash(df.repartition(13), 0.3).collect()
    }
    assert a == b
    # frac is approximate at n=400, but must be in the right ballpark
    assert 0.2 * 400 < len(a) < 0.4 * 400


def test_sample_salts_decorrelate(spark):
    df = _docs(spark)
    a = {r.doc_id for r in sampling.sample_by_hash(df, 0.5, salt="x").collect()}
    b = {r.doc_id for r in sampling.sample_by_hash(df, 0.5, salt="y").collect()}
    assert a != b
    # frac=0 and frac=1 are exact
    assert sampling.sample_by_hash(df, 0.0).count() == 0
    assert sampling.sample_by_hash(df, 1.0).count() == 400


def test_stratified_quota_counts_and_determinism(spark):
    df = _docs(spark)
    out = sampling.stratified_quota(df, "grp", 7).collect()
    per = {}
    for r in out:
        per[r.grp] = per.get(r.grp, 0) + 1
    assert per == {f"g{i}": 7 for i in range(5)}
    # deterministic across layouts
    out2 = sampling.stratified_quota(df.repartition(11), "grp", 7).collect()
    assert sorted((r.grp, r.doc_id) for r in out) == sorted(
        (r.grp, r.doc_id) for r in out2
    )
    # groups smaller than the quota keep everything
    small = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, grp string"
    )
    assert sampling.stratified_quota(small, "grp", 5).count() == 3


# -- decontamination (functions/contamination.py) ---------------------


def test_cross_source_overlap_counts_shared_texts(spark):
    from renard_spark.functions.contamination import cross_source_overlap

    docs = spark.createDataFrame(
        [
            ("train", "aaa bbb"), ("train", "ccc ddd"), ("train", "eee"),
            ("eval", "aaa bbb"), ("eval", "zzz"),
            ("web", "aaa bbb"), ("web", "ccc ddd"),
        ],
        "source string, text string",
    )
    got = {
        (r.grp_a, r.grp_b): r.n_shared
        for r in cross_source_overlap(docs).collect()
    }
    assert got == {
        ("eval", "train"): 1, ("train", "web"): 2, ("eval", "web"): 1,
    }
    # duplicate rows within one slice never inflate the count
    docs2 = docs.unionByName(
        spark.createDataFrame(
            [("train", "aaa bbb")], "source string, text string"
        )
    )
    got2 = {
        (r.grp_a, r.grp_b): r.n_shared
        for r in cross_source_overlap(docs2).collect()
    }
    assert got2 == got


def test_ngram_contamination_fraction(spark):
    from renard_spark.functions.contamination import ngram_contamination

    # bench doc: "w1 w2 w3 w4"; train doc 1 contains it verbatim inside
    # longer text (high frac), train doc 2 shares nothing
    bench = spark.createDataFrame(
        [(100, "w1 w2 w3 w4")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, "x0 w1 w2 w3 w4 x1"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_shared, round(r.frac, 6))
        for r in ngram_contamination(train, bench, w=3).collect()
    }
    # doc 1: 4 distinct 3-grams, shares 'w1 w2 w3' and 'w2 w3 w4'
    assert got[1] == (4, 2, 0.5)
    assert got[2] == (4, 0, 0.0)
    # short docs fall back to the whole-text shingle
    short = spark.createDataFrame([(3, "w1 w2")], "doc_id long, text string")
    got3 = ngram_contamination(short, bench, w=3).first()
    assert (got3.n_shingles, got3.n_shared) == (1, 0)


def test_remove_boilerplate_strips_shared_lines(spark):
    from renard_spark.functions.text import boilerplate_lines, remove_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "unique one\ncookie banner\nfooter"),
            (2, "unique two\ncookie banner\nfooter"),
            (3, "unique three\nfooter"),
            (4, "cookie banner\nfooter"),
        ],
        "doc_id long, text string",
    )
    bl = {r.piece: r.n_docs for r in boilerplate_lines(docs).collect()}
    assert bl == {"cookie banner": 3, "footer": 4}
    out = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in remove_boilerplate(docs).collect()
    }
    assert out[1] == ("unique one", 1, 2)
    assert out[3] == ("unique three", 1, 1)
    # a doc that is ALL boilerplate survives with empty text
    assert out[4] == ("", 0, 2)
    # order preservation across multiple kept lines
    docs2 = spark.createDataFrame(
        [(1, "b line\nshared\na line"), (2, "shared")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.clean_text for r in remove_boilerplate(docs2).collect()
    }
    assert got[1] == "b line a line"  # original order, not sorted


def test_pack_assignments_partition_invariant_and_contiguous(spark):
    from renard_spark.functions.text import pack_assignments

    docs = spark.createDataFrame(
        [(i, "w " * (5 + i % 17)) for i in range(80)],
        "doc_id long, text string",
    )
    a = {
        r.doc_id: (r.stream_pos, r.pack_id, r.pack_pos)
        for r in pack_assignments(docs, 64).collect()
    }
    b = {
        r.doc_id: (r.stream_pos, r.pack_id, r.pack_pos)
        for r in pack_assignments(docs.repartition(7), 64).collect()
    }
    assert a == b
    # the stream is gapless: sorted positions tile exactly
    rows = sorted(
        (r.stream_pos, r.n_tokens)
        for r in pack_assignments(docs, 64).collect()
    )
    pos = 0
    for s, n in rows:
        assert s == pos
        pos += n
    # pack arithmetic is consistent
    for doc, (s, pid, ppos) in a.items():
        assert pid == s // 64 and ppos == s % 64


def test_hash_split_disjoint_exhaustive_stable(spark):
    from renard_spark.functions.sampling import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(df, fr, salt="s:")
    rows = out.collect()
    assert len(rows) == 2000  # exhaustive: every row labeled
    counts: dict = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) <= set(fr)
    # fractions honored to sampling noise (±4 sigma at n=2000)
    for name, f in fr.items():
        sd = (2000 * f * (1 - f)) ** 0.5
        assert abs(counts.get(name, 0) - 2000 * f) < 4 * sd + 1, counts
    # stable under repartition (partition-layout independence)
    again = {
        r.doc_id: r.split
        for r in hash_split(df.repartition(7), fr, salt="s:").collect()
    }
    assert again == {r.doc_id: r.split for r in rows}
    # fracs must sum to 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hash_split(df, {"a": 0.5, "b": 0.4})


def test_apply_mixture_rates_and_invariance(spark):
    from pyspark.sql import functions as F

    from renard_spark.functions.sampling import apply_mixture

    docs = spark.createDataFrame(
        [(i, "head" if i < 3000 else "tail") for i in range(4000)],
        "doc_id long, source string",
    )
    rates = spark.createDataFrame(
        [("head", 0.25), ("tail", 1.0)], "source string, rate double"
    )
    kept = apply_mixture(docs, rates, salt="t:")
    rows = kept.collect()
    by_src: dict = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert by_src["tail"] == 1000          # rate 1.0 keeps everything
    exp, sd = 3000 * 0.25, (3000 * 0.25 * 0.75) ** 0.5
    assert abs(by_src["head"] - exp) < 4 * sd
    # layout invariance: same keep set after repartition
    again = {r.doc_id for r in apply_mixture(
        docs.repartition(7), rates, salt="t:").collect()}
    assert again == {r.doc_id for r in rows}
    # rate 0 drops the group entirely
    zero = spark.createDataFrame(
        [("head", 0.0), ("tail", 0.5)], "source string, rate double"
    )
    z = apply_mixture(docs, zero, salt="t:").collect()
    assert all(r.source == "tail" for r in z)


def test_priority_sample_pure_twin_and_invariance(spark):
    """Priorities equal the pure-python w/u twin BIT-EXACTLY, the
    grouped top-n matches, and the pick is partition-layout
    invariant."""
    import hashlib

    from renard_spark.functions.sampling import priority_sample

    rows = [(i, "g" + str(i % 2), float(1 + i % 7)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")

    def twin():
        scored = []
        for i, g, w in rows:
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            u = (h + 1.0) / 4294967296.0
            scored.append((g, w / u, i))
        out = {}
        for g in {r[0] for r in scored}:
            grp = sorted(
                [s for s in scored if s[0] == g],
                key=lambda s: (-s[1], s[2]),
            )[:5]
            out.update({(g, i): p for g, p, i in grp})
        return out

    for parts in (1, 7):
        got = {
            (r["grp"], r["doc_id"]): r["priority"]
            for r in priority_sample(
                df.repartition(parts), "w", 5, group_col="grp"
            ).collect()
        }
        assert got == twin()  # exact float equality — bit-exact contract

    # ungrouped TakeOrdered path: same top-5 overall
    flat = sorted(twin().items(), key=lambda kv: -kv[1])[:5]
    got = [
        (r["grp"], r["doc_id"])
        for r in priority_sample(df, "w", 5, group_col=None).collect()
    ]
    assert sorted(got) == sorted(k for k, _ in flat)


def test_priority_sample_weight_bias(spark):
    """Across many salts, a 10x-weight row is picked far more often —
    the weighted semantics (not just determinism)."""
    from renard_spark.functions.sampling import priority_sample

    rows = [(i, 10.0 if i == 0 else 1.0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    heavy = light = 0
    for s in range(30):
        picked = {
            r["doc_id"]
            for r in priority_sample(
                df, "w", 3, group_col=None, salt=str(s)
            ).collect()
        }
        heavy += 0 in picked
        light += 7 in picked
    assert heavy > 20 and heavy > 3 * light
