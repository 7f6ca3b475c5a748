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
