"""Sharded corpus export sink: deterministic assignment, checksummed
manifest, reader-side verification (io/export.py)."""

import hashlib
import shutil

from pyspark.sql import functions as F

from renard_spark.io import export


def _docs(spark, n=40):
    rows = [(i, f"document body number {i} " * (1 + i % 3)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_write_then_verify_all_ok(spark, tmp_path):
    path = str(tmp_path / "corpus")
    docs = _docs(spark)
    manifest = export.write_corpus_shards(docs, path, n_shards=4)
    m = {r.shard: r for r in manifest.collect()}
    assert sum(r.n_docs for r in m.values()) == 40
    assert set(m) <= set(range(4))

    ver = export.verify_corpus_shards(spark, path).collect()
    assert len(ver) == len(m)
    assert all(r.ok for r in ver)

    # shard assignment matches the documented md5 rule, row by row
    back = spark.read.parquet(path).collect()
    for r in back:
        want = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 4
        assert r.shard == want


def test_shard_assignment_is_layout_independent(spark, tmp_path):
    docs = _docs(spark)
    a = export.shard_manifest(docs, n_shards=4)
    b = export.shard_manifest(docs.repartition(13), n_shards=4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_rewrite_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "corpus")
    docs = _docs(spark)
    m1 = sorted(map(tuple, export.write_corpus_shards(docs, path, 4).collect()))
    m2 = sorted(map(tuple, export.write_corpus_shards(docs, path, 4).collect()))
    assert m1 == m2


def test_verify_catches_missing_and_tampered_shards(spark, tmp_path):
    path = str(tmp_path / "corpus")
    docs = _docs(spark)
    export.write_corpus_shards(docs, path, n_shards=4)

    # remove one whole shard directory -> its row flags not-ok
    victim = sorted(
        p for p in (tmp_path / "corpus").iterdir() if p.name.startswith("shard=")
    )[0]
    shard_id = int(victim.name.split("=")[1])
    shutil.rmtree(victim)
    ver = {r.shard: r.ok for r in export.verify_corpus_shards(spark, path).collect()}
    assert ver[shard_id] is False
    assert all(ok for s, ok in ver.items() if s != shard_id)


def test_verify_catches_content_change(spark, tmp_path):
    path = str(tmp_path / "corpus")
    docs = _docs(spark)
    export.write_corpus_shards(docs, path, n_shards=2)

    # rewrite shard files with one doc's text changed (same counts),
    # keeping the stored manifest stale
    tampered = spark.read.parquet(path).withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.lit("EVIL")).otherwise(F.col("text")),
    )
    n_bytes_same = tampered.filter(F.col("doc_id") == 0).count() == 1
    assert n_bytes_same
    tampered.write.mode("overwrite").partitionBy("shard").parquet(
        str(tmp_path / "corpus2")
    )
    # splice tampered shards under the original manifest
    for p in (tmp_path / "corpus").iterdir():
        if p.name.startswith("shard="):
            shutil.rmtree(p)
    for p in (tmp_path / "corpus2").iterdir():
        if p.name.startswith("shard="):
            shutil.move(str(p), str(tmp_path / "corpus" / p.name))
    ver = {r.shard: r for r in export.verify_corpus_shards(spark, path).collect()}
    bad = [s for s, r in ver.items() if not r.ok]
    assert len(bad) == 1  # exactly the shard holding doc 0


def test_empty_corpus_export_is_valid(spark, tmp_path):
    path = str(tmp_path / "empty")
    docs = _docs(spark).filter("doc_id < 0")
    manifest = export.write_corpus_shards(docs, path, n_shards=4)
    assert manifest.count() == 0
    ver = export.verify_corpus_shards(spark, path)
    assert ver.count() == 0  # vacuously verified
