"""CoNLL BIO source + incremental streaming ingest."""

import os

from renard_spark import corpus, pipeline
from renard_spark.io.catalog import get_catalog
from renard_spark.operators import ner
from renard_spark.sources.conll import read_conll2002_bio
from renard_spark.streaming.ingest import run_incremental, stream_documents

from .oracle import bio_decode_oracle

CONLL = """\
Elizabeth\tB-PER
Bennet\tI-PER
walked\tO
to\tO
Meryton\tB-LOC

She\tO
saw\tO
Mr\tB-PER
Darcy\tI-PER
"""


def test_read_conll_bio(spark, tmp_path):
    p = tmp_path / "fix.bio"
    p.write_text(CONLL)
    bio = read_conll2002_bio(spark, str(p), doc_id="d0")
    rows = sorted(
        (r.tok_idx, r.sent_idx, r.token, r.bio_tag) for r in bio.collect()
    )
    assert [r[2] for r in rows] == [
        "Elizabeth", "Bennet", "walked", "to", "Meryton",
        "She", "saw", "Mr", "Darcy",
    ]
    assert [r[1] for r in rows] == [0, 0, 0, 0, 0, 1, 1, 1, 1]
    # partial-entry path: BIO decode → entities (tutorial path §3.2)
    ents = ner.bio_decode(bio)
    got = sorted(
        (r.start_idx, r.end_idx, r.tag, r.mention_str) for r in ents.collect()
    )
    toks = [r[2] for r in rows]
    tags = [r[3] for r in rows]
    want = sorted(
        (s, e, t, " ".join(toks[s:e])) for s, e, t in bio_decode_oracle(toks, tags)
    )
    assert got == want
    assert ("Elizabeth Bennet" in {m for _, _, _, m in got})


def test_labeled_sentences_hgdataset_twin(spark, tmp_path):
    """labeled_sentences == the reference's hgdataset_from_conll2002
    re-encoding: decoded entities re-tagged canonically, labels = class
    ids over the sorted tag vocabulary, parallel per-sentence arrays.
    The fixture contains an orphan I- (resolve) and an I- continuation
    whose re-encode must normalize."""
    from renard_spark.sources.conll import labeled_sentences

    p = tmp_path / "lab.bio"
    p.write_text(
        "Elizabeth\tB-PER\nBennet\tI-PER\nsaw\tO\nLondon\tI-LOC\n"
        "\nDarcy\tB-PER\nleft\tO\n"
    )
    bio = read_conll2002_bio(spark, str(p), doc_id="d0")
    rows = labeled_sentences(bio).collect()
    by_sent = {r.sent_idx: r for r in rows}
    names = rows[0].label_names
    # vocabulary = sorted distinct re-encoded tags
    assert names == ["B-LOC", "B-PER", "I-PER", "O"]
    lab = {n: i for i, n in enumerate(names)}
    s0, s1 = by_sent[0], by_sent[1]
    assert s0.tokens == ["Elizabeth", "Bennet", "saw", "London"]
    # orphan I-LOC starts an entity on decode → re-encoded as B-LOC
    assert s0.labels == [lab["B-PER"], lab["I-PER"], lab["O"], lab["B-LOC"]]
    assert s1.tokens == ["Darcy", "left"]
    assert s1.labels == [lab["B-PER"], lab["O"]]


def test_tag_conversion_and_max_sent_len(spark, tmp_path):
    p = tmp_path / "fix2.bio"
    p.write_text("a\tB\nb\tI\nc\tI\nd\tI\n")
    bio = read_conll2002_bio(
        spark, str(p), tag_conversion_map={"B": "B-PER", "I": "I-PER"},
        max_sent_len=2,
    )
    rows = sorted((r.tok_idx, r.sent_idx, r.bio_tag) for r in bio.collect())
    assert [r[2] for r in rows] == ["B-PER", "I-PER", "I-PER", "I-PER"]
    assert [r[1] for r in rows] == [0, 0, 1, 1]


def test_streaming_matches_batch(spark, tmp_path):
    # corpus in two parquet files → stream availableNow → appended
    # stage tables must equal one batch run over the union
    inp = str(tmp_path / "in")
    corpus.generate_documents(spark, 6, seed=77).coalesce(1).write.parquet(
        inp, mode="overwrite"
    )
    corpus.generate_documents_pdf(6, seed=77, start=6).pipe(
        lambda pdf: spark.createDataFrame(pdf, schema=corpus.DOCUMENTS_SCHEMA)
    ).coalesce(1).write.parquet(inp, mode="append")

    wd = str(tmp_path / "wd")
    ck = str(tmp_path / "ck")
    q = run_incremental(
        stream_documents(spark, inp, max_files_per_trigger=1),
        wd, ck,
    )
    q.awaitTermination(300)

    catalog = get_catalog(spark, wd)
    streamed = {
        (r.doc_id, r.subj, r.obj, r.weight)
        for r in catalog.read("triples").collect()
    }
    batch_out = pipeline.character_graph_pipeline(
        spark.read.parquet(inp), persist=False
    )
    batch = {
        (r.doc_id, r.subj, r.obj, r.weight)
        for r in batch_out["triples"].collect()
    }
    assert streamed == batch and len(batch) > 0


def test_iceberg_write_batch_replay_idempotent(spark):
    # IcebergCatalog streaming sink contract WITHOUT iceberg jars: a
    # recording stub substitutes the three _raw seams and keeps rows in
    # memory; the real write_batch orchestration (DELETE batch rows →
    # append with batch_id column) must make replays row-identical.
    import re

    from renard_spark.io.catalog import IcebergCatalog
    from renard_spark.streaming.ingest import write_batch_tables

    class StubIceberg(IcebergCatalog):
        def __init__(self, spark):
            self.spark = spark
            self.namespace = "stub.kg"
            self.store = {}   # name -> list[row tuple incl. batch_id]
            self.calls = []

        def exists(self, name):
            return name in self.store

        def _raw_sql(self, q):
            self.calls.append(("sql", q))
            m = re.match(
                r"DELETE FROM stub\.kg\.(\w+) WHERE batch_id = (\d+)", q
            )
            assert m, q
            name, bid = m.group(1), int(m.group(2))
            self.store[name] = [
                r for r in self.store[name] if r[-1] != bid
            ]

        def _raw_append(self, name, df):
            self.calls.append(("append", name))
            self.store[name].extend(tuple(r) for r in df.collect())

        def _raw_create(self, name, df):
            self.calls.append(("create", name))
            self.store[name] = [tuple(r) for r in df.collect()]

    cat = StubIceberg(spark)
    b0 = spark.createDataFrame([("d0", 1), ("d1", 2)], "doc_id string, n int")
    b1 = spark.createDataFrame([("d2", 3)], "doc_id string, n int")

    write_batch_tables(cat, {"tokens": b0}, 0, ("tokens",))
    assert cat.store["tokens"] == [("d0", 1, 0), ("d1", 2, 0)]
    # replay of batch 0 (failure recovery): no duplicate rows
    write_batch_tables(cat, {"tokens": b0}, 0, ("tokens",))
    assert sorted(cat.store["tokens"]) == [("d0", 1, 0), ("d1", 2, 0)]
    # replay used DELETE + append, not create-or-replace
    assert ("sql", "DELETE FROM stub.kg.tokens WHERE batch_id = 0") in cat.calls
    write_batch_tables(cat, {"tokens": b1}, 1, ("tokens",))
    assert sorted(cat.store["tokens"]) == [
        ("d0", 1, 0), ("d1", 2, 0), ("d2", 3, 1)
    ]


def test_write_batch_tables_rejects_unknown_catalog(spark):
    from renard_spark.streaming.ingest import write_batch_tables

    class NotACatalog:
        pass

    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        write_batch_tables(NotACatalog(), {}, 0, ())
