"""Physical-plan regression guards: column pruning reaches the scan,
no row-at-a-time Python UDFs anywhere, the narrow tokenizer stays
shuffle-free, and small dims broadcast."""

import re

from renard_spark import corpus, pipeline
from renard_spark.operators import ner, tokenize
from renard_spark.sources import ingest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tokenizer_is_shuffle_free(spark):
    docs = ingest.normalize_documents(corpus.generate_documents(spark, 5))
    for df in (tokenize.tokens(docs), tokenize.sentence_tokens(docs)):
        plan = _plan(df)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan  # no row-at-a-time UDFs


def test_rule_ner_sentences_is_shuffle_free(spark):
    docs = ingest.normalize_documents(corpus.generate_documents(spark, 5))
    st = tokenize.sentence_tokens(docs)
    plan = _plan(ner.rule_ner_sentences(st, pipeline.default_gazetteer()))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_column_pruning_reaches_scan(spark, tmp_path):
    # write a wide table, read two columns → ReadSchema must be pruned
    p = str(tmp_path / "wide")
    ingest.normalize_documents(
        corpus.generate_documents(spark, 5)
    ).write.parquet(p)
    df = spark.read.parquet(p).select("doc_id")
    m = re.search(r"ReadSchema: (\S+)", _plan(df))
    assert m and "spans" not in m.group(1), m


def test_no_row_udfs_in_full_pipeline(spark):
    docs = corpus.generate_documents(spark, 5)
    out = pipeline.character_graph_pipeline(docs, persist=False)
    plan = _plan(out["triples"])
    assert "BatchEvalPython" not in plan  # only Arrow-batched stages
    # gazetteer-joins and dims must broadcast, never shuffle both sides
    assert "BroadcastNestedLoopJoin" not in plan
