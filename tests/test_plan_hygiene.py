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


def test_new_queries_stay_jvm_side(spark):
    """Round-2 driver queries: no Python at all in the plan (pure
    window/higher-order/band-join work) and no nested-loop joins."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    for name in ("bio_entities", "srp_multi_topk", "capped_near_dups",
                  "simhash_near_pairs"):
        plan = _plan(e.queries()[name](spark, sf))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_no_row_udfs_in_full_pipeline(spark):
    docs = corpus.generate_documents(spark, 5)
    out = pipeline.character_graph_pipeline(docs, persist=False)
    plan = _plan(out["triples"])
    assert "BatchEvalPython" not in plan  # only Arrow-batched stages
    # gazetteer-joins and dims must broadcast, never shuffle both sides
    assert "BroadcastNestedLoopJoin" not in plan


def test_char_blocks_bounded_fanout(spark):
    """char_blocks_to_token_blocks must be an equi-join + Arrow lookup,
    never a row-explosion inequality join (the round-2 verdict's
    heaviest-plan finding)."""
    from renard_spark.operators import utils as oputils

    blocks = spark.createDataFrame(
        [("d1", 0, 0, 10), ("d1", 1, 10, 25)],
        "doc_id string, block_id int, char_start int, char_end int",
    )
    offsets = spark.createDataFrame(
        [("d1", i, i * 5, i * 5 + 4) for i in range(6)],
        "doc_id string, tok_idx int, char_start int, char_end int",
    )
    out = oputils.char_blocks_to_token_blocks(blocks, offsets)
    plan = _plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # correctness of the searchsorted mapping
    got = {r["block_id"]: (r["start"], r["end"]) for r in out.collect()}
    assert got == {0: (0, 2), 1: (2, 5)}


def test_generators_explode_expressions_not_aliases(spark):
    """Exploding a bound ALIAS of an expensive expression lets
    InferFiltersFromGenerate add a size()>0 filter whose pushdown
    re-inlines the whole expression below upstream repartitions — the
    dedup family's heaviest map stage then runs twice (measured 8× at
    sf0.1). Guard: the optimized plans of the shingle and triple-parse
    generators must evaluate their regexps exactly once per input."""
    from renard_spark.functions import dedup
    from renard_spark.operators.relations import parse_text_triples

    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    opt = (
        dedup.shingles(docs.repartition(2), 3)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert opt.count("regexp_extract_all") == 1, opt

    gen = spark.createDataFrame(
        [(1, "(a, likes, b)")], "doc_id long, generated string"
    )
    opt = (
        parse_text_triples(gen)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert opt.count("regexp_extract_all") == 3, opt
