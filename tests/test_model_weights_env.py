"""End-to-end smoke of the real-weights seam (README recipe).

Runs ONLY when ``RENARD_SPARK_NER_MODEL`` names a HuggingFace
token-classification checkpoint AND torch+transformers are importable —
i.e. on a cluster/dev box with weights, never in this sandbox. The
injected-fake twin of this path is tests/test_model_ner.py.
"""

import os

import pytest

MODEL = os.environ.get("RENARD_SPARK_NER_MODEL")


def _torch_available() -> bool:
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not MODEL or not _torch_available(),
    reason="set RENARD_SPARK_NER_MODEL to a token-classification "
    "checkpoint (and install torch+transformers) to run",
)
def test_model_ner_with_real_checkpoint(spark):
    from pyspark.sql import functions as F

    from renard_spark.operators import ner, tokenize
    from renard_spark.sources import ingest
    from renard_spark import corpus

    docs = ingest.normalize_documents(
        corpus.generate_documents(spark, 5, seed=3)
    )
    toks = tokenize.tokens(docs)
    sents = toks.groupBy("doc_id", "sent_idx").agg(
        F.min("tok_idx").alias("sent_start"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("tok_idx", "token"))),
            lambda s: s["token"],
        ).alias("toks"),
    )
    ents = ner.model_ner(
        sents,
        model_factory=lambda: ner.hf_ner_model(MODEL),
        cache_key=MODEL,
        batch_size=8,
    )
    rows = ents.collect()
    # real checkpoints differ in what they tag; the contract is the
    # schema + decodable BIO output, not specific entities
    assert {"doc_id", "start_idx", "end_idx", "mention_str", "tag"} <= set(
        ents.columns
    )
    for r in rows:
        assert r.start_idx < r.end_idx
