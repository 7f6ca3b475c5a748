"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The queries exercise renard_spark's operators over the driver's parquet
tables: the ``documents`` table plays the corpus role (its tokens are
the "characters"), so the full KG chain — tokenize → NER → unify →
co-occurrence edges → triples — is SQL-checkable end to end.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from renard_spark.operators import cooccur, ner, tokenize, triples, unify
from renard_spark.operators.tokenize import TOKEN_RE
from renard_spark.sources import ingest

# tokens of the driver's synthetic documents treated as the "cast":
# the dictionary-NER gazetteer for the SQL-checkable KG chain.
CAST_TOKENS = [
    "spark", "customer", "window", "join", "merge",
    "filter", "vector", "batch", "stream", "table",
]
COOCCUR_DIST = 3

_SQL_TOKEN_RE = TOKEN_RE.replace("'", "''")
_CAST_SQL = ", ".join(f"'{t}'" for t in CAST_TOKENS)

# shared oracle CTEs: tokenize + dictionary NER over the documents view
_BASE_CTES = f"""
WITH toks AS (
  SELECT doc_id, u.tok AS token, u.i - 1 AS tok_idx
  FROM (SELECT doc_id, regexp_extract_all(text, '{_SQL_TOKEN_RE}') AS tl
        FROM documents),
       LATERAL (SELECT unnest(tl) AS tok, generate_subscripts(tl, 1) AS i) u
),
m AS (SELECT doc_id, tok_idx, token FROM toks WHERE token IN ({_CAST_SQL}))
"""


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ingest.normalize_documents(_documents(spark, sf_dir))
    toks = tokenize.tokens(docs)
    return ner.dictionary_ner(toks, CAST_TOKENS)


def _long_doc_id(df: DataFrame) -> DataFrame:
    # engine stage tables key doc_id as string; the driver's DuckDB
    # oracle sees the parquet BIGINT — align the comparison dtype.
    return df.withColumn("doc_id", F.col("doc_id").cast("long"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (text-analysis op) — JVM regexp, no shuffle."""
    return _documents(spark, sf_dir).select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(TOKEN_RE), 0))
        .cast("long")
        .alias("n_tokens"),
    )


def q_naive_characters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaiveCharacterUnifier: per-doc characters by surface form."""
    unified = unify.naive_unify(_mentions(spark, sf_dir))
    return _long_doc_id(
        unify.characters_table(unified).select(
            "doc_id", "char_id",
            F.col("mention_count").cast("long").alias("mention_count"),
        )
    )


def q_cooccur_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence character network, token unit, dist=3."""
    unified = unify.naive_unify(_mentions(spark, sf_dir))
    mentions = unified.select("doc_id", "char_id", "start_idx", "end_idx")
    return _long_doc_id(
        cooccur.cooccurrence_edges(mentions, COOCCUR_DIST, "tokens").select(
            "doc_id", "src", "dst", F.col("weight").cast("long").alias("weight")
        )
    )


def q_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship output: (subj, pred, obj, weight) interaction triples."""
    unified = unify.naive_unify(_mentions(spark, sf_dir))
    mentions = unified.select("doc_id", "char_id", "start_idx", "end_idx")
    edges = cooccur.cooccurrence_edges(mentions, COOCCUR_DIST, "tokens")
    return _long_doc_id(
        triples.edges_to_triples(edges).select(
            "doc_id", "subj", "pred", "obj",
            F.col("weight").cast("long").alias("weight"),
        )
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup fingerprints: md5(text) + duplicate-group size."""
    from pyspark.sql import Window

    docs = _documents(spark, sf_dir)
    w = Window.partitionBy("fp")
    return (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .withColumn("dup_group_size", F.count(F.lit(1)).over(w).cast("long"))
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "token_counts": q_token_counts,
        "naive_characters": q_naive_characters,
        "cooccur_edges": q_cooccur_edges,
        "triples": q_triples,
        "exact_dedup": q_exact_dedup,
    }


def oracle_sql() -> dict[str, str]:
    d = COOCCUR_DIST
    edges_ctes = (
        _BASE_CTES
        + f""",
b AS (SELECT doc_id, tok_idx - {d} AS bs, tok_idx + 1 + {d} AS be FROM m),
pairs AS (
  SELECT DISTINCT m1.doc_id, m1.tok_idx AS i, m2.tok_idx AS j,
         m1.token AS t1, m2.token AS t2
  FROM m m1
  JOIN m m2 ON m1.doc_id = m2.doc_id AND m1.tok_idx < m2.tok_idx
  JOIN b ON b.doc_id = m1.doc_id
        AND m1.tok_idx >= b.bs AND m2.tok_idx + 1 <= b.be
)
"""
    )
    return {
        "token_counts": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{_SQL_TOKEN_RE}'))::BIGINT AS n_tokens
            FROM documents
        """,
        "naive_characters": _BASE_CTES
        + """
            SELECT doc_id, token AS char_id, count(*)::BIGINT AS mention_count
            FROM m GROUP BY doc_id, token
        """,
        "cooccur_edges": edges_ctes
        + """
            SELECT doc_id, least(t1, t2) AS src, greatest(t1, t2) AS dst,
                   count(*)::BIGINT AS weight
            FROM pairs WHERE t1 <> t2
            GROUP BY doc_id, least(t1, t2), greatest(t1, t2)
        """,
        "triples": edges_ctes
        + """
            SELECT doc_id, least(t1, t2) AS subj,
                   'interacts_with' AS pred,
                   greatest(t1, t2) AS obj,
                   count(*)::BIGINT AS weight
            FROM pairs WHERE t1 <> t2
            GROUP BY doc_id, least(t1, t2), greatest(t1, t2)
        """,
        "exact_dedup": """
            SELECT doc_id, md5(text) AS fp,
                   count(*) OVER (PARTITION BY md5(text))::BIGINT AS dup_group_size
            FROM documents
        """,
    }
