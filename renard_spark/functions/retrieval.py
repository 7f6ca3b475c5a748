"""BM25 retrieval — distributed TF/IDF scoring + top-k.

The reference uses BM25 to retrieve global context sentences that
boost NER (ner/retrieval.py:149-163, torch.topk over an in-memory
index). The engine expresses the same scoring relationally: document
frequencies and lengths are aggregate tables, scoring is a broadcast
join from query terms to the postings, top-k is a window row_number —
the per-query torch.topk becomes `rank <= k` after one shuffle.

BM25(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (Okapi, as in rank_bm25)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from renard_spark.operators.tokenize import TOKEN_RE


def bm25_index(docs: DataFrame, text_col: str = "text") -> dict[str, DataFrame]:
    """Build postings/doclen/df tables from (doc_id, text)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(text_col, F.lit(TOKEN_RE), 0)).alias("t"),
    ).select("doc_id", F.lower("t").alias("term"))
    postings = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return {"postings": postings, "doclen": doclen, "df": df_t}


def bm25_topk(
    index: dict[str, DataFrame],
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """queries: (query_id, term) exploded query terms →
    (query_id, doc_id, score, rank) with rank ≤ k."""
    postings, doclen, df_t = index["postings"], index["doclen"], index["df"]
    n_docs = doclen.count()
    avgdl = doclen.agg(F.avg("dl")).first()[0]

    scored = (
        queries.join(F.broadcast(df_t), "term")
        .join(postings, "term")
        .join(doclen, "doc_id")
        .withColumn(
            "idf",
            F.log(1.0 + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
