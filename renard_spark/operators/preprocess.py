"""Text preprocessing: ordered regex substitutions.

Reimplements CustomSubstitutionPreprocessor
(/root/reference/renard/pipeline/preprocessing.py:6-32): a list of
(pattern, replacement) rules applied to the text in rule order — an
order-preserving fold of ``regexp_replace`` (JVM-side, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def substitute(
    df: DataFrame, rules: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    col = F.col(text_col)
    for pattern, replacement in rules:
        col = F.regexp_replace(col, pattern, replacement)
    return df.withColumn(text_col, col)
