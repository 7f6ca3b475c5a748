"""Distributed connected components over an edge DataFrame.

Replaces the reference's ``nx.connected_components``
(character_unification.py:331) for the *scale path*: when the alias
graph spans a cross-document entity table (10^12-doc global
unification), the per-doc UDF no longer applies and components must be
computed as an iterative DataFrame algorithm (no graphframes in the
environment).

Algorithm: min-label propagation (hash-to-min): every vertex adopts the
smallest component label in its closed neighborhood until fixpoint;
lineage is cut with ``localCheckpoint`` each round so plans stay flat.
Rounds ≈ graph diameter — small for alias graphs (star-ish shapes);
the large-star/small-star variant can swap in behind the same
signature if diameters grow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges_df: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """edges (src,dst strings) → (vertex, component) where component is
    the lexicographically smallest vertex id in the component.
    Isolated vertices of interest should be passed as self-loops."""
    # undirected symmetric closure + self loops
    e = (
        edges_df.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges_df.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    comp = (
        e.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # candidate labels: own label + neighbors' labels
        nbr = (
            e.join(comp.withColumnRenamed("vertex", "b").withColumnRenamed(
                "component", "nbr_comp"), "b")
            .groupBy("a")
            .agg(F.min("nbr_comp").alias("min_nbr"))
            .withColumnRenamed("a", "vertex")
        )
        new_comp = (
            comp.join(nbr, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    "component", F.coalesce("min_nbr", F.col("component"))
                ).alias("component"),
            )
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        comp = new_comp.localCheckpoint()
        if changed == 0:
            break
    return comp
