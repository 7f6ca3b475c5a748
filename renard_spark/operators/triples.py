"""Triple emission + graph-table materialization utilities.

The engine's flagship output (north_rule): a (subj, pred, obj) triple
table plus weighted character-network adjacency, derived from the edges
tables of the graph extractors. Also the cumulative-graph prefix sum
over dynamic snapshots (reference graph_utils.py:11-42, an nx.compose
loop → one window running-sum here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def edges_to_triples(
    edges_df: DataFrame, pred: str = "interacts_with"
) -> DataFrame:
    """edges(doc_id[, window_id], src, dst, weight[, polarity]) →
    triples(doc_id[, window_id], subj, pred, obj, weight)."""
    cols = [c for c in ("doc_id", "window_id", "block_id") if c in edges_df.columns]
    out = edges_df.select(
        *cols,
        F.col("src").alias("subj"),
        F.lit(pred).alias("pred"),
        F.col("dst").alias("obj"),
        "weight",
        *(["polarity"] if "polarity" in edges_df.columns else []),
    )
    return out


def cumulative_edges(edges_df: DataFrame, snapshot_col: str = "window_id") -> DataFrame:
    """Running per-edge sum across dynamic snapshots: snapshot i holds
    Σ weight over snapshots ≤ i for each (src,dst) — graph_utils.py:11-42.

    Missing (edge, snapshot) combinations are densified so every
    snapshot reports every edge seen so far (nx.compose semantics).

    The input feeds three consumers (snapshot ids, edge ids, the dense
    left join); Catalyst does not reuse the upstream exchanges across
    them (verified: 0 ReusedExchange), so the snapshot edges are
    eagerly localCheckpoint-ed — one upstream computation instead of
    three, blocks released with the DataFrame.
    """
    edges_df = edges_df.localCheckpoint(eager=True)
    keys = ["doc_id", "src", "dst"]
    snaps = edges_df.select("doc_id", snapshot_col).distinct()
    edge_ids = edges_df.select(*keys).distinct()
    dense = edge_ids.join(snaps, "doc_id")
    full = dense.join(edges_df, keys + [snapshot_col], "left").fillna(
        0, subset=["weight"]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(snapshot_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = full.withColumn("cum_weight", F.sum("weight").over(w))
    # an edge exists in snapshot i only from its first appearance on
    return cum.filter(F.col("cum_weight") > 0).select(
        "doc_id", snapshot_col, "src", "dst", F.col("cum_weight").alias("weight")
    )


def nodes_table(unified_mentions: DataFrame, tag: str = "PER") -> DataFrame:
    """Graph nodes with entity_type attribute (graph_extraction.py:336-341)."""
    return unified_mentions.select(
        "doc_id", "char_id", F.lit(tag).alias("entity_type")
    ).distinct()
