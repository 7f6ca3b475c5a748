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


def graph_diff(
    edges_old: DataFrame,
    edges_new: DataFrame,
    keys: tuple[str, ...] = ("src", "dst"),
    weight_col: str = "weight",
) -> DataFrame:
    """Diff two KG edge-weight snapshots → (*keys, w_old, w_new,
    status) with status ∈ added / removed / changed / same — the
    incremental-maintenance primitive for periodically rebuilt graph
    tables (what a MERGE INTO against the previous snapshot would
    compute, expressed engine-side so the delta itself is a table).

    ONE full-outer equi-join on the edge key; weights coalesce to 0 on
    the missing side. Compose with ``cumulative_edges`` for
    window-over-window deltas.
    """
    a = edges_old.select(*keys, F.col(weight_col).alias("w_old"))
    b = edges_new.select(*keys, F.col(weight_col).alias("w_new"))
    j = a.join(b, on=list(keys), how="full_outer")
    status = (
        F.when(F.col("w_old").isNull(), F.lit("added"))
        .when(F.col("w_new").isNull(), F.lit("removed"))
        .when(F.col("w_old") == F.col("w_new"), F.lit("same"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *keys,
        F.coalesce("w_old", F.lit(0)).alias("w_old"),
        F.coalesce("w_new", F.lit(0)).alias("w_new"),
        status.alias("status"),
    )


def edge_validity(dyn_edges: DataFrame) -> DataFrame:
    """Temporal validity spans of dynamic-graph edges:
    (doc_id, src, dst, first_w, last_w, n_windows, peak_w) — when each
    KG edge appears, disappears, how many snapshots it is active in,
    and its strongest window (ties → earliest). The temporal-KG
    companion of ``cumulative_edges`` (running weight) and
    ``graph_diff`` (snapshot deltas), from ONE map-side-combined
    aggregation over the dynamic edge table.
    """
    return dyn_edges.groupBy("doc_id", "src", "dst").agg(
        F.min("window_id").alias("first_w"),
        F.max("window_id").alias("last_w"),
        F.count(F.lit(1)).alias("n_windows"),
        F.max_by(
            "window_id",
            F.struct(F.col("weight"), -F.col("window_id")),
        ).alias("peak_w"),
    )


def upsert_triples(
    base: DataFrame,
    updates: DataFrame,
    keys: tuple[str, ...] = ("subj", "pred", "obj"),
    version_col: str = "version",
    delete_col: str = "deleted",
) -> DataFrame:
    """MERGE INTO semantics for periodically rebuilt KG tables:
    last-writer-wins by ``version_col`` on the triple key, with update
    rows flagged ``delete_col`` retracting the key entirely — the
    engine-side form of Iceberg's ``MERGE INTO kg USING updates`` for
    the (subj, pred, obj) graph tables the north rule materializes.

    ONE shuffle on the triple key: both sides normalize to
    (keys, version, deleted, payload-struct), union, and a
    map-side-combinable ``max_by`` picks the winning row per key
    (highest version; equal versions break toward the updates side, so
    a same-version re-run is idempotent). Deleted winners drop out
    with a filter. No window function — the per-key argmax combines
    partially on the map side, which a row_number window cannot.

    ``updates`` may omit ``delete_col`` (treated as all-False);
    ``base`` rows never delete. Payload columns are every non-key,
    non-version, non-delete column of ``base`` and must exist in
    ``updates`` too.
    """
    payload = [
        c
        for c in base.columns
        if c not in keys and c not in (version_col, delete_col)
    ]

    def norm(df: DataFrame, source_rank: int) -> DataFrame:
        deleted = (
            F.col(delete_col).cast("boolean")
            if delete_col in df.columns
            else F.lit(False)
        )
        return df.select(
            *keys,
            F.col(version_col).cast("long").alias("_v"),
            F.lit(source_rank).alias("_sr"),
            F.coalesce(deleted, F.lit(False)).alias("_del"),
            F.struct(*payload).alias("_p"),
        )

    merged = norm(base, 0).unionByName(norm(updates, 1))
    won = merged.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col("_del"), F.col("_v"), F.col("_p")),
            F.struct(F.col("_v"), F.col("_sr")),
        ).alias("w")
    )
    return won.filter(~F.col("w._del")).select(
        *keys, F.col("w._v").alias(version_col), "w._p.*"
    )


def negative_samples(
    triples_df: DataFrame,
    k: int = 2,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Deterministic filtered negative sampling for KG-embedding
    training (TransE-style object corruption): for each distinct
    positive triple and i in [0, k), replace the object with the
    entity at dense index md5("neg:<i>|subj|pred|obj") mod V, then
    DROP candidates that collide with a true positive or with the
    subject ("filtered" sampling — drop, don't resample, so the op is
    one deterministic pass with no RNG state; the expected survivor
    count is k·(1 − d/V) with d the mean out-degree).

    The entity vocabulary is distinct subjects ∪ objects with a dense
    index from the two-phase global rank (entity order) — never a
    single-partition window; the index table is joined equi on the
    hash slot, not broadcast (a 100M-entity vocabulary is itself a
    corpus). Driver-side scalars: one count (V).

    → (subj, pred, obj, neg_i, neg_obj), one row per SURVIVING
    candidate. Engine addition (training-data op); the reference has
    no analog.
    """
    from renard_spark.operators.utils import global_running_total

    pos = triples_df.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    ).distinct()
    # two consumers (entity vocab, candidate generation) + the range
    # partitioner's sampling pass — truncate the upstream lineage once
    pos = pos.localCheckpoint(eager=True)

    ents = (
        pos.select(F.col("subj").alias("entity"))
        .unionByName(pos.select(F.col("obj").alias("entity")))
        .distinct()
        .withColumn("_one", F.lit(1))
        .localCheckpoint(eager=True)
    )
    n_entities = ents.count()
    eidx = global_running_total(ents, "_one", ["entity"], out_col="idx").select(
        "entity", F.col("idx").cast("long").alias("idx")
    )

    cand = pos.select(
        "subj",
        "pred",
        "obj",
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("neg_i"),
    ).withColumn(
        "_slot",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.concat(F.lit("neg:"), F.col("neg_i")),
                            "subj",
                            "pred",
                            "obj",
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_entities),
        ),
    )
    neg = (
        cand.join(eidx, cand["_slot"] == eidx["idx"])
        .drop("_slot", "idx")
        .withColumnRenamed("entity", "neg_obj")
        .filter(F.col("neg_obj") != F.col("subj"))
    )
    true_objs = pos.select("subj", "pred", F.col("obj").alias("neg_obj"))
    return neg.join(true_objs, ["subj", "pred", "neg_obj"], "left_anti").select(
        "subj", "pred", "obj", "neg_i", "neg_obj"
    )


def triple_provenance(
    triples_df: DataFrame, sample_k: int = 5
) -> DataFrame:
    """Evidence table per corpus-level fact → (subj, pred, obj,
    n_docs, total_weight, sample_docs): how many documents support
    each triple, with the ``sample_k`` smallest doc ids as a
    deterministic comma-joined audit sample — the provenance surface a
    KG consumer drills into before trusting an edge.

    ONE shuffle on the triple key; collect_set is bounded by the
    post-aggregation sort+slice (the sample is tiny), and the sample
    is a pure function of the evidence set — layout/engine-invariant,
    unlike first-k-seen. For truly unbounded-evidence keys, cap
    upstream with a per-key hash filter before the collect.
    """
    return triples_df.groupBy("subj", "pred", "obj").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.sum("weight").cast("long").alias("total_weight"),
        F.array_join(
            F.slice(
                F.sort_array(F.collect_set(F.col("doc_id").cast("long"))),
                1,
                sample_k,
            ).cast("array<string>"),
            ",",
        ).alias("sample_docs"),
    )
