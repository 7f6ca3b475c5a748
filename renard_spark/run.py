"""Production entrypoint: the full narrative-KG pipeline as
checkpoint-resumable stages.

Deployment shape (north_rule): ``spark-submit --py-files renard_spark.zip
-m renard_spark.run`` on a multi-executor cluster; in the sandbox it
runs on local[N]. Every stage materializes to the catalog; interrupt it
anywhere and re-running resumes from the last finished stage
(``--rerun-from`` forces recomputation from a named stage, the analog
of the reference's Pipeline.rerun_from, core.py:737-780).

Usage:
    python -m renard_spark.run --workdir /tmp/kg --docs 1000
    python -m renard_spark.run --workdir /tmp/kg --rerun-from unified_mentions
    python -m renard_spark.run --workdir /tmp/kg --input /path/to/documents.parquet
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from renard_spark import corpus
from renard_spark.io.catalog import get_catalog
from renard_spark.operators import (
    conversation,
    cooccur,
    coref,
    linking,
    ner,
    quotes,
    sentiment,
    tokenize,
    triples,
    unify,
)
from renard_spark.plans.stage import StageRunner
from renard_spark.sources import ingest


def build_runner(
    spark: SparkSession,
    documents_df: DataFrame,
    workdir: str,
    gazetteer: list[str] | None = None,
    dist: tuple[int, str] = (1, "sentences"),
    min_appearances: int = 0,
    with_speech: bool = True,
    with_media: bool = True,
    kb_df: DataFrame | None = None,
    link_prior_weight: float = 0.4,
    kb_version: str = "v0",
) -> StageRunner:
    from renard_spark.pipeline import default_gazetteer

    gaz = gazetteer or default_gazetteer()
    catalog = get_catalog(spark, workdir)
    r = StageRunner(spark, catalog, inputs={"documents_raw": documents_df})

    r.add("documents", ["documents_raw"],
          lambda s, d: ingest.normalize_documents(d))
    r.add("lineage", ["documents"], lambda s, d: ingest.span_lineage(d))
    r.add("tokens", ["documents"], lambda s, d: tokenize.tokens(d))
    r.add("entities", ["tokens"], lambda s, t: ner.rule_ner(t, gaz))
    r.add("corefs", ["tokens", "entities"],
          lambda s, t, e: coref.rule_corefs(t, e))
    r.add(
        "unified_mentions", ["entities", "corefs"],
        lambda s, e, c: unify.graph_rules_unify(
            e, c, min_appearances=min_appearances
        ),
        config={"min_appearances": min_appearances},
    )
    r.add("characters", ["unified_mentions"],
          lambda s, u: unify.characters_table(u))
    r.add("polarities", ["tokens"],
          lambda s, t: sentiment.sentence_polarities(t))
    r.add(
        "edges", ["unified_mentions", "tokens", "polarities"],
        lambda s, u, t, p: cooccur.cooccurrence_edges(
            u.select("doc_id", "char_id", "start_idx", "end_idx"),
            dist=dist[0], unit=dist[1], tokens_df=t, polarities_df=p,
        ),
        config={"dist": list(dist)},
    )
    r.add("triples", ["edges"],
          lambda s, e: triples.edges_to_triples(e))
    if kb_df is not None:
        # KB entity linking as a first-class stage: every alias-
        # matching token links to its best KB entity (NIL on ties).
        # The stage table is keyed by (prior_weight, kb_version) —
        # bump kb_version when the KB contents change, or the
        # checkpointed links are (correctly) reused.
        r.inputs["kb"] = kb_df
        r.add(
            "entity_links", ["tokens", "kb"],
            lambda s, t, kb: linking.link_entities(
                t, kb, prior_weight=link_prior_weight
            ),
            config={
                "prior_weight": link_prior_weight,
                "kb_version": kb_version,
            },
        )
    if with_media:
        # media grounding: interleaved media spans → nearest unified
        # mention by char offset (KG edges character-[appears_near]->
        # media_ref). Mention char positions come from the Arrow
        # offset tokenizer joined back on the token index.
        r.add("token_offsets", ["documents"],
              lambda s, d: tokenize.tokens_with_offsets(d))
        r.add(
            "media_links", ["documents", "unified_mentions",
                            "token_offsets"],
            lambda s, d, u, to: linking.link_media_to_mentions(
                ingest.media_spans(d),
                u.join(
                    to.select(
                        "doc_id",
                        F.col("tok_idx").alias("start_idx"),
                        "char_start",
                    ),
                    ["doc_id", "start_idx"],
                ).select(
                    "doc_id", "char_start",
                    F.col("char_id").alias("character"),
                ),
            ),
        )
    if with_speech:
        r.add("quotes", ["tokens"], lambda s, t: quotes.detect_quotes(t))
        r.add("speakers", ["quotes", "unified_mentions"],
              lambda s, q, u: quotes.attribute_speakers(q, u))
        r.add(
            "conversation_edges", ["speakers", "tokens"],
            lambda s, sp, t: conversation.conversation_edges(
                sp, dist=1, unit="sentences", tokens_df=t
            ),
        )
        r.add("mention_edges", ["speakers", "unified_mentions"],
              lambda s, sp, u: conversation.mention_graph_edges(sp, u))
    return r


def main() -> None:
    from renard_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--docs", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--input", default=None,
                    help="parquet path of a documents table (else synthetic)")
    ap.add_argument("--rerun-from", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--mode", choices=["kg", "curate"], default="kg",
                    help="kg: narrative-KG stages; curate: the "
                         "dedup+quality+decontamination decision table")
    ap.add_argument("--bench-input", default=None,
                    help="curate mode: parquet path of the benchmark "
                         "slice (else doc_id %% 10 == 0 of the input)")
    ap.add_argument("--normalize", action="store_true",
                    help="curate mode: normalize text (whitespace/"
                         "unicode cleanup) before dedup/quality/"
                         "decontamination")
    ap.add_argument("--kb", default=None,
                    help="kg mode: parquet path of a KB table "
                         "(entity_id, aliases, context, prior) — adds "
                         "the entity_links stage")
    ap.add_argument("--kb-version", default="v0",
                    help="bump when the --kb contents change so the "
                         "checkpointed entity_links stage recomputes")
    ap.add_argument("--export-shards", default=None,
                    help="curate mode: after curation, write the kept "
                         "train-split documents as md5-bucket shards + "
                         "checksummed manifest here, then verify them "
                         "(nonzero exit on any bad shard)")
    ap.add_argument("--n-shards", type=int, default=16)
    ap.add_argument("--export-graph", default=None,
                    help="kg mode: after the pipeline, write the "
                         "corpus KG bundle here (triples/edges/nodes "
                         "parquet + kg.nt + graph.gexf)")
    args = ap.parse_args()

    spark = get_spark("renard_spark_run", cpus=args.cpus)
    if args.input:
        docs = spark.read.parquet(args.input)
    else:
        docs = corpus.generate_documents(spark, args.docs, seed=args.seed)
    if args.mode == "curate":
        from pyspark.sql import functions as F

        from renard_spark.functions.curation import curation_pipeline

        # curation operates on text — assemble it from interleaved
        # spans (no-op for flat (doc_id, text) tables)
        docs = ingest.normalize_documents(docs).select("doc_id", "text")
        if args.bench_input:
            bench = ingest.normalize_documents(
                spark.read.parquet(args.bench_input)
            ).select("doc_id", "text")
            train = docs
        else:
            # deterministic 10% benchmark slice by id hash — works for
            # string and numeric ids alike
            from renard_spark.functions.sampling import hash_split

            lab = hash_split(
                docs, {"train": 0.9, "bench": 0.1}, salt="benchslice:",
                out_col="_slice",
            )
            train = lab.filter(F.col("_slice") == "train").drop("_slice")
            bench = lab.filter(F.col("_slice") == "bench").drop("_slice")
        out = curation_pipeline(
            spark, train, bench, args.workdir,
            normalize=args.normalize, rerun_from=args.rerun_from,
        )
        out["curated"].groupBy("keep", "split").count().orderBy(
            "keep", "split"
        ).show(10, truncate=False)
        if args.export_shards:
            from renard_spark.io import export as exportmod

            kept = (
                out["curated"]
                .filter((F.col("keep") == 1) & (F.col("split") == "train"))
                .select("doc_id")
                .join(train, "doc_id")
            )
            exportmod.write_corpus_shards(
                kept, args.export_shards, n_shards=args.n_shards
            )
            ver = exportmod.verify_corpus_shards(spark, args.export_shards)
            ver.orderBy("shard").show(args.n_shards, truncate=False)
            bad = ver.filter(~F.col("ok")).count()
            if bad:
                raise SystemExit(
                    f"export verification FAILED for {bad} shard(s)"
                )
            print(f"export verified: {ver.count()} shards ok")
        return
    kb = spark.read.parquet(args.kb) if args.kb else None
    runner = build_runner(
        spark, docs, args.workdir, kb_df=kb, kb_version=args.kb_version
    )
    out = runner.run(rerun_from=args.rerun_from)
    n = out["triples"].count()
    print(f"triples: {n}")
    runner.metrics().groupBy("stage").sum("rows").show(50, truncate=False)
    if args.export_graph:
        from renard_spark.io.export import write_graph_tables

        counts = write_graph_tables(spark, out["triples"], args.export_graph)
        print(f"graph bundle: {counts}")


if __name__ == "__main__":
    main()
