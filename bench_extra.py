"""Extra benchmarking tools for the optimization round (bench.py is
frozen for driver measurement; this file is builder-side tooling only).

Usage:
  python bench_extra.py time [-n REPS] [query ...]    # noop-sink timings
  python bench_extra.py explain <outdir> [query ...]  # formatted plans
  python bench_extra.py prefix                        # char-prefix phase profile

Timing methodology matches bench.py (same session builder, same noop
sink, same sf dir/core env vars) so numbers are comparable; repeats
take the min (best-of-N), matching bench.py's best-of-2.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from renard_spark.session import get_spark


def run_to_completion(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark("renard_spark_bench_extra", cpus=cpus)


def _sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cmd_time(args: list[str]) -> None:
    reps = 1
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    spark = _spark()
    sf_dir = _sf_dir()
    qs = entrymod.queries()
    names = args or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown:", unknown)
        sys.exit(2)
    # warm-up: same as bench.py (workers + codegen caches)
    run_to_completion(entrymod.entry(spark))
    import gc

    out: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            run_to_completion(qs[name](spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # bench.py parity: release checkpoint blocks between runs
            gc.collect()
        out[name] = round(best, 3)
        print(f"{name:28s} {best:7.3f}s", flush=True)
    print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))


def cmd_jobs(args: list[str]) -> None:
    """Noise-free structural profile: execute each query once and
    report exact job / stage / task counts plus summed task time (the
    shared-host steal bursts disturb wall-clock, not these)."""
    import gc

    spark = _spark()
    sf_dir = _sf_dir()
    qs = entrymod.queries()
    names = args or list(qs)
    run_to_completion(entrymod.entry(spark))
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    out = {}
    for name in names:
        before_jobs = jsc.dagScheduler().nextJobId()
        before_stages = jsc.dagScheduler().nextStageId()
        t0 = time.perf_counter()
        run_to_completion(qs[name](spark, sf_dir))
        wall = time.perf_counter() - t0
        jobs = jsc.dagScheduler().nextJobId() - before_jobs
        stages = jsc.dagScheduler().nextStageId() - before_stages
        out[name] = {"jobs": jobs, "stages": stages, "wall": round(wall, 2)}
        print(
            f"{name:28s} jobs={jobs:4d} stages={stages:4d}"
            f" wall={wall:7.2f}s",
            flush=True,
        )
        gc.collect()
    print(json.dumps(out))


def cmd_explain(args: list[str]) -> None:
    outdir = args[0]
    names = args[1:]
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    sf_dir = _sf_dir()
    qs = entrymod.queries()
    for name in names or list(qs):
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count(
            "FlatMapGroupsInPandas"
        ) + plan.count("MapInArrow")
        print(f"{name:28s} exchanges~{n_ex:3d} python_nodes~{n_py:2d} -> {path}")


def cmd_prefix(args: list[str]) -> None:
    """Phase profile of the shared char-graph prefix."""
    from pyspark.sql import functions as F

    from renard_spark.operators import cooccur, ner, tokenize, unify
    from renard_spark.sources import ingest

    spark = _spark()
    sf_dir = _sf_dir()
    run_to_completion(entrymod.entry(spark))  # warm-up

    def t(label, df):
        spark.sparkContext.setJobDescription(f"prefix:{label}")
        t0 = time.perf_counter()
        run_to_completion(df)
        print(f"{label:28s} {time.perf_counter() - t0:7.3f}s", flush=True)

    docs_raw = entrymod._documents(spark, sf_dir)
    t("read_docs", docs_raw)
    spread = entrymod._spread(docs_raw)
    t("spread", spread)
    docs = ingest.normalize_documents(spread)
    t("normalize", docs)
    toks = tokenize.tokens(docs)
    t("tokens", toks)
    ments = ner.dictionary_ner(toks, entrymod.CAST_TOKENS)
    t("mentions", ments)
    unified = unify.naive_unify(ments)
    t("naive_unify", unified)
    mentions = unified.select("doc_id", "char_id", "start_idx", "end_idx")
    edges = cooccur.cooccurrence_edges(
        mentions, entrymod.COOCCUR_DIST, "tokens"
    )
    t("cooccur_edges", edges)
    ge = edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    t("global_edges", ge)
    from renard_spark.functions import graph as gmetrics

    pr = gmetrics.pagerank(ge, damping=0.85, iters=10)
    t("pagerank_full", pr.select("node", F.round("rank", 6).alias("rank")))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    rest = sys.argv[2:]
    if cmd == "time":
        cmd_time(rest)
    elif cmd == "jobs":
        cmd_jobs(rest)
    elif cmd == "explain":
        cmd_explain(rest)
    elif cmd == "prefix":
        cmd_prefix(rest)
    else:
        print(__doc__)
        sys.exit(2)
